package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Deterministic, engine-portable sampling for training-data curation
  * (SURVEY.md §7.5 extension surface).
  *
  * `df.sample`/`sampleBy` draw from a seeded RNG whose stream depends
  * on partitioning — results change under repartition and cannot be
  * reproduced by another engine. Here membership is a pure function
  * of the row's id: bucket = md5-60bit(id) mod 100, keep iff bucket <
  * rate. Stable under shuffles, joins, and reruns; the same split is
  * computable in any engine with md5 (the DuckDB oracle does), and
  * disjoint rate ranges give non-overlapping train/eval splits. */
object Sampling {

  /** Percent bucket in [0, 100) derived from the id column. */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast(StringType)), 1, 15), 16, 10)
      .cast(LongType) % 100

  /** Keep ~`pct`% of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct in [0,100]")
    df.filter(bucket(col(idCol)) < pct)
  }

  /** Stratified variant: per-stratum keep rates (percent), default
    * rate for unlisted strata. One narrow filter — no shuffle, no
    * per-stratum pass. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((defaultPct +: rates.values.toSeq).forall(p => p >= 0 && p <= 100),
      "rates in [0,100]")
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (stratum, pct)) =>
      when(col(strataCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }

  /** Disjoint train/eval split: eval takes buckets [0, evalPct),
    * train the rest — membership never overlaps and never drifts as
    * the corpus grows (a row's assignment depends only on its id). */
  def trainEvalSplit(df: DataFrame, idCol: String,
                     evalPct: Int): (DataFrame, DataFrame) = {
    require(evalPct >= 0 && evalPct <= 100, "evalPct in [0,100]")
    val b = bucket(col(idCol))
    (df.filter(b >= evalPct), df.filter(b < evalPct))
  }
}
