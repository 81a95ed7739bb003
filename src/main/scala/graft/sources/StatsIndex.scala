package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping over a parquet directory — the
  * lakehouse "zone map" pattern (Delta/Iceberg file statistics,
  * re-expressed with plain Spark): one scan builds a tiny per-file
  * stats relation; point/range reads then open ONLY the files whose
  * [min, max] envelope intersects the predicate.
  *
  * Parquet row-group stats already prune WITHIN a file once it is
  * opened; this prunes file listings BEFORE any footer is touched,
  * which is what matters at 100 TB where a table is 10⁵–10⁶ objects
  * and open+footer costs dominate selective reads. Laid out with
  * [[ZOrder.writeZOrdered]] (or a range-partitioned sort) the
  * envelopes are narrow and disjoint, so selectivity translates
  * directly into files skipped.
  *
  * The index is itself a DataFrame — persist it next to the table
  * (e.g. `<table>._stats`) and rebuild per [[LakeIO.compactGold]] /
  * append cycle; it is one row per file, so the rebuild cost is the
  * one scan that wrote the data anyway (Observation-style inline
  * collection rides the write pass — cf. [[graft.operators.Quality
  * .observed]]). */
object StatsIndex {

  /** One row per data file: `file`, `n_rows`, and `<c>_min`/`<c>_max`
    * for every requested column. */
  def build(spark: SparkSession, path: String,
            cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] envelope intersects [lo, hi] on `c` —
    * `lo`/`hi` are inclusive bounds as literal-able values (numeric,
    * string, date, timestamp). NULL-only files (null min/max) are
    * kept: stats cannot prove them empty of matches under SQL
    * three-valued logic unless the caller's predicate rejects nulls.
    */
  def candidateFiles(index: DataFrame, c: String,
                     lo: Any, hi: Any): Seq[String] = {
    val minC = col(s"${c}_min")
    val maxC = col(s"${c}_max")
    val overlaps = !(maxC < lit(lo) || minC > lit(hi))
    index.filter(overlaps || minC.isNull)
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Range read via the stats index: open only intersecting files,
    * then apply the exact predicate (stats prune files; the residual
    * filter prunes rows, and still pushes down into the surviving
    * scans). Equals the full-table filter by construction. */
  def prunedRead(spark: SparkSession, path: String, index: DataFrame,
                 c: String, lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(index, c, lo, hi)
    val pred: Column = col(c) >= lit(lo) && col(c) <= lit(hi)
    if (files.isEmpty) // keep the table schema; prove-empty read
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(pred)
  }
}
