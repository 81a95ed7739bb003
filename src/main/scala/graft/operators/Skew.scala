package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for 100 TB fact tables (SURVEY.md §4.1 /
  * build-prompt scale contract).
  *
  * AQE's skew-join split handles sort-merge skew automatically, but a
  * hot key that dwarfs a single reducer still benefits from explicit
  * salting: the fact side gets a random-but-deterministic salt in
  * [0, `saltBuckets`), the dimension side is replicated `saltBuckets`
  * times, and the join key becomes (key, salt) — the hot key's rows
  * spread across `saltBuckets` reducers.
  */
object Skew {

  /** Deterministic per-row salt derived from stable columns (no
    * rand() — reruns and retries must shuffle identically). */
  def salt(saltBuckets: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(saltBuckets)).cast("int")

  /** Salted inner/left equi-join: `facts ⋈ dim` on `key`, with the
    * dimension replicated over the salt domain. Use when one fact key
    * is orders of magnitude hotter than the rest and the dim side is
    * too big to broadcast outright. */
  /** Join types where replicating the dim side cannot multiply output:
    * the fact side carries exactly one salt per row, so each fact row
    * meets each dim key at most once; but an unmatched DIM row would
    * survive once per bucket under right/full joins. */
  private val SafeJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")

  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner",
                 factSaltCols: Seq[String] = Nil): DataFrame = {
    require(SafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin replicates the dim side $saltBuckets times; " +
      s"'$joinType' would emit unmatched dim rows once per salt bucket " +
      "(supported: inner, left, left_semi, left_anti)")
    val stable = if (factSaltCols.nonEmpty) factSaltCols.map(col)
                 else facts.columns.map(col).toSeq
    val saltedFacts = facts.withColumn("_salt", salt(saltBuckets, stable: _*))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<int>")))
    saltedFacts.join(saltedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-stage salted aggregation for skewed GROUP BY keys: stage 1
    * aggregates on (key, salt) — the hot key's rows split across
    * `saltBuckets` reducers — stage 2 combines the per-salt partials
    * on the key alone (tiny input: ≤ saltBuckets rows per key).
    *
    * `partials` maps each measure column to its per-salt aggregate;
    * `combine` folds the partials (must be the associative second
    * stage: sum→sum, count→sum, min→min, max→max). Spark's own
    * map-side partial aggregation covers MOST skew already — reach
    * for this only when a single key floods even the combined
    * partials (e.g. high-cardinality agg state like collect_set). */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
                partials: Seq[Column], combine: Seq[Column],
                factSaltCols: Seq[String] = Nil): DataFrame = {
    val stable = if (factSaltCols.nonEmpty) factSaltCols.map(col)
                 else df.columns.map(col).toSeq
    df.withColumn("_salt", salt(saltBuckets, stable: _*))
      .groupBy(col(key), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(combine.head, combine.tail: _*)
  }
}
