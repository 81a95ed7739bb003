package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan-side join pruning for the 100 TB fact table.
  *
  * When a join's build side is too big to broadcast as ROWS but its
  * KEY SET fits a Bloom filter (100 M keys ≈ 120 MB at 1% fpp vs tens
  * of GB of rows), shipping the filter to the probe-side scan drops
  * non-matching fact rows BEFORE the shuffle — the same idea as
  * Spark's AQE runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) and Trino's
  * dynamic filtering, expressed here as an explicit operator so the
  * pruning also applies to broadcast-ineligible joins the optimizer
  * won't rewrite.
  *
  * Semantics are EXACT: the Bloom pass only discards guaranteed
  * non-matches (no false negatives), and the real join afterwards
  * removes the ≤ fpp false positives — so the result equals the plain
  * join, which is exactly what the q77 oracle checks.
  */
object Pruning {

  /** `fact ⋈ dim` with a Bloom-filter pre-filter on the fact side.
    * `dim` is scanned once to build the filter (a driver-side
    * aggregate of ~bits/8 bytes, then a task-broadcast literal) and
    * once inside the join. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedKeys: Long = 1000000L,
                      fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bfBc = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bfBc.value.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
