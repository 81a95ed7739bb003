package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

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
  * The filter never leaves the plan: the build side is a scalar
  * subquery over Catalyst's own `BloomFilterAggregate`, and the probe
  * is the codegen'd `BloomFilterMightContain` predicate on the
  * `xxhash64` of the key — the exact expression pair Spark's
  * `InjectRuntimeFilter` rule plants, here placed deliberately. No
  * driver-side `df.stat.bloomFilter` action, no interpreted UDF in
  * the scan path.
  *
  * Semantics are EXACT: the Bloom pass only discards guaranteed
  * non-matches (no false negatives), and the real join afterwards
  * removes the ≤ fpp false positives — so the result equals the plain
  * join, which is exactly what the q77 oracle checks. (A NULL fact
  * key hashes to the xxhash64 seed and may pass the filter; the equi
  * join then drops it, same as before.)
  */
object Pruning {

  /** `fact ⋈ dim` with a Bloom-filter pre-filter on the fact side.
    * `dim` is scanned once to build the filter (an in-plan aggregate
    * producing one binary scalar, broadcast as a subquery result) and
    * once inside the join. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedKeys: Long = 1000000L,
                      fpp: Double = 0.01): DataFrame = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedKeys, fpp)
    val bfAgg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(dimKey))),
      ColumnBridge.expression(lit(expectedKeys)),
      ColumnBridge.expression(lit(numBits))).toAggregateExpression()
    val bf = dim.agg(ColumnBridge.column(bfAgg).as("bf")).scalar()
    fact.filter(ColumnBridge.column(BloomFilterMightContain(
        ColumnBridge.expression(bf),
        ColumnBridge.expression(xxhash64(col(factKey))))))
      .join(dim, col(factKey) === col(dimKey))
  }
}
