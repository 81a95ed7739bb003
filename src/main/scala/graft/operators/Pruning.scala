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
    * once inside the join.
    *
    * Filter sizing: `BloomFilterAggregate`'s capacity arguments must
    * be literals, so they cannot ride in as a subquery — by default
    * (`expectedKeys = None`) the operator pays ONE extra counting
    * pass over `dim` (the small side by contract; the q223/q224
    * bounded-scalar discipline) and sizes the filter for the measured
    * key count. A static `Some(n)` skips that pass for callers that
    * know their key bound. This sizing is load-bearing at scale: with
    * the old fixed 1M default, q226's eval 5-gram set (~5.8M keys at
    * gen-sf8) saturated the filter — measured false-positive rate
    * drove the "pruned" join mass superlinear on BOTH scale corpora
    * (×4.5 records per doubling at sf4→sf8) while the filter silently
    * passed almost everything. `dim.count()` upper-bounds the
    * distinct key count (duplicate keys only oversize the filter —
    * never under-size it), so correctness is unaffected either way;
    * only the pruning power is at stake. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedKeys: Option[Long] = None,
                      fpp: Double = 0.01): DataFrame = {
    val nKeys = math.max(expectedKeys.getOrElse(dim.count()), 1000L)
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(nKeys, fpp)
    val bfAgg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(dimKey))),
      ColumnBridge.expression(lit(nKeys)),
      ColumnBridge.expression(lit(numBits))).toAggregateExpression()
    val bf = dim.agg(ColumnBridge.column(bfAgg).as("bf")).scalar()
    fact.filter(ColumnBridge.column(BloomFilterMightContain(
        ColumnBridge.expression(bf),
        ColumnBridge.expression(xxhash64(col(factKey))))))
      .join(dim, col(factKey) === col(dimKey))
  }
}
