package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Contiguous surrogate-key assignment without a single-partition
  * window (the T-SQL `INT IDENTITY` replacement — reference
  * `sql_scripts/dim_customer.sql:23`, `fact_sales.sql:24`).
  *
  * `row_number().over(Window.orderBy(...))` collapses the whole
  * DataFrame onto ONE partition — fine for a 50-row demo, a
  * bottleneck at 100 TB. Instead: range-repartition on the sort
  * expressions (asc/desc honored; global order preserved across
  * partitions), sort within partitions, materialize ONCE with
  * per-partition positions (`monotonically_increasing_id`), and add
  * the per-partition offsets back with a bounded prefix sum + a
  * broadcast join — all Catalyst, no external-Row round trip.
  * Deterministic for a unique sort ordering; scales linearly with
  * executors.
  *
  * WHY THE SINGLE MATERIALIZATION IS LOAD-BEARING (r03/r12 lesson,
  * preserved across the round-14 rewrite): deriving per-partition
  * offsets from a SECOND read of the range exchange is only sound
  * while Catalyst reuses one materialized exchange for both branches.
  * When column pruning (or any rewrite) makes the two subtrees
  * unequal, each branch materializes its OWN exchange — and
  * `RangePartitioner` seeds its boundary sampling with the RDD id, so
  * the two materializations can place rows in DIFFERENT partitions:
  * the pid-keyed offset join then silently mis-assigns ids (caught by
  * the q05 oracle gate). The old implementation pinned one RDD with
  * `zipWithIndex`; the current one pins one via
  * [[Checkpoints.truncate]] — same guarantee, but the data path stays
  * inside codegen instead of deserializing every row to an external
  * Row and re-encoding it through an interpreted schema encoder.
  */
object Ids {

  /** Column-name convention for the internal offsets frame
    * ([[addContiguousIds]]): `__<idCol>_pid` / `__<idCol>_off` /
    * `__<idCol>_mid`. The offsets frame is STRUCTURALLY bounded at
    * ≤ `spark.sql.shuffle.partitions` rows — it aggregates the
    * partition ids of the pinned range exchange — so its global
    * prefix-sum window and its broadcast join back are O(cores), not
    * O(corpus), at any scale. The plan audits (PlanAuditSpec,
    * ScaleSpec, Scd2Spec) recognize the construct by this marker and
    * exempt it from the corpus-sized-global-window / forced-broadcast
    * tripwires; everything else stays gated. */
  def isOffsetsInternal(name: String): Boolean =
    name.startsWith("__") &&
      (name.endsWith("_pid") || name.endsWith("_off") || name.endsWith("_mid"))

  /** Adds `idCol` = offset+1, offset+2, … following the global order
    * of `sortCols` (which must be a unique ordering for determinism;
    * `.desc` expressions are honored).
    */
  def addContiguousIds(df: DataFrame, sortCols: Seq[Column], idCol: String,
                       offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    // pin the partition count (no AQE coalesce): the exchange is tiny
    // in BYTES at test scale, so AQE folds it to one partition — and
    // every CPU-heavy comparator downstream of the ranks (candidate
    // verification by edit distance etc.) then runs single-task. Byte
    // size is the wrong signal for compute-bound stages; the
    // configured shuffle parallelism is the contract.
    //
    // Rank assembly is pure Catalyst (round-14 optimization): the old
    // form dropped to `sorted.rdd.zipWithIndex` + `createDataFrame`,
    // which deserializes EVERY row to an external Row and re-encodes
    // it through an interpreted schema encoder — per-row overhead on
    // the whole frame, twice (count pass + data pass), outside
    // codegen. Instead: materialize the range-sorted frame ONCE with
    // `monotonically_increasing_id` (= partitionId·2³³ + row index —
    // within-partition positions in the pinned sorted order), then
    // rank = (rows in partitions before mine) + (my index) + 1. The
    // per-partition row counts are a tiny (≤ shuffle partitions)
    // frame; its prefix-sum window and the broadcast join back are
    // negligible at any scale. Correctness needs both the count
    // branch and the data branch to read the SAME materialization
    // (two independent range exchanges may draw different sampled
    // boundaries — the r03/r12 hazard on the old two-branch plan);
    // [[Checkpoints.truncate]] pins one, exactly as zipWithIndex
    // pinned one RDD, and costs the same single construction job the
    // zipWithIndex count pass already paid. Global rank is
    // boundary-placement-independent for a unique total order, so the
    // sampled range boundaries affect layout only, never the ids.
    val mid = s"__${idCol}_mid"
    val sorted = Checkpoints.truncate(df
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
        sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn(mid, monotonically_increasing_id()))
    val pid = s"__${idCol}_pid"
    val off = s"__${idCol}_off"
    val offsets = sorted
      .groupBy(shiftright(col(mid), 33).as(pid))
      .agg(count(lit(1)).as(off))
      // prefix sum over ≤ numShufflePartitions rows — a bounded frame,
      // so the single-partition window is safe at any scale
      .withColumn(off, coalesce(sum(col(off)).over(
        Window.orderBy(col(pid)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    sorted
      .join(broadcast(offsets), shiftright(col(mid), 33) === col(pid))
      .withColumn(idCol,
        (lit(offset) + col(off) + col(mid).bitwiseAND(lit((1L << 33) - 1))
          + lit(1L)).cast(LongType))
      .drop(mid, pid, off)
  }

  /** Exact SQL `NTILE(k)` bucket computed from a 1-based contiguous
    * global rank instead of a single-partition window.
    *
    * NTILE(k) over n rows deals the first `n % k` buckets
    * `ceil(n / k)` rows and the remaining buckets `floor(n / k)` —
    * so for rank r the bucket is pure arithmetic in (r, n, k). Paired
    * with [[addContiguousIds]] (range-partitioned rank), this gives
    * bit-identical NTILE semantics with no corpus-sized frame ever
    * passing through one task: the `ntile(k).over(Window.orderBy(…))`
    * formulation collapses the whole frame onto a single partition,
    * which serializes at 100 TB; rank + arithmetic scales with
    * executors. `rank` and `n` must be BIGINT-safe (< 2⁵³ for the
    * intermediate double divisions — row counts always are).
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val m = pmod(n, lit(k.toLong))                 // buckets with the extra row
    val q = ((n - m) / k).cast(LongType)           // base bucket size floor(n/k)
    val t = m * (q + lit(1L))                      // rows in the fat buckets
    when(rank <= t, floor((rank - lit(1L)) / (q + lit(1L))) + lit(1L))
      // greatest(q, 1): when q = 0 every row satisfies rank <= t, so
      // the branch is never taken — the guard only keeps the division
      // total under ANSI evaluation
      .otherwise(m + floor((rank - t - lit(1L)) / greatest(q, lit(1L))) + lit(1L))
      .cast(LongType)
  }
}
