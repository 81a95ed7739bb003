package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous surrogate-key assignment without a single-partition
  * window (the T-SQL `INT IDENTITY` replacement — reference
  * `sql_scripts/dim_customer.sql:23`, `fact_sales.sql:24`).
  *
  * `row_number().over(Window.orderBy(...))` collapses the whole
  * DataFrame onto ONE partition — fine for a 50-row demo, a
  * bottleneck at 100 TB. Instead, a fully LAZY two-level plan:
  *
  *  1. range-repartition on the sort key (global order preserved
  *     across partitions), sort within partitions;
  *  2. `row_number` partitioned by `spark_partition_id()` — each
  *     partition numbers its own rows in parallel;
  *  3. per-partition row counts → cumulative offsets (a tiny frame,
  *     one row per partition) broadcast-joined back on partition id.
  *
  * Both consumers of step 1 read the SAME range exchange (Catalyst
  * ReuseExchange — asserted in IdsSpec), so the input is scanned and
  * shuffled once, stays in whole-stage codegen, and — unlike the
  * previous `rdd.zipWithIndex` formulation — triggers no driver-side
  * job at plan-construction time. Deterministic for a unique sort
  * key; scales linearly with executors.
  */
object Ids {

  /** Adds `idCol` = offset+1, offset+2, … following the global order
    * of `sortCols` (which must be a unique ordering for determinism).
    */
  def addContiguousIds(df: DataFrame, sortCols: Seq[Column], idCol: String,
                       offset: Long = 0L): DataFrame =
    addContiguousIdsFrom(df, sortCols, idCol, lit(offset))

  /** As [[addContiguousIds]], but the offset is a lazy scalar COLUMN
    * (e.g. a broadcast max-key aggregate over the current dimension) —
    * no driver-side action needed to build the plan. */
  def addContiguousIdsFrom(df: DataFrame, sortCols: Seq[Column], idCol: String,
                           offsetCol: Column): DataFrame = {
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    val localNumbered = sorted.withColumn("_rn",
      row_number().over(
        Window.partitionBy(col("_pid")).orderBy(sortCols.map(_.asc): _*)))
    // One row per partition; cumulative count of all earlier
    // partitions = this partition's id offset. The frame is at most
    // numPartitions rows, so the single-partition window and the
    // broadcast are both trivially small.
    val offsets = sorted.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_poff",
        coalesce(
          sum(col("_cnt")).over(
            Window.orderBy(col("_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_pid"), col("_poff"))
    localNumbered
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn(idCol, offsetCol + col("_poff") + col("_rn"))
      .drop("_pid", "_rn", "_poff")
  }
}
