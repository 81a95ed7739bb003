package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{LongType, StructField}

/** Contiguous surrogate-key assignment without a single-partition
  * window (the T-SQL `INT IDENTITY` replacement — reference
  * `sql_scripts/dim_customer.sql:23`, `fact_sales.sql:24`).
  *
  * `row_number().over(Window.orderBy(...))` collapses the whole
  * DataFrame onto ONE partition — fine for a 50-row demo, a
  * bottleneck at 100 TB. Instead: range-repartition on the sort key
  * (global order preserved across partitions), sort within
  * partitions, then `zipWithIndex` (per-partition offsets computed
  * from a lightweight count job). Deterministic for a unique sort
  * key, scales linearly with executors.
  */
object Ids {

  /** Adds `idCol` = offset+1, offset+2, … following the global order
    * of `sortCols` (which must be a unique ordering for determinism).
    */
  def addContiguousIds(df: DataFrame, sortCols: Seq[Column], idCol: String,
                       offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    // repartitionByRange needs >=1 partition; empty frames keep 1.
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val outSchema = schema.add(StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (offset + i + 1L))
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
