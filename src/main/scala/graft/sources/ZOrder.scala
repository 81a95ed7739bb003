package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout for multi-dimensional scan
  * pruning — the lake-native analog of the reference's serving-side
  * multi-column indexes (`sql_scripts/fact_sales.sql:52-60`, covering
  * indexes on both fact FKs).
  *
  * Sorting a table by ONE column clusters that column's min/max file
  * stats and leaves every other filter column scattered across all
  * files. Interleaving the bits of several columns' bucket ranks
  * produces a single sort key under which every participating column
  * is locally clustered: a selective filter on ANY of them hits a
  * small fraction of files (parquet row-group stats + file pruning do
  * the skipping). At 100 TB this is the difference between scanning a
  * few files and scanning the lake for the second-dimension filters
  * the time-partition layout can't help with.
  *
  * Bucketing is equi-width from a one-pass min/max probe (one cheap
  * driver action). For heavily skewed columns substitute quantile
  * boundaries (approxQuantile) — the interleave is unchanged.
  */
object ZOrder {

  /** Morton interleave of pre-bucketed non-negative ranks: output bit
    * `(i * n + j)` = bit `i` of `buckets(j)`. Pure Column arithmetic —
    * codegen-friendly, no UDF. */
  def interleave(buckets: Seq[Column], bitsPerCol: Int): Column = {
    require(buckets.nonEmpty && bitsPerCol > 0 &&
      buckets.length * bitsPerCol <= 63, "z-value must fit a signed long")
    var z: Column = lit(0L)
    for (i <- 0 until bitsPerCol; (b, j) <- buckets.zipWithIndex) {
      z = z.bitwiseOR(shiftleft(
        shiftright(b, i).bitwiseAND(lit(1L)), i * buckets.length + j))
    }
    z
  }

  /** Equi-width bucket rank of `c` in [0, 2^bitsPerCol) given the
    * column's observed [lo, hi]; null values land deterministically
    * in bucket 0. */
  def bucketOf(c: Column, lo: Double, hi: Double, bitsPerCol: Int): Column = {
    val nBuckets = 1L << bitsPerCol
    val width = math.max(hi - lo, java.lang.Double.MIN_VALUE)
    coalesce(
      least(lit(nBuckets - 1),
        greatest(lit(0L),
          floor((c.cast("double") - lit(lo)) / lit(width) * nBuckets).cast("long"))),
      lit(0L))
  }

  /** The z-value column for `cols` of `df` (min/max probed with one
    * aggregate action). */
  def zValue(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 10): Column = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = cols.zipWithIndex.map { case (c, j) =>
      // an empty frame or an all-null column has no [lo, hi]; fail
      // with the actual problem instead of an opaque NPE
      require(!row.isNullAt(2 * j) && !row.isNullAt(2 * j + 1),
        s"cannot z-order on '$c': no non-null values to bucket " +
          "(empty input or all-null column)")
      bucketOf(col(c), row.getDouble(2 * j), row.getDouble(2 * j + 1), bitsPerCol)
    }
    interleave(buckets, bitsPerCol)
  }

  /** Rewrite `df` into `nFiles` files clustered along the z-curve of
    * `cols`: range partition + local sort on the z-value, so each
    * file covers a compact hyper-rectangle and carries tight parquet
    * min/max stats for EVERY participating column. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, bitsPerCol: Int = 10): Unit =
    df.withColumn("_z", zValue(df, cols, bitsPerCol))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
}
