package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the migration-validation operator the
  * reference performs by eyeball (`sql_scripts/load_gold_data.sql:
  * 104-128` row counts + sample star query; `docs/technical_report.md`
  * §verification). Given two snapshots of a table keyed by
  * `keyCols`, emits one row per key with its change status and the
  * list of changed columns — the programmatic form of "did the
  * migrated table match?".
  *
  * Shape: one full-outer shuffle join on the key (both sides hash-
  * partitioned once); column comparison is a narrow projection of
  * null-safe equality tests. At 100 TB, co-locate the two snapshots
  * by bucketing on the key to drop both exchanges; statuses stream
  * out without any further wide stage.
  */
object Reconcile {

  /** Compare `after` against `before`.
    *
    * @return one row per key: key columns, `status` in
    *         {added, removed, changed, unchanged}, `changed_cols` a
    *         comma-joined list of compared columns whose value
    *         differs (empty unless status = changed), and the
    *         before/after value of every compared column.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val b = before.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_in_b", lit(true))
    val a = after.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_in_a", lit(true))
    val bRen = compareCols.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"${c}_before"))
    val aRen = compareCols.foldLeft(a)((df, c) => df.withColumnRenamed(c, s"${c}_after"))
    val joined = bRen.join(aRen, keyCols, "full_outer")

    val diffs: Seq[Column] = compareCols.map { c =>
      when(!(col(s"${c}_before") <=> col(s"${c}_after")), lit(c))
    }
    val changedCols = concat_ws(",", diffs: _*)
    val status = when(col("_in_b").isNull, lit("added"))
      .when(col("_in_a").isNull, lit("removed"))
      .when(changedCols =!= "", lit("changed"))
      .otherwise(lit("unchanged"))

    joined
      .withColumn("status", status)
      .withColumn("changed_cols",
        when(col("status") === "changed", changedCols).otherwise(lit("")))
      .drop("_in_b", "_in_a")
      .select((keyCols.map(col) :+ col("status") :+ col("changed_cols")) ++
        compareCols.flatMap(c => Seq(col(s"${c}_before"), col(s"${c}_after"))): _*)
  }
}
