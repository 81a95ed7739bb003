package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic keyed upsert (MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED
  * INSERT) as a pure full-state function — the general form of the
  * reference's keyed-update sink (S8, `DF_SCD2_Customer.json:182-198`)
  * without SCD2 history. On immutable lake storage the "update" is a
  * whole-state rewrite: callers publish the result atomically with
  * [[graft.sources.LakeIO.replaceGold]].
  *
  * Shape: one left-anti shuffle join on the key (the updates side is
  * typically a small daily batch — AQE broadcasts it), then a narrow
  * union. No window, no driver action. At 100 TB partition the state
  * by a stable key range so the anti join co-locates.
  */
object Upsert {

  /** Next table state: every key in `updates` takes its new row;
    * every other current row passes through unchanged.
    *
    * `updates` must have at most one row per key (caller contract —
    * a duplicate key would fork the state; dedupe upstream with
    * [[Dedup.exactSurvivors]] or a keep-latest window). */
  def merge(current: DataFrame, updates: DataFrame,
            keyCols: Seq[String]): DataFrame = {
    val cols = current.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"updates schema ${updates.columns.toSeq} must match current $cols")
    val untouched = current.join(updates.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    updates.unionByName(untouched)
  }

  /** CDC log compaction: keep each key's LATEST row under `ordering`
    * (descending-first wins). The standard step that turns an
    * append-only change log into current state — and the safe form of
    * "dropDuplicates by key", which keeps an ARBITRARY row and changes
    * results under repartitioning. `ordering` must be a total order
    * per key (add a unique tiebreaker column) or the winner is
    * nondeterministic. One shuffle on the key; the per-key sort is
    * partition-local. */
  def latestByKey(log: DataFrame, keyCols: Seq[String],
                  ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering.map(_.desc): _*)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** CDC apply WITH delete tombstones: compact the change feed to
    * each key's latest op, then drop keys whose final op is a delete
    * — the full Debezium-style upsert/delete materialization
    * ([[latestByKey]] alone resurrects deleted keys). Adds `_n_ops`,
    * the key's feed depth (compaction-ratio / hot-key diagnostic).
    * Same single key-shuffle as latestByKey: the count rides the same
    * window partition, and the tombstone drop is a post-window
    * filter, not another pass. */
  def applyCdc(feed: DataFrame, keyCols: Seq[String],
               ordering: Seq[Column], opCol: String = "op",
               deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering.map(_.desc): _*)
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    feed.withColumn("_rn", row_number().over(w))
      .withColumn("_n_ops", count(lit(1)).over(wAll))
      .filter(col("_rn") === 1 && col(opCol) =!= deleteOp)
      .drop("_rn")
  }
}
