package graft.operators

import org.apache.spark.sql.DataFrame
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
}
