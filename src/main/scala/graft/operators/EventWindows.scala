package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Event-time windowing over the `events` table — the batch half of
  * the streaming surface (SURVEY.md §2.7/§7.5). The same expressions
  * run under Structured Streaming with `readStream` + watermark (see
  * `graft.streaming`); in batch they verify against the SQL oracle.
  *
  * Aggregation of the double `value` column goes through
  * decimal(18,2) so sums are order-independent (shuffle-partition
  * order must not change results).
  */
object EventWindows {

  private val Dec = DecimalType(18, 2)

  /** Tumbling window aggregate per event type. */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"), col("n_users"))

  /** Sliding window aggregate (width/slide) per event type. */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** As-of enrichment: for each right-side event, the latest
    * left-side event of the same user at-or-before it (nearest-prior
    * semantics, the "as-of join" of time-series engines). Expressed
    * as union-tag + running `last_value(ignoreNulls)` over one
    * user-partitioned ordering — a single shuffle, no range join, no
    * per-row probe; scales as a plain window. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               userCol: String = "user_id", tsCol: String = "ts",
               payloadCol: String = "event_id"): DataFrame = {
    val tagged = left.select(col(userCol), col(tsCol),
        col(payloadCol).as("_asof_payload"), lit(0).as("_side"),
        lit(null).cast("long").as("_rid"))
      .unionByName(right.select(col(userCol), col(tsCol),
        lit(null).cast(left.schema(payloadCol).dataType.catalogString).as("_asof_payload"),
        lit(1).as("_side"), col(payloadCol).cast("long").as("_rid")))
    // left rows sort before right rows at equal ts → "at or before"
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("_prior", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col(userCol), col("_rid").as("right_id"), col(tsCol),
        col("_prior").as("asof_left_id"))
  }

  /** Gap-based sessionization: a new session starts when a user is
    * idle longer than `gapMinutes`. Classic lag + running-sum
    * formulation — one shuffle on user_id, sessions assembled by two
    * stacked window functions over the same partitioning (no second
    * shuffle). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapMs = gapMinutes * 60L * 1000L
    val flagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("session_start_ms"),
        unix_millis(max(col("ts"))).as("session_end_ms"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"))
  }
}
