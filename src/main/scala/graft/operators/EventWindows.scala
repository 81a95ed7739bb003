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
