package graft

import org.apache.spark.sql.functions._

/** Scale-shape assertions for the analytics tier (q80–q89): the
  * correctness of these queries is oracle-checked by the driver; here
  * we pin the PLAN properties that make them survive 100 TB — tiny
  * sides broadcast, exactly one data shuffle where one suffices, and
  * order-independence where the fold claims it. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def hashExchanges(plan: String): Int =
    plan.linesIterator.count(_.contains("Exchange hashpartitioning"))

  test("q84 histogram: global bounds broadcast; one aggregate shuffle") {
    val q = SparkEntry.queries("q84_value_histogram")(spark, sf)
    val plan = finalPlan(q)
    // the 1-row min/max bounds join the scan as a broadcast nested loop
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    // binning is map-side: the only hash exchange feeds the 20-row agg
    assert(hashExchanges(plan) == 1, s"expected 1 shuffle:\n${plan.take(1200)}")
  }

  test("q85 reservoir: one hash shuffle for the per-group rank window") {
    val q = SparkEntry.queries("q85_group_reservoir")(spark, sf)
    val plan = finalPlan(q)
    assert(hashExchanges(plan) == 1, s"expected 1 shuffle:\n${plan.take(1200)}")
    // rank filter is applied before the final presentation sort
    assert(q.groupBy($"source").count().agg(max($"count")).as[Long].head() <= 5)
  }

  test("q89 checksum is partitioning- and order-independent") {
    val base = SparkEntry.queries("q89_table_checksum")(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (t, _, cs) => t -> cs }.toMap
    // recompute the orders checksum from a deliberately scrambled layout
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartition(13, $"o_orderstatus")
      .sortWithinPartitions($"o_totalprice")
    val h = o.select(
      conv(substring(md5(concat_ws("|",
        $"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice".cast("decimal(18,2)"),
        unix_millis($"o_orderdate".cast("timestamp")),
        $"o_orderpriority")), 1, 15), 16, 10).cast("long").as("h"))
      .agg(expr("bit_xor(h)")).as[Long].head()
    assert(base("orders") == h,
      "xor fold must not depend on partitioning or row order")
    // map-side partial fold: exactly one exchange feeds the 2-row agg
    val plan = finalPlan(SparkEntry.queries("q89_table_checksum")(spark, sf))
    assert(hashExchanges(plan) == 1, s"expected 1 shuffle:\n${plan.take(1200)}")
  }

  test("q81 gap fill emits a dense day × type grid") {
    val q = SparkEntry.queries("q81_daily_gap_fill")(spark, sf).cache()
    try {
      val days = q.select($"day").distinct().count()
      val types = q.select($"event_type").distinct().count()
      assert(q.count() == days * types, "every (day, type) cell present")
      // zero-filled cells exist only if the raw data actually has gaps;
      // either way no cell is null
      assert(q.filter($"n_events".isNull).count() == 0)
    } finally q.unpersist()
  }

  test("q86 winsorize bounds clamp the clipped mean between p05 and p95") {
    val rows = SparkEntry.queries("q86_winsorize")(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (seg, n, p05, p95, mean) =>
      assert(p05 <= p95, s"$seg bounds ordered")
      assert(mean >= p05 && mean <= p95, s"$seg mean within clip bounds")
      assert(n > 0)
    }
  }
}
