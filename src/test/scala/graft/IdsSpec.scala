package graft

import graft.operators.Ids
import org.apache.spark.sql.functions._

/** The lazy contiguous-id plan: correct global numbering, and the
  * range exchange feeding both the numbering and the offset branches
  * is materialized once (ReuseExchange). */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("ids are contiguous and follow global key order") {
    for (n <- Seq(0, 1, 5, 1000)) {
      val df = spark.range(n).select(
        // reversed, shuffled insertion order; key = idx
        (lit(n.toLong) - $"id").as("key"), ($"id" % 7).as("v"))
        .repartition(5)
      val out = Ids.addContiguousIds(df, Seq(col("key")), "sk", offset = 100L)
        .select("sk", "key").as[(Long, Long)].collect().sortBy(_._2)
      assert(out.length == n)
      // key k (1-based dense) gets id 100 + k
      assert(out.forall { case (sk, key) => sk == 100L + key })
    }
  }

  test("plan has no driver-side jobs and reuses the range exchange") {
    val df = spark.range(10000).select($"id".as("key"))
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val out = Ids.addContiguousIds(df, Seq(col("key")), "sk")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "plan construction must trigger no Spark jobs")
    assert(out.select(max($"sk")).as[Long].head() == 10000L)
    // CORRECTNESS-CRITICAL: the numbering branch and the offsets
    // branch must consume the SAME materialized range exchange — if
    // each materialized its own, AQE could partition them differently
    // and the pid-keyed offset join would mis-assign ids. Reuse only
    // shows in the FINAL adaptive plan, so execute `out` itself first.
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ReusedExchange"),
      s"offsets branch must reuse the range exchange:\n${plan.take(1200)}")
  }

  test("distinct ids under skewed multi-column ordering") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2), ("a", 2), ("b", 1))
      .toDF("g", "k")
    val out = Ids.addContiguousIds(df, Seq(col("g"), col("k")), "sk")
      .orderBy("sk").select("g", "k").as[(String, Int)].collect().toSeq
    assert(out == Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2)))
  }
}
