package graft

/** Plan-quality tripwire across the WHOLE query registry: no
  * registered query may plan a CartesianProduct (the do-not-ship
  * join — at 100 TB it is a cluster-killer; every intentional
  * small-side cross is a BroadcastNestedLoopJoin over a broadcast
  * stats frame instead). Runs on sf0.001 — plan shapes, not
  * timings. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        spark.catalog.clearCache()
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }
}
