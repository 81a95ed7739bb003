package graft

/** Every registered query must be bit-deterministic run-to-run: the
  * driver's correctness gate hash-compares VALUES against the DuckDB
  * oracle, so any nondeterminism (unordered collect_list, float sum
  * reassociation, RNG without a fixed seed, partition-dependent
  * tie-breaks) fails the round even when the logic is right. This
  * guard evaluates the WHOLE registry twice on sf0.001 and diffs the
  * collected rows — the cheapest possible tripwire for the whole
  * class of bugs.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every registered query returns identical rows on a second run") {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // UNSORTED comparison on purpose: every query is contractually
      // fully ordered, so row-order instability (tie-breaks that
      // depend on partitioning) must trip this too
      def rows(): Seq[String] =
        fn(spark, sf).collect().map(_.toString).toSeq
      val a = rows()
      val b = rows()
      if (a != b) bad += name
      spark.catalog.clearCache()
    }
    assert(bad.isEmpty, s"nondeterministic queries: ${bad.mkString(", ")}")
  }
}
