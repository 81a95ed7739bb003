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

  /** Global (un-partitioned) windows serialize their whole frame
    * through one task. Every allowlisted frame is bounded by DOMAIN,
    * not by corpus size, so the single partition holds O(constant)
    * rows at any scale — audited in the owning query's docstring.
    * Anything NOT in the list that plans a global window is a 100 TB
    * regression and fails the tripwire. The list itself (query →
    * measured frame-row cap, plus the growth-gated subset) lives in
    * `FrameAudit` in main — ONE definition shared with the
    * measurement tool, so the two can't drift. */
  private val boundedGlobalWindowFrames: Map[String, Long] =
    FrameAudit.FrameCaps

  private val growthGated: Set[String] = FrameAudit.GrowthGated

  test("global windows only ever run over domain-bounded frames (allowlist)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def physical(df: org.apache.spark.sql.DataFrame): SparkPlan =
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hasGlobal = physical(fn(spark, sf)).collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
        }.nonEmpty
        spark.catalog.clearCache()
        if (hasGlobal && !boundedGlobalWindowFrames.contains(name)) Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"unaudited global windows in: ${offenders.mkString(", ")}")
  }

  /** "Domain-bounded" was a docstring until round 8; now it is data.
    * For every allowlisted query: pull each GLOBAL window's child out
    * of the optimized logical plan, COUNT its rows (the frame one
    * task must hold) at sf0.01 and sf0.1, and require the documented
    * cap at both scales — plus, for the two growth-argument entries,
    * ≤ 5× frame growth under the 10× corpus step. This is the gate
    * that caught q213's every-distinct-volume frame growing ~linearly
    * (10→99→853 over the fixture sfs, fixed with a partition-local
    * frontier pre-filter) and q223's fixed 4096-row blocks making
    * #blocks corpus-linear (fixed with an adaptive block size). */
  test("allowlisted global-window frames obey their documented caps (measured)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.graft.PlanBridge
    def maxGlobalFrameRows(name: String, dir: String): Long = {
      val df = SparkEntry.queries(name)(spark, dir)
      val frames = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w.child
      }
      assert(frames.nonEmpty,
        s"$name is allowlisted but plans no global window — drop it " +
          s"from the allowlist")
      val n = frames.map(c => PlanBridge.ofRows(spark, c).count()).max
      spark.catalog.clearCache()
      n
    }
    val failures = boundedGlobalWindowFrames.toSeq.sortBy(_._1).flatMap {
      case (name, cap) =>
        val small = maxGlobalFrameRows(name, "/root/testdata/sf0.01")
        val big = maxGlobalFrameRows(name, "/root/testdata/sf0.1")
        val capBad =
          if (small > cap || big > cap)
            Seq(s"$name: frame $small@sf0.01 / $big@sf0.1 exceeds cap $cap")
          else Nil
        val growthBad =
          if (growthGated(name) && big > 5L * math.max(small, 1L))
            Seq(s"$name: frame grew ${small}→$big under a 10× corpus " +
              s"(> 5× — the sub-linear claim is broken)")
          else Nil
        capBad ++ growthBad
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
