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
    * through one task. Every frame below is bounded by DOMAIN, not by
    * corpus size, so the single partition holds O(constant) rows at
    * any scale — audited in the owning query's docstring. Anything
    * NOT in this list that plans a global window is a 100 TB
    * regression and fails the tripwire. */
  private val boundedGlobalWindowFrames = Set(
    "q102_cumulative_users",    // per-day frame (#distinct days)
    "q149_jaro_winkler_linkage", // boundary stitch: ≤ 4 rows per block
    "q165_histogram_percentiles", // fixed histogram bucket frame
    "q167_waterfill_budget",    // per-source frame (#distinct sources)
    "q168_km_conversion",       // Kaplan-Meier distinct obs times ≤ 8
    "q177_auc_stopword_en",     // distinct 2dp scores, value domain ≤ 56k
    "q180_ks_statistic",        // distinct 2dp values, domain-capped at 560
    "q188_window_funnel",       // funnel-step frame (#steps)
    "q189_sprt_stopping",       // per-variant sequential frame (30 rows)
    "q213_pareto_suppliers",    // per-distinct-volume collapse (+ partition-local pre-filter at cluster scale, see docstring)
    "q217_slo_burn",            // per-hour SLO frame (#hours)
    "q223_watermark_audit"      // per-trigger watermark frame (#triggers)
  )

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
}
