package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.graft.PlanBridge

/** One-off measurement aid: for each query name passed (default: the
  * PlanAuditSpec global-window allowlist), find every GLOBAL
  * (un-partitioned) logical Window in the optimized plan and count
  * the rows of its child — the frame a single task must hold — at
  * each sf dir in SPARK_GRAFT_SF_DIRS (comma-separated). Prints one
  * line per (query, dir): `FRAME <query> <dir> <counts...>`.
  */
object FrameAudit {
  val Allowlist: Seq[String] = Seq(
    "q102_cumulative_users", "q149_jaro_winkler_linkage",
    "q165_histogram_percentiles", "q167_waterfill_budget",
    "q168_km_conversion", "q177_auc_stopword_en", "q180_ks_statistic",
    "q188_window_funnel", "q189_sprt_stopping", "q213_pareto_suppliers",
    "q217_slo_burn", "q223_watermark_audit")

  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS",
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").toSeq
    val names = if (args.nonEmpty) args.toSeq else Allowlist
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; dir <- dirs) {
      val df = SparkEntry.queries(name)(spark, dir)
      val frames = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w.child
      }
      val counts = frames.map(c => PlanBridge.ofRows(spark, c).count())
      spark.catalog.clearCache()
      println(s"FRAME $name $dir ${counts.mkString(",")}")
    }
    spark.stop()
  }
}
