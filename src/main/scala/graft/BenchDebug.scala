package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic twin of Bench: runs each query twice with wall-clock
  * markers to separate per-query cost from JVM-wide stalls. */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // registry-sized codegen cache — measurement parity with Bench
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8000"))
      // sort writer, never bypass-merge — measurement parity with
      // Bench (see the rationale there); no-op at real tiers
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job wall times, to see where a query's seconds actually go
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("spark.job.description", "")).getOrElse("") +
            " stages=" + j.stageInfos.map(si => si.name.takeWhile(_ != ' ') +
              ":" + si.numTasks).mkString(",")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(j.jobId, (0L, ""))
        jobLog.put(j.jobId, (System.nanoTime() - t0, desc))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
          val si = sc.stageInfo
          val rt = Option(si.taskMetrics).map(_.executorRunTime).getOrElse(-1L)
          println(f"[bd]     stage ${si.stageId}%3d tasks=${si.numTasks}%-3d " +
            f"runTime=${rt}ms ${si.name.take(120)}")
        }
    })
    val rt = Runtime.getRuntime
    val only = args.toSet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      (1 to 2).foreach { i =>
        val heap0 = (rt.totalMemory - rt.freeMemory) / 1e6
        val t0 = System.nanoTime()
        // Bench.consume (noop sink), matching Bench's instrument —
        // count() would let Catalyst prune the plan being diagnosed
        val n = try {
          val df = fn(spark, sfDir)
          Bench.consume(df)
          // SPARK_GRAFT_PLANMETRICS: after the run, print the FINAL
          // AQE plan with each operator's accumulated SQL metrics —
          // the UI's SQL tab in text form, for attributing stage cost
          // to operators when every stage is an anonymous AQE future
          if (i == 2 && sys.env.contains("SPARK_GRAFT_PLANMETRICS")) {
            def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
              val ms = p.metrics.collect {
                case (k, m) if m.value > 0 &&
                    (k.contains("time") || k.contains("Time") ||
                     k == "numOutputRows") => s"$k=${m.value}"
              }.mkString(" ")
              println(f"[bd]   plan ${"  " * d}${p.nodeName} $ms")
              p.children.foreach(walk(_, d + 1))
              p match {
                case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                  walk(a.executedPlan, d + 1)
                case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                  walk(q.plan, d + 1)
                case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
                  walk(r.child, d + 1)
                case _ => ()
              }
            }
            walk(df.queryExecution.executedPlan, 0)
          }
          0L
        } catch { case e: Throwable => println(s"ERR $name: $e"); -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        val heap1 = (rt.totalMemory - rt.freeMemory) / 1e6
        println(f"[bd] $name%-28s run$i $dt%7.2fs rows=$n%-8d heap ${heap0}%.0f->${heap1}%.0fMB")
        if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
          import scala.jdk.CollectionConverters._
          val jobs = jobLog.asScala.toSeq.sortBy(_._1)
          jobs.foreach { case (id, (ns, d)) =>
            println(f"[bd]   job $id%3d ${ns / 1e9}%6.3fs ${d.take(500)}")
          }
          println(f"[bd]   sum-of-jobs ${jobs.map(_._2._1).sum / 1e9}%.2fs")
          jobLog.clear()
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
