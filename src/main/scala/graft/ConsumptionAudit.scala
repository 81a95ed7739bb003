package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** One-shot measurement audit: for every SparkEntry query, compare the
  * shuffle mass executed under `count()` consumption vs noop-sink
  * consumption on SPARK_GRAFT_SF_DIR (default sf0.001).
  *
  * Why it exists: under `count()` Catalyst eliminates any subtree it
  * can prove row-count-preserving — outer joins to unique-key
  * aggregates (q226's entire bloom-join pipeline disappeared) and all
  * projection-only work (q45's scrub expressions). Any benchmark that
  * consumes with count() therefore measures a DIFFERENT plan for such
  * queries. This main makes the blast radius measurable: a query whose
  * noop shuffle mass far exceeds its count() shuffle mass had part of
  * its plan invisible to every count()-based number ever recorded.
  *
  * Output: one JSON line per query on stdout and appended to
  * `target/consumption_audit.jsonl`; a final summary line lists the
  * flagged queries (noop records > 2x count records + 1000 — the slack
  * absorbs the benign diffs: a final presentation sort dropped under
  * count, AQE coalescing jitter).
  */
object ConsumptionAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufRecords = new AtomicLong
    val stages = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) shufRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        stages.incrementAndGet()
      }
    })
    def settle(): Unit = {
      var prev = -1L; var cur = stages.get()
      while (prev != cur) { Thread.sleep(150); prev = cur; cur = stages.get() }
    }
    def measure(act: => Unit): Long = {
      spark.catalog.clearCache(); settle()
      val r0 = shufRecords.get(); act; settle(); shufRecords.get() - r0
    }

    val out = java.nio.file.Paths.get("target", "consumption_audit.jsonl")
    java.nio.file.Files.createDirectories(out.getParent)
    val flagged = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val cnt = measure(fn(spark, sfDir).count())
        val noop = measure(Bench.consume(fn(spark, sfDir)))
        val flag = noop > 2 * cnt + 1000
        if (flag) flagged += name
        val json = s"""{"query":"$name","count_records":$cnt,""" +
          s""""noop_records":$noop,"flagged":$flag}"""
        println(json)
        java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch {
        case e: Throwable =>
          println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}""")
      }
    }
    println(s"""{"summary":"count-vs-noop","flagged":[${
      flagged.map("\"" + _ + "\"").mkString(",")}]}""")
    spark.stop()
  }
}
