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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rt = Runtime.getRuntime
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      (1 to 2).foreach { i =>
        val heap0 = (rt.totalMemory - rt.freeMemory) / 1e6
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case e: Throwable => println(s"ERR $name: $e"); -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        val heap1 = (rt.totalMemory - rt.freeMemory) / 1e6
        println(f"[bd] $name%-28s run$i $dt%7.2fs rows=$n%-8d heap ${heap0}%.0f->${heap1}%.0fMB")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
