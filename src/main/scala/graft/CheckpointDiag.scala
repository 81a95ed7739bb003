package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Checkpoints

/** Reliable-checkpoint overhead measurement:
  * `runMain graft.CheckpointDiag [sfDir]` runs the heaviest iterative
  * query (q67 — near-dup pairs + connected-components closure) twice
  * in one JVM: with the default `localCheckpoint()` policy and with
  * `graft.checkpoint.reliable=true` writing every round to a durable
  * checkpoint directory. The delta is the per-round durability tax a
  * cluster deployment pays for executor-loss tolerance (ScaleSpec
  * already proves the two paths produce identical results; this
  * quantifies the trade, recorded in docs/PLANS.md).
  */
object CheckpointDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q67 = SparkEntry.queries("q67_dedup_clusters")

    def time(label: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = q67(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ckpt-diag] $label: $n rows, $dt%.2f s " +
        f"(cc rounds: ${graft.operators.Dedup.lastCcRounds})")
      dt
    }

    // interleave modes (local, reliable, local, reliable, ...) after a
    // warmup so JIT/page-cache warmth doesn't bias whichever mode runs
    // later; report the per-mode minimum
    def setReliable(on: Boolean): Unit = {
      spark.conf.set(Checkpoints.ReliableConf, on.toString)
      spark.conf.set(Checkpoints.DirConf, "target/ckpt-diag")
    }
    time("warmup (local)")
    val locals = Seq.newBuilder[Double]
    val reliables = Seq.newBuilder[Double]
    for (i <- 1 to 3) {
      setReliable(false); locals += time(s"localCheckpoint #$i")
      setReliable(true); reliables += time(s"reliable checkpoint #$i")
    }
    val local = locals.result().min
    val reliable = reliables.result().min
    println(f"[ckpt-diag] min local $local%.2f s, min reliable $reliable%.2f s, " +
      f"overhead ${reliable - local}%.2f s (x${reliable / local}%.2f) at $sfDir")
    spark.stop()
  }
}
