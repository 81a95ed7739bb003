package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-split diagnostic for the dedup-cluster pipeline (q67):
  * `runMain graft.CcDiag <dir1,dir2,...>` times, per directory,
  * (a) the n-gram-Jaccard pair stage and (b) the connected-components
  * closure separately, and reports the closure's round count — so a
  * scale-curve wall-time jump can be attributed to pair mass, round
  * count, or per-round overhead instead of guessed at.
  */
object CcDiag {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      var t0 = System.nanoTime()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val pairs = Dedup.ngramJaccard(docs, threshold = 0.3)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val nPairs = pairs.count()
      val pairSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val comps = Dedup.connectedComponents(pairs)
      val nRows = comps.count()
      val ccSec = (System.nanoTime() - t0) / 1e9
      println(f"[cc-diag] $dir: pairs=$nPairs ($pairSec%.2f s) " +
        f"cc_rows=$nRows rounds=${Dedup.lastCcRounds} ($ccSec%.2f s)")
    }
    spark.stop()
  }
}
