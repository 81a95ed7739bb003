package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.ExtensionQueries

/** Stage-split diagnostic for the dedup-cluster pipeline (q67):
  * `runMain graft.CcDiag <dir1,dir2,...> [reps]` times, per directory,
  * (a) the n-gram-Jaccard pair stage and (b) the connected-components
  * closure separately, and reports the closure's round count — so a
  * scale-curve wall-time jump can be attributed to pair mass, round
  * count, or per-round overhead instead of guessed at.
  *
  * Measures EXACTLY q67's input — `ExtensionQueries.augmentedDocs`
  * (fixture docs plus the injected every-7th near-dup mutants), not
  * the raw documents table — so pair counts and round counts here are
  * the pipeline's own numbers. Repetitions are INTERLEAVED across the
  * directory list (dir1,dir2,...,dir1,dir2,... rather than rep-major)
  * so a host-steal burst contaminates at most one rep of each cell;
  * the reported number is the min across reps.
  */
object CcDiag {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Cell(pairSec: Double, ccSec: Double, nPairs: Long,
                    ccRows: Long, rounds: Int)
    def once(dir: String): Cell = {
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      val docs = ExtensionQueries.augmentedDocs(spark, dir)
      val pairs = Dedup.ngramJaccard(docs, threshold = 0.3)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val nPairs = pairs.count()
      val pairSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val comps = Dedup.connectedComponents(pairs)
      val nRows = comps.count()
      val ccSec = (System.nanoTime() - t0) / 1e9
      Cell(pairSec, ccSec, nPairs, nRows, Dedup.lastCcRounds)
    }

    val cells = scala.collection.mutable.Map.empty[String, List[Cell]]
    for (r <- 1 to reps; dir <- dirs) {
      val c = once(dir)
      cells(dir) = c :: cells.getOrElse(dir, Nil)
      println(f"[cc-diag rep$r] $dir: pairs=${c.nPairs} (${c.pairSec}%.2f s) " +
        f"cc_rows=${c.ccRows} rounds=${c.rounds} (${c.ccSec}%.2f s)")
    }
    for (dir <- dirs) {
      val cs = cells(dir)
      // pair/row counts are deterministic — if reps ever disagreed
      // (a code or caching bug) the summary must say so, not silently
      // print one rep's number
      val pairCounts = cs.map(_.nPairs).distinct
      require(pairCounts.size == 1,
        s"[cc-diag] $dir: reps disagree on nPairs: $pairCounts")
      println(f"[cc-diag MIN] $dir: pairs=${pairCounts.head} " +
        f"pair_s=${cs.map(_.pairSec).min}%.2f cc_s=${cs.map(_.ccSec).min}%.2f " +
        f"rounds=${cs.map(_.rounds).max}")
    }
    spark.stop()
  }
}
