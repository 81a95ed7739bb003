package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale cell for the streaming near-dup admission gate
  * (`runMain graft.AdmitScale <docsDir1,docsDir2,...> [nBatches]`):
  * replays each corpus through [[graft.streaming.StreamingOps
  * .admitBatch]] as `nBatches` (default 8) id-ordered micro-batches —
  * the foreachBatch body `nearDupAdmit` runs, driven directly the way
  * NearDupAdmitSpec does — and records, per corpus: docs, admitted,
  * state rows + parquet bytes after the last batch, and per-batch
  * wall seconds (mean of the steady-state tail, plus max).
  *
  * The claim under measurement: STATE grows with admitted (unique)
  * content, not stream length, and per-batch wall is governed by
  * (batch bands × state bands) candidates — so doubling the corpus at
  * a fixed batch size may double state and the number of batches, but
  * never makes one batch pay a corpus-sized shuffle.
  *
  * Output: one JSON line per corpus, appended to
  * `target/admit_scale.jsonl`.
  */
object AdmitScale {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val out = java.nio.file.Paths.get("target", "admit_scale.jsonl")
    java.nio.file.Files.createDirectories(out.getParent)

    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).localCheckpoint()
      val n = docs.count()
      if (n == 0) {
        // skips go to the durable artifact too — the file (not stdout,
        // which the driver truncates) is the record of what ran, and a
        // skipped dir must be visible to artifact consumers
        val skipJson = s"""{"dir":"${Jsonl.esc(dir)}","docs":0,"skipped":"empty corpus"}"""
        println(skipJson)
        java.nio.file.Files.write(out, (skipJson + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } else {
      val stateDir = Files.createTempDirectory("graft_admit_state").toString
      val outDir = Files.createTempDirectory("graft_admit_out").toString
      // id-range batches = arrival order (the greedyAdmit equivalence
      // regime NearDupAdmitSpec proves)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val step = maxId / nBatches + 1
      val walls = (0 until nBatches).map { i =>
        val b = docs.filter(col("doc_id") >= i * step &&
          col("doc_id") < (i + 1) * step)
        val t0 = System.nanoTime()
        graft.streaming.StreamingOps.admitBatch(b, i.toLong, stateDir, outDir)
        (System.nanoTime() - t0) / 1e9
      }
      val decisions = spark.read.parquet(outDir)
      val admitted = decisions.filter(col("status") === "A").count()
      val state = spark.read.parquet(stateDir)
      val stateRows = state.count()
      val walk = Files.walk(java.nio.file.Paths.get(stateDir))
      val stateBytes =
        try walk.filter(p => p.toString.endsWith(".parquet"))
          .mapToLong(p => java.nio.file.Files.size(p)).sum()
        finally walk.close()
      // steady-state batch cost: drop the first (JIT/cold) batch
      val tail = walls.drop(1)
      val json = s"""{"dir":"${Jsonl.esc(dir)}","docs":$n,"batches":$nBatches,""" +
        s""""admitted":$admitted,"state_rows":$stateRows,""" +
        s""""state_bytes":$stateBytes,""" +
        s""""batch_sec_mean":${tail.sum / tail.size},""" +
        s""""batch_sec_max":${walls.max},""" +
        s""""batch_sec_all":[${walls.map(w => f"$w%.3f").mkString(",")}]}"""
      println(json)
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      }
    }
    spark.stop()
  }
}
