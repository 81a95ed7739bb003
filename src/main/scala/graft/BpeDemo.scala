package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Vocab-scale BPE demonstration:
  * `runMain graft.BpeDemo [nMerges] [mode]`.
  *
  * Measurements, recorded in docs/PLANS.md:
  *  1. the documents fixture (31-word vocabulary) trained in EXACT
  *     mode until pair exhaustion — the fixture's merge ceiling is a
  *     measured number, not an argument;
  *  2. a wide-vocabulary corpus (50k distinct md5-hex words, the
  *     shape of a real subword-tokenizer training set) trained in
  *     fast mode to nMerges (default 8192) — proving the batched
  *     merge loop reaches vocab scale in a bounded number of driver
  *     rounds (≈ nMerges / maxBatch, not nMerges).
  *
  * `mode = exactwide` runs ONLY the wide corpus in EXACT mode
  * (sequential-equivalent merge order — each round advances a
  * conflict-free prefix of the global frequency order) to nMerges:
  * the round-6 verdict asked for exact mode's cadence beyond the
  * fixture's 89-merge ceiling as a recorded number.
  */
object BpeDemo {
  def main(args: Array[String]): Unit = {
    val nMerges = args.headOption.map(_.toInt).getOrElse(8192)
    val mode = args.lift(1).getOrElse("all")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // vocab-scale corpus: 50k rows × 2 distinct 32-char hex words
    def wide = spark.range(50000).select(
      concat_ws(" ",
        md5(col("id").cast("string")),
        md5(concat(col("id").cast("string"), lit("x")))).as("text"))

    if (mode == "exactwide") {
      val t0 = System.nanoTime()
      val rules = TextAnalysis.bpeTrain(wide, nMerges = nMerges,
        minPairFreq = 2L, maxBatch = 256, exact = true)
      val n = rules.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = TextAnalysis.lastTrainRounds
      println(f"[bpe-demo] wide-vocab EXACT: $n merges in $rounds driver " +
        f"rounds, $sec%.1f s (${n.toDouble / math.max(rounds, 1)}%.1f merges/round)")
      spark.stop()
      return
    }

    // 1. fixture ceiling: exact mode, ask for far more merges than the
    // 31-word vocabulary can yield; train stops at exhaustion
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    var t0 = System.nanoTime()
    val fixtureRules = TextAnalysis.bpeTrain(docs, nMerges = 100000,
      minPairFreq = 2L, exact = true)
    val fixtureN = fixtureRules.count()
    val fixtureSec = (System.nanoTime() - t0) / 1e9
    val fixtureRounds = TextAnalysis.lastTrainRounds
    println(f"[bpe-demo] fixture: exhausted at $fixtureN merges in " +
      f"$fixtureRounds rounds, $fixtureSec%.1f s")

    // 2. vocab-scale fast mode
    t0 = System.nanoTime()
    val rules = TextAnalysis.bpeTrain(wide, nMerges = nMerges,
      minPairFreq = 2L, maxBatch = 256, exact = false)
    val n = rules.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val rounds = TextAnalysis.lastTrainRounds
    println(f"[bpe-demo] wide-vocab: $n merges in $rounds driver rounds, " +
      f"$sec%.1f s (${n.toDouble / math.max(rounds, 1)}%.0f merges/round)")
    spark.stop()
  }
}
