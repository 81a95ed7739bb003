package graft

import org.apache.spark.sql.SparkSession
import graft.queries.QueryDef

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query and
  * total wall seconds.
  *
  * Measurement discipline: the table files are pre-read once (page
  * cache + vectorized-reader/JIT warmup), then every query runs in
  * SPARK_GRAFT_BENCH_PASSES (default 2) FULL PASSES over the whole
  * query list, reporting each query's fastest sample — steady-state
  * query cost, not first-touch JVM warmup. Samples of the same query
  * are minutes apart, so a host CPU-steal stall (this environment
  * shows multi-second bursts that would span two back-to-back runs)
  * contaminates at most one sample. At the default 2 passes, a >2×
  * disagreement between the two samples triggers a third targeted
  * sample (you can't tell from two wild samples whether the min is
  * steady state or luck); at ≥3 passes the min is already robust to
  * one contaminated sample per query, so no tiebreaks fire — the
  * BINDING local baseline protocol (BASELINE.md) is 3 passes on an
  * otherwise-idle box, chosen so the artifact's tiebreak count is
  * structurally zero and a real ~1.3× single-query drift is visible
  * over the ±30% steal band that two-pass artifacts carried. Cached/
  * broadcast state is dropped between queries so none borrows work
  * from a predecessor.
  *
  * Consumption is a `noop`-sink write, NOT `count()`: under count()
  * Catalyst prunes everything row-count-preserving — q226's entire
  * bloom-join subtree vanished (left join to a unique-key aggregate),
  * and projection-only work (q45's scrub column, q03's decodes) was
  * never evaluated. The noop write consumes every column of every
  * row, so the measured plan is the plan a consumer pays for, at zero
  * sink cost. Round 7 switched this (and ScalingBench); the recorded
  * continuity note lives in docs/PLANS.md.
  */
object Bench {
  /** Force full evaluation of every row and column without sink cost. */
  def consume(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Generated-class cache sized to the workload (round-14, guide
      // §1.2 step 3): the default 100 entries cannot hold one pass of
      // this 231-query registry, so EVERY pass re-Janino-compiled
      // every query's codegen units — measured 211.8 s → 151.6 s
      // (×0.72) on the identical 3-pass protocol, 181 queries faster,
      // none slower beyond noise. A long-lived driver serving many
      // distinct queries sizes this cache the same way; it is
      // workload-sized (compiled classes), not data-sized, so the
      // setting is scale-independent. Parameterized for the driver's
      // low-core runs and future registry growth.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8000"))
      // Never use the bypass-merge shuffle writer (round-14, guide
      // §1.1 empirical loop): stack-sampling the whole bench showed
      // java.io.FileOutputStream.open0 as the TOP executor CPU frame
      // — BypassMergeSortShuffleWriter opens numPartitions files per
      // map task, which at this scale factor is pure filesystem
      // churn (32 creates+deletes per task for a few KB of shuffle
      // data). The sort writer opens ~1 file per task. Measured
      // 138.1 s → 115.5 s (with the same round's expression fixes)
      // on the 3-pass protocol, 1 query regressed > 0.1 s. At real
      // tiers shuffle partition counts exceed the default threshold
      // (200), so bypass never fires and this setting is a NO-OP at
      // scale — it only removes a small-scale measurement artifact.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try QueryDef.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try QueryDef.eventsTable(spark, sfDir).count()
    catch { case _: Throwable => () }

    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { consume(fn(spark, sfDir)) } catch { case _: Throwable => return -1.0 }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // validated parse: a garbage env value falls back to the default
    // rather than crashing the bench run
    val nPasses = scala.util.Try(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").trim.toInt)
      .getOrElse(2).max(2)
    val passes = (1 to nPasses).map { _ =>
      named.map { case (name, fn) => name -> once(fn) }.toMap
    }
    // at exactly 2 passes, >2x cold/warm disagreement (host steal)
    // triggers a third targeted sample, recorded separately so
    // consumers reconciling the maps can see why queries[q] may be
    // below min(cold, warm); at >=3 passes the min is already robust
    // and no tiebreaks fire
    val tiebreaks = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = named.map { case (name, fn) =>
      val samples = passes.map(_(name))
      val best =
        if (samples.exists(_ < 0)) -1.0
        else if (nPasses == 2 &&
            samples.max > 2 * samples.min && samples.max - samples.min > 0.5) {
          val c = once(fn)
          tiebreaks(name) = c
          if (c < 0) samples.min else math.min(samples.min, c)
        } else samples.min
      name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // EVERY pass's per-query samples ride along (queries_pass1..N —
    // pass1 is the cold pass) so round-over-round comparisons can
    // separate steady-state cost from host-steal luck, and so the
    // reported min is always reconstructible from recorded samples
    // at any pass count (the 2-pass cold/warm pair lost passes 3+);
    // "queries"/"value" stay the best-sample contract
    def passJson(p: Map[String, Double]) = named
      .map { case (name, _) => "\"" + name + "\":" + p(name) }
      .mkString("{", ",", "}")
    val passMaps = passes.zipWithIndex
      .map { case (p, i) => s""""queries_pass${i + 1}":${passJson(p)}""" }
      .mkString(",")
    val tbJson = tiebreaks
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s"""$passMaps,""" +
      s""""queries_tiebreak":$tbJson,"passes":$nPasses,""" +
      s""""consumption":"noop","sf":"$sfDir"}"""
    println(json)
    // Durable copy: the driver captures a bounded tail of stdout, which
    // truncated the r03 artifact; the file survives regardless of log noise.
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    // Mirror the full map into docs/ so the driver's round-end run
    // leaves a committable artifact: BENCH_r{N}.json holds only a 2 kB
    // stdout tail (~51 of 228 per-query times recoverable), and
    // target/ is wiped by `sbt clean`. The next round commits this
    // file as docs/bench_r{N}_driver.json, making per-query
    // round-over-round deltas independent of the driver's capture
    // window. Best-effort: a read-only docs/ must not fail the bench.
    try {
      val mirror = java.nio.file.Paths.get("docs", "bench_driver_latest.json")
      java.nio.file.Files.createDirectories(mirror.getParent)
      java.nio.file.Files.write(mirror, json.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
