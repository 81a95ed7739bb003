package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for q228_crawl_novelty's scale-curve steps
  * (`runMain graft.Q228Diag <dir1,dir2,...>`): rebuilds q228's exact
  * prior/incoming release split at each data dir and prints, per dir,
  * the masses that decide the two suspected regime steps —
  *
  *  1. sf1→sf2 record step (×5.16 fixture / ×5.17 diverse,
  *     corpus-INDEPENDENT): suspected broadcast→shuffle flip of the
  *     prior-bands × incoming-bands hash join. Evidence printed: the
  *     physical join node chosen for the cross-candidate join and the
  *     band-row masses that newly shuffle once the flip happens.
  *  2. fixture sf4→sf8 record step (×5.08 fixture vs ×2.00 diverse):
  *     suspected 3-shingle-space saturation (the q33/q67/q224
  *     regime). Evidence printed: distinct-shingle count (vocabulary),
  *     LSH band-bucket collision mass Σ n_prior·n_incoming and
  *     Σ C(n_incoming,2) (the candidate masses BEFORE distinct), and
  *     the distinct candidate-pair counts.
  *
  * One JSON line per dir on stdout and appended to
  * `target/q228_diag.jsonl`. */
object Q228Diag {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    // "plans" mode: skip the mass counts and emit only the physical
    // join census of the FULL q228 plan at each dir — the regime-flip
    // evidence (which joins the planner broadcasts at this dir's file
    // sizes). Construction still runs kernelAdmit's bounded fixpoint
    // rounds, but the final plan itself never executes.
    val plansOnly = args.length > 1 && args(1) == "plans"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val out = java.nio.file.Paths.get("target", "q228_diag.jsonl")
    java.nio.file.Files.createDirectories(out.getParent)

    if (plansOnly) {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
      for (dir <- dirs) {
        val df = SparkEntry.queries("q228_crawl_novelty")(spark, dir)
        val initial: SparkPlan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.initialPlan
          case p => p
        }
        var bhj = 0; var smj = 0; var shj = 0
        initial.foreach {
          case _: BroadcastHashJoinExec => bhj += 1
          case _: SortMergeJoinExec => smj += 1
          case _: ShuffledHashJoinExec => shj += 1
          case _ => ()
        }
        val json = s"""{"dir":"${Jsonl.esc(dir)}","full_plan":true,""" +
          s""""broadcast_hash_joins":$bhj,"sort_merge_joins":$smj,""" +
          s""""shuffled_hash_joins":$shj}"""
        println(json)
        java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    for (dir <- dirs) {
      val base = queries.QueryDef.table(spark, dir, "documents")
      val prior = base.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), col("text"))
      val off = queries.ExtensionQueries.mutantOffset(base, "doc_id")
      val incoming = base.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
        .unionByName(base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + off).as("doc_id"),
            concat(col("text"), lit(" spark")).as("text")))

      val shP = Dedup.shingleSets(prior, "doc_id", "text", 3)
      val shI = Dedup.shingleSets(incoming, "doc_id", "text", 3)
      val nP = prior.count(); val nI = incoming.count()
      val vocab = shP.unionByName(shI)
        .select(explode(col("sh")).as("s")).distinct().count()
      // the three measurements below (crossMass, crossDistinct,
      // crossPlan) each consume the band sets; checkpoint once per dir
      // so the shingle→minhash→band pipeline isn't recomputed three
      // times at the sf4/sf8 tiers this diagnostic exists to probe
      val bandsP = Dedup.bandedIds(
        Dedup.minhashSignatures(shP, 16), 16, 4).localCheckpoint()
      val bandsI = Dedup.bandedIds(
        Dedup.minhashSignatures(shI, 16), 16, 4).localCheckpoint()
      // bucket collision masses BEFORE distinct — the true candidate
      // record mass the verify stage shuffles
      val cP = bandsP.groupBy(col("band")).agg(count(lit(1)).as("np"))
      val cI = bandsI.groupBy(col("band")).agg(count(lit(1)).as("ni"))
      val crossMass = cP.join(cI, Seq("band"))
        .agg(coalesce(sum(col("np") * col("ni")), lit(0L))).head().getLong(0)
      val withinMass = cI
        .agg(coalesce(sum(expr("ni * (ni - 1) div 2")), lit(0L)))
        .head().getLong(0)
      val crossDistinct = bandsP.select(col("band"), col("id").as("id_a"))
        .join(bandsI.select(col("band"), col("id").as("id_b")), Seq("band"))
        .select(col("id_a"), col("id_b")).distinct().count()
      // which physical join the planner picks for the cross-candidate
      // band join at THIS dir's file sizes (the regime-flip evidence)
      val crossPlan = bandsP.select(col("band"), col("id").as("id_a"))
        .join(bandsI.select(col("band"), col("id").as("id_b")), Seq("band"))
        .queryExecution.executedPlan.toString()
      val joinNode =
        if (crossPlan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else if (crossPlan.contains("SortMergeJoin")) "SortMergeJoin"
        else if (crossPlan.contains("ShuffledHashJoin")) "ShuffledHashJoin"
        else "other"
      val json = s"""{"dir":"${Jsonl.esc(dir)}","prior_docs":$nP,"incoming_docs":$nI,""" +
        s""""band_rows_prior":${nP * 4},"band_rows_incoming":${nI * 4},""" +
        s""""distinct_shingles":$vocab,"cross_bucket_mass":$crossMass,""" +
        s""""within_bucket_mass":$withinMass,""" +
        s""""cross_distinct_pairs":$crossDistinct,""" +
        s""""cross_join_node":"$joinNode"}"""
      println(json)
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    spark.stop()
  }
}
