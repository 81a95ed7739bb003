package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{LakeIO, LakeZones}

/** The end-to-end training-data curation pipeline, composed from the
  * operator suite and staged through the medallion lake zones — what
  * a user actually runs, as opposed to the per-operator queries the
  * oracle gate checks one at a time:
  *
  *   bronze: raw documents, as landed
  *   silver: language/quality gated, PII scrubbed
  *   gold:   exact- and near-dup survivors + corpus mixture stats
  *
  * Every stage is one of the verified operators
  * ([[TextAnalysis.profile]], [[TextAnalysis.scrubPii]],
  * [[Dedup.exactSurvivors]], [[Dedup.minhashLsh]],
  * [[Dedup.connectedComponents]]), so the composition inherits their
  * scale shapes; the lake writes between stages are ATOMIC
  * ([[graft.sources.LakeIO.replaceGold]] staged rename — a crash
  * mid-write never corrupts a zone) and double as the restart
  * boundaries a 100 TB run needs anyway (downstream plans read a
  * flat scan instead of the whole upstream DAG). */
object Curation {

  /** Per-stage row counts, in pipeline order. */
  final case class Report(
      raw: Long, gated: Long, exactSurvivors: Long, nearDupSurvivors: Long)

  /** Run the full curation flow from a raw documents frame into
    * `zones`; returns the per-stage report. Deterministic end to end
    * (hash-based dedup keeps the smallest doc_id of every duplicate
    * cluster). */
  def run(spark: SparkSession, raw: DataFrame, zones: LakeZones,
          minQuality: Double = 0.3,
          langs: Seq[String] = Seq("en", "other"),
          nearDupThreshold: Double = 0.5): Report = {
    // bronze: land the raw corpus untouched
    LakeIO.replaceGold(raw, zones, "curation_bronze")
    val bronze = LakeIO.readGold(spark, zones, "curation_bronze")
    val nRaw = bronze.count()

    // silver: profile → language + quality gate → PII scrub
    val gated = TextAnalysis.profile(bronze)
      .filter(col("lang_pred").isin(langs: _*) &&
        col("quality") >= minQuality)
      .select(bronze.columns.map(col): _*)
    val scrubbed = TextAnalysis.scrubPii(gated)
      .withColumn("text", col("clean_text"))
      .drop("clean_text")
    LakeIO.replaceGold(scrubbed, zones, "curation_silver")
    val silver = LakeIO.readGold(spark, zones, "curation_silver")
    val nGated = silver.count()

    // gold 1: exact dedup (normalized-text fingerprints, min id wins)
    val exact = Dedup.exactSurvivors(silver)
    LakeIO.replaceGold(exact, zones, "curation_exact")
    val exactDf = LakeIO.readGold(spark, zones, "curation_exact")
    val nExact = exactDf.count()

    // gold 2: near-dup dedup — banded MinHash pairs, transitive
    // closure, keep the smallest id of every cluster
    val pairs = Dedup.minhashLsh(exactDf, threshold = nearDupThreshold)
    val removed =
      if (pairs.isEmpty) exactDf.limit(0).select(col("doc_id"))
      else Dedup.connectedComponents(pairs)
        .filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id"))
    val survivors = exactDf.join(removed, Seq("doc_id"), "left_anti")
    LakeIO.replaceGold(survivors, zones, "curation_gold")
    val gold = LakeIO.readGold(spark, zones, "curation_gold")
    val nGold = gold.count()

    // mixture stats beside the corpus (language histogram with token
    // mass — the q41/q83 shape over the final survivors)
    LakeIO.replaceGold(
      TextAnalysis.langHistogram(gold), zones, "curation_mixture")

    Report(nRaw, nGated, nExact, nGold)
  }
}
