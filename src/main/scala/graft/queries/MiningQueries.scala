package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.functions.TextFunctions
import graft.operators.{Clustering, Pruning, Sketches}
import graft.queries.ExtensionQueries.{augmentedEmbs, augmentedEmbsSql, cosSql, shinglesSql, toksSql}
import graft.queries.QueryDef.table

/** Round-3 second widening: distributed clustering (k-means Lloyd
  * step), SemDeDup semantic dedup, sequence packing for pretraining
  * batches, sketch-narrowed exact heavy hitters, Bloom-filter join
  * pruning, and unigram-frequency document scoring — the mining /
  * curation operations a 100 TB training-data pipeline layers on top
  * of the dedup tier, each oracle-checked against DuckDB. */
object MiningQueries {

  /** q73 — one exact k-means Lloyd iteration over the embeddings:
    * deterministic seed codebook (every 50th vector), broadcast
    * nearest-centroid assignment (map-side argmax, one N-row
    * shuffle), exact DECIMAL per-dimension means. Iterating this
    * plan (with localCheckpoint between rounds) IS distributed
    * k-means; one round is verified bit-exactly. */
  private val q73 = QueryDef(
    "q73_kmeans_iter",
    (s, dir) => {
      val e = table(s, dir, "embeddings")
      val assigned = Clustering.assignCells(e, Clustering.seedCentroids(e, 50))
      Clustering.centroidUpdate(assigned).orderBy(col("cell"), col("pos"))
    },
    Some(s"""
      WITH c AS (
        SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cents AS (
        SELECT CAST(vec_id AS BIGINT) AS c_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 50 = 0),
      scored AS (
        SELECT a.n_id, a.v AS nv, b.c_id, $cosSql AS cos
        FROM c a CROSS JOIN cents b),
      best AS (
        SELECT n_id, nv, c_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY n_id
                                  ORDER BY cos DESC, c_id) AS rn
        FROM scored),
      ex AS (
        SELECT cell, CAST(generate_subscripts(nv, 1) AS BIGINT) AS pos,
               CAST(CAST(unnest(nv) AS DOUBLE) AS DECIMAL(20,7)) AS xd
        FROM best WHERE rn = 1)
      SELECT cell, pos, COUNT(*) AS n_vecs,
             CAST(SUM(xd) AS DOUBLE) / COUNT(*) AS centroid
      FROM ex GROUP BY 1, 2 ORDER BY cell, pos"""))

  /** q74 — sequence packing (concatenate-and-chunk): per source
    * stream in doc_id order, a document lands in the context-window
    * bin where its first token falls (budget 2048). Per-source
    * windows keep the prefix sum parallel — the 100 TB layout shards
    * packing by source/shard key, never a global single-partition
    * sort. */
  private val q74 = QueryDef(
    "q74_seq_packing",
    (s, dir) => {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("bin", expr("(cum - n_tok) div 2048"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tokens"))
        .orderBy(col("source"), col("bin"))
    },
    Some(s"""
      WITH toks AS (
        SELECT source, doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        FROM toks)
      SELECT source, CAST((cum - n_tok) // 2048 AS BIGINT) AS bin,
             COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
      FROM c GROUP BY 1, 2 ORDER BY source, bin"""))

  /** q75 — SemDeDup semantic dedup: k-means-cell blocking over the
    * near-dup-augmented embeddings, within-cell cosine ≥ 0.95 pairs,
    * keep-smallest-id pruning list. */
  private val q75 = QueryDef(
    "q75_semantic_dedup",
    (s, dir) => {
      val aug = augmentedEmbs(s, dir)
      // codebook from the BASE corpus (augmented copies assign to it),
      // element type widened to match the augmented vectors
      val cents = Clustering.seedCentroids(table(s, dir, "embeddings"), 50)
        .select(col("c_id"),
          transform(col("c_v"), x => x.cast("double")).as("c_v"))
      Clustering.semanticDedup(aug, cents, threshold = 0.95)
        .orderBy(col("removed_id"))
    },
    Some(s"""
      WITH $augmentedEmbsSql,
      cents AS (
        SELECT CAST(vec_id AS BIGINT) AS c_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 50 = 0),
      scored AS (
        SELECT q.vec_id AS n_id, q.v AS nv, cents.c_id,
               list_dot_product(q.v, cents.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(cents.v, cents.v))) AS cos
        FROM aug q CROSS JOIN cents),
      assigned AS (
        SELECT n_id AS id, nv AS v, c_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY n_id
                                  ORDER BY cos DESC, c_id) AS rn
        FROM scored),
      pairs AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM (SELECT * FROM assigned WHERE rn = 1) a
        JOIN (SELECT * FROM assigned WHERE rn = 1) b
          ON a.cell = b.cell AND a.id < b.id
        WHERE $cosSql >= 0.95)
      SELECT id_b AS removed_id, MIN(id_a) AS kept_id
      FROM pairs GROUP BY 1 ORDER BY removed_id"""))

  /** q76 — heavy hitters: Misra–Gries partition sketches nominate
    * candidates (bounded memory, no full-vocabulary shuffle), an
    * exact pass restores true counts — the result equals plain
    * GROUP BY HAVING count ≥ ⌈0.005·N⌉ for any partitioning. */
  private val q76 = QueryDef(
    "q76_heavy_hitters",
    (s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      Sketches.heavyHitters(s, toks, phi = 0.005).orderBy(col("token"))
    },
    Some(s"""
      WITH toks AS (
        SELECT unnest($toksSql) AS token FROM documents),
      n AS (SELECT COUNT(*) AS n_total FROM toks),
      g AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1)
      SELECT token, cnt, n_total
      FROM g, n
      WHERE cnt >= CAST(ceil(n_total * 0.005) AS BIGINT)
      ORDER BY token"""))

  /** q77 — Bloom-pruned join: high-balance BUILDING customers' order
    * revenue, with the fact scan pre-filtered by a Bloom filter of
    * the dimension keys before the join (exact — false positives die
    * in the real join). */
  private val q77 = QueryDef(
    "q77_bloom_prune",
    (s, dir) => {
      val cust = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"))
      Pruning.bloomPrunedJoin(table(s, dir, "orders"), cust,
          "o_custkey", "c_custkey", expectedKeys = 10000L)
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("revenue"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
      GROUP BY 1, 2 ORDER BY c_custkey"""))

  /** q78 — unigram-frequency document score (CCNet-style quality
    * signal without a trained LM): mean corpus frequency of a doc's
    * tokens. Integer sums throughout; one double division at the
    * end, so the score is bit-stable. */
  private val q78 = QueryDef(
    "q78_unigram_doc_score",
    (s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("token"))
      val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      toks.join(freq, Seq("token"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("tf")).as("freq_mass"))
        .withColumn("score",
          col("freq_mass").cast(DoubleType) / col("n_tok").cast(DoubleType))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, unnest($toksSql) AS token FROM documents),
      f AS (SELECT token, COUNT(*) AS tf FROM toks GROUP BY 1)
      SELECT doc_id, COUNT(*) AS n_tok, CAST(SUM(tf) AS BIGINT) AS freq_mass,
             CAST(SUM(tf) AS DOUBLE) / COUNT(*) AS score
      FROM toks JOIN f USING (token)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Per-family `MIN((h·a_j + b_j) % P)` SQL twin of the union
    * signature (j = 0..15). */
  private val unionSigSql: String =
    (0 until 16).map { i =>
      val a = graft.operators.Dedup.minhashA(i)
      val b = graft.operators.Dedup.minhashB(i)
      s"MIN((h*$a + $b) % ${graft.operators.Dedup.MinhashP}) AS h$i"
    }.mkString(",\n               ")

  /** q79 — corpus-level set similarity via the typed MinhashUnion
    * aggregator: each source's document signatures fold (elementwise
    * min, map-side partial) into ONE signature equal to the
    * signature of the union of the source's shingle sets; pairwise
    * component agreement then estimates cross-source Jaccard without
    * intersecting the underlying sets. */
  private val q79 = QueryDef(
    "q79_source_minhash_union",
    (s, dir) => {
      val shingled = table(s, dir, "documents")
        .select(col("source"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("source"), array_distinct(
          graft.functions.TextExprs.word_shingles(col("toks"), 3)).as("sh"))
      val sigs = shingled
        .select(col("source"),
          graft.functions.MinhashExprs.minhash_signature(
            graft.functions.MinhashExprs.minhash_base_hashes(col("sh")), 16)
            .as("sig"))
        .groupBy(col("source"))
        .agg(graft.functions.MinhashAgg.minhashUnion(16)(col("sig")).as("usig"))
      val a = sigs.select(col("source").as("source_a"), col("usig").as("ua"))
      val b = sigs.select(col("source").as("source_b"), col("usig").as("ub"))
      a.join(b, col("source_a") < col("source_b"))
        .withColumn("n_match",
          aggregate(
            zip_with(col("ua"), col("ub"),
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v))
        .withColumn("est_jaccard",
          col("n_match").cast(DoubleType) / lit(16.0))
        .select(col("source_a"), col("source_b"), col("n_match"),
          col("est_jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""
      WITH toks AS (SELECT source, doc_id, $toksSql AS t FROM documents),
      shing AS (SELECT source, list_distinct($shinglesSql) AS sh FROM toks),
      hsrc AS (
        SELECT source,
               unnest(list_transform(sh,
                 s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
                        % ${graft.operators.Dedup.MinhashP})) AS h
        FROM shing),
      sig AS (
        SELECT source, $unionSigSql
        FROM hsrc GROUP BY source)
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(${(0 until 16).map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT) AS n_match,
             CAST(${(0 until 16).map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")} AS DOUBLE) / 16.0 AS est_jaccard
      FROM sig a JOIN sig b ON a.source < b.source
      ORDER BY source_a, source_b"""))

  def all: Seq[QueryDef] = Seq(q73, q74, q75, q76, q77, q78, q79)
}
