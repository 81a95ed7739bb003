package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.functions.TextFunctions
import graft.operators.{Clustering, Pruning, Sketches}
import graft.queries.ExtensionQueries.{augmentedEmbs, augmentedEmbsSql, cosSql, shinglesSql, toksSql}
import graft.queries.QueryDef.{spreadTable, table}
import graft.functions.DecimalExprs.{dec2, cents2}

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
      val e = spreadTable(s, dir, "embeddings")
      val assigned = Clustering.assignCells(e, Clustering.seedCentroids(e, 50))
      Clustering.centroidUpdate(assigned).orderBy(col("cell"), col("pos"))
    },
    Some(s"""
      WITH c AS (
        SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cents AS (
        SELECT CAST(vec_id AS BIGINT) AS c_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000),
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
    * near-dup-augmented embeddings, within-cell centroid-cosine rank
    * window (128) bounding pair mass to N·window, cosine ≥ 0.95
    * verification, keep-smallest-id pruning list. At fixture scale
    * factors every cell has < 128 members, so the window is inactive
    * and the result is independent of the rank order — engine
    * floating-point differences in the ranking cosine cannot affect
    * parity at the oracle gate. */
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
        FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000),
      scored AS (
        SELECT q.vec_id AS n_id, q.v AS nv, cents.c_id,
               list_dot_product(q.v, cents.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(cents.v, cents.v))) AS cos
        FROM aug q CROSS JOIN cents),
      assigned AS (
        SELECT n_id AS id, nv AS v, c_id AS cell, cos AS ccos,
               ROW_NUMBER() OVER (PARTITION BY n_id
                                  ORDER BY cos DESC, c_id) AS rn
        FROM scored),
      ranked AS (
        SELECT id, v, cell,
               ROW_NUMBER() OVER (PARTITION BY cell
                                  ORDER BY ccos DESC, id) AS rk
        FROM assigned WHERE rn = 1),
      pairs AS (
        SELECT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b
        FROM ranked a JOIN ranked b
          ON a.cell = b.cell AND a.rk < b.rk AND b.rk - a.rk <= 128
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
          "o_custkey", "c_custkey", expectedKeys = Some(10000L))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice")))
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

  /** q151 — MAD robust outlier audit (median absolute deviation):
    * per event type, the lower median and MAD via DISCRETE order
    * statistics (rank arithmetic, the q113 trick — no engine
    * quantile builtins, whose interpolation rules differ), then the
    * classic |v − med| > 3·MAD flag count. The robust sibling of
    * q68's z-score outliers: immune to the outliers it hunts. Two
    * rank windows + one aggregate, all keyed on event_type. */
  private val q151 = QueryDef(
    "q151_mad_outliers",
    (s, dir) => {
      val e = QueryDef.eventsTable(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
      val n = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val w1 = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val med = e.withColumn("r", row_number().over(w1))
        .join(broadcast(n), "event_type")
        .filter(col("r") === expr("(n + 1L) div 2"))
        .select(col("event_type"), col("value").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val w2 = Window.partitionBy(col("event_type"))
        .orderBy(col("dev"), col("event_id"))
      val mad = dev.withColumn("r", row_number().over(w2))
        .join(broadcast(n), "event_type")
        .filter(col("r") === expr("(n + 1L) div 2"))
        .select(col("event_type"), col("dev").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(col("med")).as("med"), min(col("mad")).as("mad"),
          sum(when(col("dev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (SELECT event_type, event_id, value FROM events),
      n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
      r1 AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS r
        FROM e),
      med AS (
        SELECT event_type, value AS med
        FROM r1 JOIN n USING (event_type) WHERE r = (n + 1) // 2),
      dev AS (
        SELECT e.event_type, e.event_id, med, abs(e.value - med) AS dev
        FROM e JOIN med USING (event_type)),
      r2 AS (
        SELECT event_type, dev,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY dev, event_id) AS r
        FROM dev),
      mad AS (
        SELECT event_type, dev AS mad
        FROM r2 JOIN n USING (event_type) WHERE r = (n + 1) // 2)
      SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN(med) AS med, MIN(mad) AS mad,
             CAST(COUNT(*) FILTER (WHERE dev > 3.0 * mad) AS BIGINT)
               AS n_outliers
      FROM dev d JOIN mad USING (event_type)
      GROUP BY d.event_type ORDER BY d.event_type"""))

  /** q152 — composite entity-resolution scoring (Fellegi–Sunter
    * style): for each sorted-neighborhood candidate pair (the q140
    * blocking), three independent similarity features — Jaro–Winkler
    * on the normalized 60-char head ([[graft.functions
    * .JaroWinklerExpr]]), Levenshtein similarity on the 100-char
    * head, token-set Jaccard on the 200-char head — combined into a
    * fixed-weight match score. The "agree on several weak signals"
    * pattern real record linkage uses instead of any single
    * distance; every feature and the fused score oracle-checked. */
  private val q152 = QueryDef(
    "q152_er_score",
    (s, dir) => {
      import graft.functions.JaroWinklerExpr.jaro_winkler
      import graft.operators.Dedup
      val docs = ExtensionQueries.augmentedDocs(s, dir, spread = true)
      // all three comparator features ride through the block join
      // (carry): the corpus pipeline is evaluated once and the two
      // feature join-backs (plus their corpus re-evaluations) are gone
      val pairs = Dedup.sortedNeighborhoodPairs(
        docs, substring(lower(col("text")), 1, 40), window = 5,
        carry = Seq(
          "jw" -> substring(lower(col("text")), 1, 60),
          "lev" -> substring(col("text"), 1, 100),
          "tok" -> array_distinct(TextFunctions.tokens(
            substring(col("text"), 1, 200)))))
      pairs
        .withColumn("jw", round(jaro_winkler(col("a_jw"), col("b_jw")), 6))
        .withColumn("lev_sim", round(lit(1.0) -
          levenshtein(col("a_lev"), col("b_lev")).cast(DoubleType) /
            greatest(length(col("a_lev")), length(col("b_lev"))), 6))
        .withColumn("inter",
          size(array_intersect(col("a_tok"), col("b_tok"))).cast(LongType))
        .withColumn("uni",
          size(col("a_tok")) + size(col("b_tok")) - col("inter"))
        .withColumn("jac", when(col("uni") === 0L, lit(1.0))
          .otherwise(round(col("inter").cast(DoubleType) / col("uni"), 6)))
        // fuse in EXACT decimal arithmetic: 0.4·jw + 0.3·lev + 0.3·jac
        // over 6-dp features has 7-dp values that land exactly on .5
        // round-to-6 boundaries, where double rounding diverges
        // between engines — so never round the fused score at all
        .withColumn("score_dec", expr(
          """CAST(0.4 AS DECIMAL(2,1)) * CAST(jw AS DECIMAL(8,6))
             + CAST(0.3 AS DECIMAL(2,1)) * CAST(lev_sim AS DECIMAL(8,6))
             + CAST(0.3 AS DECIMAL(2,1)) * CAST(jac AS DECIMAL(8,6))"""))
        .select(col("a_id"), col("b_id"), col("jw"), col("lev_sim"),
          col("jac"), col("score_dec").cast(DoubleType).as("score"),
          (col("score_dec") >= expr("CAST(0.75 AS DECIMAL(3,2))"))
            .as("is_match"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some(s"""
      WITH ${ExtensionQueries.augmentedDocsSql},
      keyed AS (SELECT doc_id, substring(lower(text), 1, 40) AS k FROM aug),
      ranked AS (SELECT doc_id,
                        ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rnk
                 FROM keyed),
      feat AS (
        SELECT doc_id, substring(lower(text), 1, 60) AS jw_key,
               substring(text, 1, 100) AS lev_key,
               list_distinct(list_filter(
                 string_split(lower(substring(text, 1, 200)), ' '),
                 x -> x <> '')) AS tok
        FROM aug),
      pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM ranked a JOIN ranked b
          ON b.rnk > a.rnk AND b.rnk <= a.rnk + 5),
      f AS (
        SELECT a_id, b_id,
               ROUND(jaro_winkler_similarity(fa.jw_key, fb.jw_key), 6) AS jw,
               ROUND(1.0 - CAST(levenshtein(fa.lev_key, fb.lev_key) AS DOUBLE)
                 / greatest(length(fa.lev_key), length(fb.lev_key)), 6)
                 AS lev_sim,
               CAST(len(list_intersect(fa.tok, fb.tok)) AS BIGINT) AS inter,
               CAST(len(fa.tok) + len(fb.tok)
                 - len(list_intersect(fa.tok, fb.tok)) AS BIGINT) AS uni
        FROM pairs
        JOIN feat fa ON fa.doc_id = a_id
        JOIN feat fb ON fb.doc_id = b_id),
      g AS (
        SELECT a_id, b_id, jw, lev_sim,
               CASE WHEN uni = 0 THEN 1.0
                    ELSE ROUND(CAST(inter AS DOUBLE) / uni, 6) END AS jac
        FROM f),
      h AS (
        SELECT a_id, b_id, jw, lev_sim, jac,
               CAST(0.4 AS DECIMAL(2,1)) * CAST(jw AS DECIMAL(8,6))
                 + CAST(0.3 AS DECIMAL(2,1)) * CAST(lev_sim AS DECIMAL(8,6))
                 + CAST(0.3 AS DECIMAL(2,1)) * CAST(jac AS DECIMAL(8,6))
                 AS score_dec
        FROM g)
      SELECT a_id, b_id, jw, lev_sim, jac,
             CAST(score_dec AS DOUBLE) AS score,
             score_dec >= CAST(0.75 AS DECIMAL(3,2)) AS is_match
      FROM h ORDER BY a_id, b_id"""))

  def all: Seq[QueryDef] =
    Seq(q73, q74, q75, q76, q77, q78, q79, q151, q152)
}
