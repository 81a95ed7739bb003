package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.functions.TextFunctions
import graft.operators.Clustering
import graft.queries.ExtensionQueries.{cosSql, toksSql}
import graft.queries.QueryDef.{eventsTable, spreadTable, table}
import graft.functions.DecimalExprs.{dec2, cents2}

/** Round-3 fourth widening: the retrieval / serving tier — keyword
  * relevance search (integer-exact BM25), cumulative-distinct growth
  * curves, time-weighted averages, Markov transition matrices, fuzzy
  * string matching, RFM segmentation, and per-partition migration
  * checksums. These are the read-side operations a warehouse serves
  * after curation (reference serving surface: `sql_scripts/
  * load_gold_data.sql`, `docs/technical_report.md` §serving), each
  * re-expressed as a declarative Spark plan and DuckDB-oracle-checked.
  *
  * Bit-stability conventions follow [[QueryDef]]: ratios are scaled
  * integers via integer division (`div` / `//`), money stays in
  * DECIMAL until one final double division of exact inputs.
  */
object ServingQueries {

  /** q101 — BM25 keyword retrieval, integer-exact. Classic BM25 with
    * k1 = 6/5 and b = 3/4 has, per matched term,
    *   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * which with avgdl = T/N (T corpus tokens, N docs) clears to the
    * all-integer rational 44·tf·T / (20·T·tf + 6·T + 18·N·dl); the
    * idf factor uses the probabilistic form (N − df + ½)/(df + ½) =
    * (2N − 2df + 1)/(2df + 1). Both are floored at 10⁶ scale, so the
    * score is a pure BIGINT — no floating point anywhere, identical
    * in any engine. Plan shape: token filter BEFORE explode (only
    * query-term hits shuffle), tiny df and corpus-stats frames
    * broadcast — at 100 TB the shuffle carries only matching
    * postings, never the corpus. */
  private val bm25Terms = Seq("spark", "vector", "stream")

  private val q101 = QueryDef(
    "q101_bm25_topk",
    (s, dir) => {
      val termsArr = array(bm25Terms.map(lit): _*)
      val stats = table(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .select(col("doc_id"), size(col("t")).cast(LongType).as("dl"), col("t"))
      val corpus = stats.agg(count(lit(1)).as("n"), sum(col("dl")).as("tt"))
      val tf = stats
        .select(col("doc_id"), col("dl"),
          explode(filter(col("t"), x => array_contains(termsArr, x))).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(corpus))
        .withColumn("si",
          expr("(1000000L * 44L * tf * tt) div (20L * tt * tf + 6L * tt + 18L * n * dl)"))
        .withColumn("wi",
          expr("(1000000L * (2L * n - 2L * df + 1L)) div (2L * df + 1L)"))
        .withColumn("term_score", expr("(si * wi) div 1000000L"))
        .groupBy(col("doc_id"))
        .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },
    Some(s"""
      WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      stats AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, t FROM toks),
      corpus AS (SELECT COUNT(*) AS n, SUM(dl) AS tt FROM stats),
      tf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl,
                     unnest(list_filter(t, x -> list_contains(['spark','vector','stream'], x))) AS term
              FROM stats)
        GROUP BY 1, 2, 3),
      dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      sc AS (
        SELECT f.doc_id,
               (((1000000 * 44 * f.tf * c.tt) // (20 * c.tt * f.tf + 6 * c.tt + 18 * c.n * f.dl))
                * ((1000000 * (2 * c.n - 2 * d.df + 1)) // (2 * d.df + 1))) // 1000000 AS term_score
        FROM tf f JOIN dfreq d USING (term) CROSS JOIN corpus c)
      SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score, COUNT(*) AS n_terms
      FROM sc GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 10"""))

  /** q102 — cumulative-distinct growth curve (daily active-user
    * accumulation) WITHOUT a distinct-over-expanding-window: first-seen
    * day per user (one shuffle on user_id), then daily new-user counts
    * and a running sum over the tiny per-day frame. The naive
    * `COUNT(DISTINCT) OVER (ORDER BY day)` is O(days × users) state;
    * this is the scalable first-seen reformulation. */
  private val q102 = QueryDef(
    "q102_cumulative_users",
    (s, dir) => {
      val firstSeen = eventsTable(s, dir)
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
      // post-agg frame is #days rows; the single-partition window is fine
      firstSeen.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users",
          sum(col("new_users")).over(Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("day"))
    },
    Some("""
      WITH f AS (
        SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day
        FROM events GROUP BY 1),
      d AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1)
      SELECT day, new_users,
             CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM d ORDER BY day"""))

  /** q103 — time-weighted average (TWAP-style): each event's value
    * holds until the user's next event; the per-user mean weights each
    * value by its holding duration. Exact DECIMAL×DECIMAL products
    * (value cents × ms) summed exactly; the only double is the final
    * division of two exact sums. One shuffle (user_id) serves both the
    * lead() window and the aggregation. */
  private val q103 = QueryDef(
    "q103_twap",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      eventsTable(s, dir)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          dec2(col("value")).as("v"))
        .withColumn("next_ms", lead(col("ts_ms"), 1).over(w))
        .where(col("next_ms").isNotNull)
        .withColumn("dur", (col("next_ms") - col("ts_ms")).cast(DecimalType(18, 0)))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dur")).cast(LongType).as("held_ms"),
          sum(col("v") * col("dur")).as("wsum"))
        .withColumn("twap", col("wsum").cast(DoubleType) / col("held_ms").cast(DoubleType))
        .drop("wsum")
        .orderBy(col("user_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events),
      iv AS (
        SELECT user_id, v,
               CAST(LEAD(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) - ts_ms
                    AS DECIMAL(18,0)) AS dur
        FROM e)
      SELECT user_id, COUNT(*) AS n_intervals,
             CAST(SUM(dur) AS BIGINT) AS held_ms,
             CAST(SUM(v * dur) AS DOUBLE) / CAST(CAST(SUM(dur) AS BIGINT) AS DOUBLE) AS twap
      FROM iv WHERE dur IS NOT NULL GROUP BY 1 ORDER BY user_id"""))

  /** q104 — Markov transition matrix over the event stream: per-user
    * consecutive event-type pairs (lag over (ts, event_id) total
    * order), global transition counts and a 10⁶-scaled transition
    * probability via integer division. The per-row lag and the
    * count both ride the same user_id shuffle. */
  private val q104 = QueryDef(
    "q104_markov_transitions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      val pairs = eventsTable(s, dir)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("event_type"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      val wf = Window.partitionBy(col("from_type"))
      pairs
        .withColumn("from_total", sum(col("n_trans")).over(wf))
        .withColumn("prob_ppm", expr("(1000000L * n_trans) div from_total"))
        .drop("from_total")
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, event_type
        FROM events),
      p AS (
        SELECT user_id, event_type AS to_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS from_type
        FROM e),
      c AS (
        SELECT from_type, to_type, COUNT(*) AS n_trans
        FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n_trans,
             CAST((1000000 * n_trans) // (SUM(n_trans) OVER (PARTITION BY from_type)) AS BIGINT) AS prob_ppm
      FROM c ORDER BY from_type, to_type"""))

  /** q105 — fuzzy string matching (blocked Levenshtein join): probe
    * strings (misspelled catalog words) against the distinct token
    * vocabulary of part names. Blocking — same first letter AND
    * length within ±1 — bounds candidate pairs before the edit-
    * distance kernel, the same block-then-verify shape as the dedup
    * tier; both engines' `levenshtein` is the unit-cost edit
    * distance, so the join is exactly reproducible. The vocabulary
    * side is distinct-aggregated (tiny) and the probe side is a
    * literal broadcast relation. */
  private val fuzzyProbes =
    Seq("wigdet", "bolte", "geer", "plat", "rng", "lrge", "blu", "anvill")

  private val q105 = QueryDef(
    "q105_fuzzy_match",
    (s, dir) => {
      val vocab = table(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("token"))
        .where(col("token") =!= "").distinct()
      val probes = s.createDataFrame(fuzzyProbes.map(Tuple1(_)))
        .toDF("probe")
      vocab.crossJoin(broadcast(probes))
        .where(substring(col("token"), 1, 1) === substring(col("probe"), 1, 1) &&
          abs(length(col("token")) - length(col("probe"))) <= 1)
        .withColumn("dist", levenshtein(col("probe"), col("token")).cast(LongType))
        .where(col("dist") <= 2)
        .select(col("probe"), col("token"), col("dist"))
        .orderBy(col("probe"), col("token"))
    },
    Some(s"""
      WITH vocab AS (
        SELECT DISTINCT token FROM (
          SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
        WHERE token <> ''),
      probes AS (SELECT unnest([${fuzzyProbes.map("'" + _ + "'").mkString(",")}]) AS probe)
      SELECT probe, token, CAST(levenshtein(probe, token) AS BIGINT) AS dist
      FROM vocab CROSS JOIN probes
      WHERE substr(token, 1, 1) = substr(probe, 1, 1)
        AND abs(len(token) - len(probe)) <= 1
        AND levenshtein(probe, token) <= 2
      ORDER BY probe, token"""))

  /** q106 — RFM segmentation (recency / frequency / monetary
    * quintiles per customer), the classic serving-mart scoring query.
    * Metrics aggregate exactly (dates, counts, DECIMAL money); the
    * quintiles are NTILE(5) over total orders (metric, custkey) so
    * ties break deterministically.
    *
    * Scale shape: the oracle's three `NTILE(5) OVER (ORDER BY …)`
    * windows would each serialize the whole per-customer frame (which
    * grows with the corpus) through ONE task. Instead each quintile
    * comes from a range-partitioned global rank
    * ([[graft.operators.Ids.addContiguousIds]] — the q186 discipline)
    * plus [[graft.operators.Ids.ntileFromRank]] arithmetic against
    * the broadcast row count: bit-identical NTILE semantics (the
    * oracle stays in window form and hash-matches), three parallel
    * range sorts, no single-partition frame anywhere.
    * [[graft.ServingSpec]] pins the quintile balance invariant;
    * the absence of Window/SinglePartition operators in the executed
    * plan is asserted by [[graft.ScaleSpec]]'s "q106/q156/q153"
    * plan test. */
  private val q106 = QueryDef(
    "q106_rfm_segments",
    (s, dir) => {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      // one RFM aggregate, checkpointed: the three rank branches and
      // the count read cached blocks instead of re-aggregating orders
      val m = graft.operators.Checkpoints.truncate(table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(unix_millis(col("o_orderdate").cast("timestamp"))).as("last_ms"),
          count(lit(1)).as("frequency"),
          sum(dec2(col("o_totalprice"))).as("m_dec")))
      val Ids = graft.operators.Ids
      // the three quintile ranks are data-independent (each a total
      // order over the same cached frame) — materialize them
      // CONCURRENTLY (guide §2.6, overlap independent jobs) instead of
      // chaining three sequential range-sort materializations; each
      // branch keeps (custkey, rank) so the join-back moves two longs
      // per row. Ranks are identical to the chained form: the sort
      // keys never included the previously-attached rank columns.
      def rankOf(ord: Seq[org.apache.spark.sql.Column], name: String) =
        Future(Ids.addContiguousIds(m, ord, name)
          .select(col("o_custkey"), col(name)))
      val Seq(rr, ff, mmr) = Await.result(Future.sequence(Seq(
        rankOf(Seq(col("last_ms").desc, col("o_custkey")), "r_rk"),
        rankOf(Seq(col("frequency").desc, col("o_custkey")), "f_rk"),
        rankOf(Seq(col("m_dec").desc, col("o_custkey")), "m_rk"))),
        Duration.Inf)
      val ranked = m.join(rr, "o_custkey").join(ff, "o_custkey")
        .join(mmr, "o_custkey")
      val n = broadcast(m.groupBy().agg(count(lit(1)).as("n_rows")))
      ranked.crossJoin(n)
        .withColumn("r_q", Ids.ntileFromRank(col("r_rk"), col("n_rows"), 5))
        .withColumn("f_q", Ids.ntileFromRank(col("f_rk"), col("n_rows"), 5))
        .withColumn("m_q", Ids.ntileFromRank(col("m_rk"), col("n_rows"), 5))
        .select(col("o_custkey"), col("last_ms"), col("frequency"),
          col("m_dec").cast(DoubleType).as("monetary"),
          col("r_q"), col("f_q"), col("m_q"),
          concat(col("r_q"), col("f_q"), col("m_q")).as("segment"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH m AS (
        SELECT o_custkey, MAX(epoch_ms(o_orderdate)) AS last_ms,
               COUNT(*) AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m_dec
        FROM orders GROUP BY 1),
      q AS (
        SELECT o_custkey, last_ms, frequency, CAST(m_dec AS DOUBLE) AS monetary,
               CAST(NTILE(5) OVER (ORDER BY last_ms DESC, o_custkey) AS BIGINT) AS r_q,
               CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_q,
               CAST(NTILE(5) OVER (ORDER BY m_dec DESC, o_custkey) AS BIGINT) AS m_q
        FROM m)
      SELECT o_custkey, last_ms, frequency, monetary, r_q, f_q, m_q,
             CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR) AS segment
      FROM q ORDER BY o_custkey"""))

  /** q107 — per-partition migration checksums: q89's order-
    * independent 60-bit XOR row hash, bucketed by ship-date day. A
    * whole-table checksum says "something diverged"; the per-day
    * fold says WHERE — the migration-validation query that lets a
    * cutover re-copy one partition instead of the table. XOR is
    * commutative so the fold is partitioning- and retry-proof. */
  private val q107 = QueryDef(
    "q107_partition_checksums",
    (s, dir) => {
      val h = conv(substring(md5(concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"),
        dec2(col("l_quantity")),
        dec2(col("l_extendedprice")),
        dec2(col("l_discount")),
        col("l_returnflag"), col("l_linestatus"),
        unix_millis(col("l_shipdate").cast("timestamp")))), 1, 15), 16, 10)
        .cast(LongType)
      // NOT spread (round-14 A/B): the wall floor here is the parquet
      // decode of 10 columns, which stays serial on the single-split
      // fixture either way — the spread moved the md5 off the scan
      // stage for ZERO wall change (1.89 s → 1.90 s) while inflating
      // executor CPU ~8× (shuffle-row concat_ws+md5 is far slower than
      // the scan-fused vectorized path). At real tiers the scan has
      // ≥ cores splits and the question disappears.
      table(s, dir, "lineitem")
        .select(to_date(col("l_shipdate")).as("ship_day"), h.as("h"))
        .groupBy(col("ship_day"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
        .orderBy(col("ship_day"))
    },
    Some("""
      WITH h AS (
        SELECT CAST(l_shipdate AS DATE) AS ship_day,
               CAST('0x' || substr(md5(
                 l_orderkey || '|' || l_partkey || '|' || l_suppkey || '|' ||
                 l_linenumber || '|' ||
                 CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                 CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                 l_returnflag || '|' || l_linestatus || '|' ||
                 epoch_ms(l_shipdate)), 1, 15) AS BIGINT) AS v
        FROM lineitem)
      SELECT ship_day, COUNT(*) AS n_rows, bit_xor(v) AS checksum
      FROM h GROUP BY 1 ORDER BY ship_day"""))

  /** q108 — nearest-centroid classification (Rocchio): per-label
    * centroids from exact DECIMAL per-dimension sums (cosine is
    * scale-invariant, so the sum IS the centroid — no division, no
    * rounding divergence), then every vector assigned to its argmax-
    * cosine label via the broadcast assignment kernel
    * ([[graft.operators.Clustering.assignCells]] carrying the true
    * label), emitted as a confusion matrix. The label centroids are
    * k×d (tiny, broadcast); the corpus shuffles once. */
  private val q108 = QueryDef(
    "q108_centroid_classify",
    (s, dir) => {
      val e = table(s, dir, "embeddings")
      val cents = e
        .select(col("label").cast(LongType).as("c_id"),
          posexplode(col("embedding")).as(Seq("pos0", "x")))
        .select(col("c_id"), col("pos0"),
          col("x").cast(DoubleType).cast(DecimalType(20, 7)).as("xd"))
        .groupBy(col("c_id"), col("pos0"))
        .agg(sum(col("xd")).cast(DoubleType).as("sv"))
        .groupBy(col("c_id"))
        .agg(array_sort(collect_list(struct(col("pos0"), col("sv")))).as("ps"))
        .select(col("c_id"), transform(col("ps"), p => p.getField("sv")).as("c_v"))
      Clustering.assignCells(
        e.withColumn("true_label", col("label").cast(LongType)), cents,
        carry = Seq("true_label"))
        .groupBy(col("true_label"), col("cell").as("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("true_label"), col("pred_label"))
    },
    Some(s"""
      WITH ex AS (
        SELECT CAST(label AS BIGINT) AS c_id,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
               CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(20,7)) AS xd
        FROM embeddings),
      sums AS (
        SELECT c_id, pos, CAST(SUM(xd) AS DOUBLE) AS sv
        FROM ex GROUP BY 1, 2),
      cents AS (
        SELECT c_id, array_agg(sv ORDER BY pos) AS v FROM sums GROUP BY 1),
      corpus AS (
        SELECT vec_id AS n_id, CAST(label AS BIGINT) AS true_label,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
      scored AS (
        SELECT a.n_id, a.true_label, b.c_id, $cosSql AS cos
        FROM corpus a CROSS JOIN cents b),
      best AS (
        SELECT n_id, true_label, c_id AS pred_label,
               ROW_NUMBER() OVER (PARTITION BY n_id ORDER BY cos DESC, c_id) AS rn
        FROM scored)
      SELECT true_label, pred_label, COUNT(*) AS n
      FROM best WHERE rn = 1 GROUP BY 1, 2 ORDER BY true_label, pred_label"""))

  /** q109 — log₂-bucketed inter-event gap histogram: per-user event
    * gaps land in power-of-two latency buckets, the classic latency-
    * distribution report. The bucket is the BINARY DIGIT COUNT of the
    * gap (`length(bin(gap))` = ⌊log₂⌋+1) — pure integer arithmetic,
    * immune to the float `log2` boundary rounding that differs
    * between engines. Gap computation rides one user_id shuffle; the
    * histogram is a ~40-row aggregate. */
  private val q109 = QueryDef(
    "q109_gap_histogram",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      eventsTable(s, dir)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
        .withColumn("gap_ms", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
        .where(col("gap_ms").isNotNull && col("gap_ms") > 0)
        .withColumn("bucket", length(bin(col("gap_ms"))).cast(LongType))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_ms")).as("min_gap_ms"), max(col("gap_ms")).as("max_gap_ms"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
        FROM events),
      g AS (
        SELECT ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id
                                        ORDER BY ts_ms, event_id) AS gap_ms
        FROM e)
      SELECT CAST(len(bin(gap_ms)) AS BIGINT) AS bucket, COUNT(*) AS n_gaps,
             MIN(gap_ms) AS min_gap_ms, MAX(gap_ms) AS max_gap_ms
      FROM g WHERE gap_ms IS NOT NULL AND gap_ms > 0
      GROUP BY 1 ORDER BY bucket"""))

  /** q110 — peak concurrency via sweep line: each event opens a
    * 10-minute half-open presence interval [ts, ts+10m); interval
    * boundaries become +1/−1 deltas, a running sum per event_type
    * over (t, delta) order is the live concurrency, and the per-day
    * max is the peak. Ends sort before starts at the same instant
    * (delta −1 < +1), giving exact half-open semantics; tied same-
    * sign boundaries yield the same prefix-value multiset under any
    * tie order, so the MAX is deterministic. The sweep partitions by
    * event_type; at higher key cardinality the same plan range-
    * partitions time with a carry-in correction per split. */
  private val q110 = QueryDef(
    "q110_peak_concurrency",
    (s, dir) => {
      val e = eventsTable(s, dir)
        .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      val bounds = e.select(col("event_type"), col("ts_ms").as("t"), lit(1L).as("delta"))
        .unionAll(e.select(col("event_type"), (col("ts_ms") + 600000L).as("t"),
          lit(-1L).as("delta")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds
        .withColumn("live", sum(col("delta")).over(w))
        .withColumn("day", to_date(timestamp_millis(col("t"))))
        .groupBy(col("event_type"), col("day"))
        .agg(max(col("live")).as("peak"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events),
      b AS (
        SELECT event_type, ts_ms AS t, 1 AS delta FROM e
        UNION ALL
        SELECT event_type, ts_ms + 600000, -1 FROM e),
      r AS (
        SELECT event_type,
               CAST(epoch_ms(t) AS DATE) AS day,
               SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS live
        FROM b)
      SELECT event_type, day, CAST(MAX(live) AS BIGINT) AS peak
      FROM r GROUP BY 1, 2 ORDER BY event_type, day"""))

  /** q111 — Benford first-digit audit: the distribution of leading
    * significant digits of order totals, the classic anomaly /
    * fabrication screen a migration validator runs over money
    * columns. The digit comes from the DECIMAL's decimal-string
    * rendering (values ≥ 1 here) — no float log₁₀; shares are
    * 10⁶-scaled integer divisions. */
  private val q111 = QueryDef(
    "q111_benford_digits",
    (s, dir) => {
      val d = table(s, dir, "orders")
        .select(substring(dec2(col("o_totalprice"))
          .cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      d.crossJoin(broadcast(d.agg(sum(col("n")).as("total"))))
        .withColumn("share_ppm", expr("(1000000L * n) div total"))
        .select(col("digit"), col("n"), col("share_ppm"))
        .orderBy(col("digit"))
    },
    Some("""
      WITH d AS (
        SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS digit,
               COUNT(*) AS n
        FROM orders GROUP BY 1)
      SELECT digit, n, CAST((1000000 * n) // (SELECT SUM(n) FROM d) AS BIGINT) AS share_ppm
      FROM d ORDER BY digit"""))

  /** q112 — sequential-pattern reach ("A then B", any distance): how
    * many users ever did type A strictly before type B. The naive
    * form self-joins events (O(events²) per user); the scalable
    * reformulation aggregates to per-(user, type) [first, last]
    * INTERVALS first — "A then B exists" ⟺ first(A) < last(B) — so
    * the self-join is |types|² per user (≤ 25 rows here), bounded by
    * type cardinality no matter how many events a user has. */
  private val q112 = QueryDef(
    "q112_seq_pair_reach",
    (s, dir) => {
      val span = eventsTable(s, dir)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts_ms")).as("first_ms"), max(col("ts_ms")).as("last_ms"))
      span.as("a")
        .join(span.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.first_ms") < col("b.last_ms"))
        .groupBy(col("a.event_type").as("from_type"),
          col("b.event_type").as("to_type"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH s AS (
        SELECT user_id, event_type,
               MIN(epoch_ms(CAST(ts AS TIMESTAMP))) AS first_ms,
               MAX(epoch_ms(CAST(ts AS TIMESTAMP))) AS last_ms
        FROM events GROUP BY 1, 2)
      SELECT a.event_type AS from_type, b.event_type AS to_type,
             COUNT(*) AS n_users
      FROM s a JOIN s b ON a.user_id = b.user_id AND a.first_ms < b.last_ms
      GROUP BY 1, 2 ORDER BY from_type, to_type"""))

  /** q113 — cross-source quantile calibration (quantile
    * normalization): map each source's n_chars distribution onto the
    * GLOBAL distribution so scores are comparable across sources —
    * the rank-based calibration a curation pipeline applies before
    * mixing heterogeneous quality signals. Per-source ranks are a
    * keyed window; the global rank comes from
    * [[graft.operators.Ids.addContiguousIds]] (range-partitioned
    * zipWithIndex — NO single-partition window), and the mapped
    * position 1 + ⌊(r−1)(N−1)/(Nₛ−1)⌋ is pure integer arithmetic, so
    * the calibrated value is exact on any engine. */
  private val q113 = QueryDef(
    "q113_quantile_calibrate",
    (s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val ns = d.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      val wSrc = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
      val ranked = d.withColumn("r", row_number().over(wSrc).cast(LongType))
        .join(broadcast(ns), "source").where(col("ns") > 1)
        .crossJoin(broadcast(d.agg(count(lit(1)).as("ng"))))
        .withColumn("p", expr("1L + ((r - 1L) * (ng - 1L)) div (ns - 1L)"))
      val g = graft.operators.Ids.addContiguousIds(
        d.select(col("n_chars").as("g_chars"), col("doc_id").as("g_doc")),
        Seq(col("g_chars"), col("g_doc")), "p")
        .select(col("p"), col("g_chars"))
      ranked.join(g, "p")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("g_chars").as("calibrated"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      ns AS (SELECT source, COUNT(*) AS ns FROM d GROUP BY 1),
      r AS (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY n_chars, doc_id) AS BIGINT) AS r
        FROM d),
      g AS (
        SELECT n_chars AS g_chars,
               CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS p
        FROM d),
      ng AS (SELECT COUNT(*) AS ng FROM d)
      SELECT r.doc_id, r.source, r.n_chars, g.g_chars AS calibrated
      FROM r JOIN ns USING (source) CROSS JOIN ng
      JOIN g ON g.p = 1 + ((r.r - 1) * (ng.ng - 1)) // (ns.ns - 1)
      WHERE ns.ns > 1
      ORDER BY doc_id"""))

  val all: Seq[QueryDef] =
    Seq(q101, q102, q103, q104, q105, q106, q107, q108, q109, q110, q111,
      q112, q113)
}

