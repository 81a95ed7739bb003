package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}
import graft.functions.TextFunctions
import graft.queries.ExtensionQueries.toksSql
import graft.queries.QueryDef.{eventsTable, table}

/** Round-4 ops/decorrelation tier (q201–q205): the three classic
  * TPC-H correlated-subquery shapes the engine had not yet exercised
  * (Q17 scalar-correlated average, Q21 EXISTS/NOT-EXISTS pair, Q22
  * anti-join + scalar threshold), each re-expressed as the
  * decorrelated one-pass aggregate plan Spark actually wants; plus
  * winnowing document fingerprints (the MOSS positional near-dup
  * scheme, complementing MinHash/SimHash with auditable positions)
  * and a deterministic count-min sketch with an exact overestimate
  * audit. */
object OpsQueries {

  private val Dec = DecimalType(18, 2)

  /** q201 — small-lot revenue (TPC-H Q17 shape): revenue from
    * lineitems whose quantity is below 20% of the part's average
    * quantity, for one brand. The textbook form is a correlated
    * scalar subquery per lineitem (`WHERE l_quantity < (SELECT
    * 0.2*avg(l_quantity) ... WHERE l_partkey = outer)`); the
    * decorrelated Spark plan computes each part's (sum, count) ONCE
    * with a map-side-combined aggregate over the brand-pruned join
    * and broadcasts the tiny per-part frame back — no per-row
    * re-aggregation, no float threshold: `qty < 0.2·avg` is compared
    * as the exact integer cross-product `10·qty·n < 2·sum_qty`
    * (quantities are integral). The brand filter rides the broadcast
    * part dim, so the fact scans prune to one brand's partkeys via
    * the broadcast hash join. */
  private val q201 = QueryDef(
    "q201_small_lot_revenue",
    (s, dir) => {
      val parts = broadcast(table(s, dir, "part")
        .filter(col("p_brand") === "Brand#7")
        .select(col("p_partkey")))
      val li = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity").cast(LongType).as("qty"),
          col("l_extendedprice"))
        .join(parts, col("l_partkey") === col("p_partkey"))
      val stats = broadcast(li.groupBy(col("l_partkey").as("sk"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n")))
      li.join(stats, col("l_partkey") === col("sk"))
        .filter(col("qty") * col("n") * 10 < col("sum_qty") * 2)
        .agg(count(lit(1)).as("n_small_lots"),
          sum(col("l_extendedprice").cast(Dec)).cast(DoubleType)
            .as("revenue"))
    },
    Some("""
      WITH li AS (
        SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#7'),
      stats AS (
        SELECT l_partkey AS sk, SUM(qty) AS sum_qty, COUNT(*) AS n
        FROM li GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lots,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM li JOIN stats ON l_partkey = sk
      WHERE qty * n * 10 < sum_qty * 2"""))

  /** q202 — sole-late-supplier ranking (TPC-H Q21 shape): suppliers
    * who, in a multi-supplier order, were the ONLY one to ship late
    * (> 60 days after the order date). The textbook form is a
    * correlated EXISTS (another supplier on the order) + NOT EXISTS
    * (another LATE supplier) pair — two more passes over lineitem per
    * row. Decorrelated: collapse to one row per (order, supplier)
    * with a late flag, count suppliers and late suppliers per order
    * with two window aggregates over the SAME orderkey partition (one
    * shuffle, no join-back), filter `ns ≥ 2 AND nl = 1 AND late`, and
    * rank suppliers. Supplier names ride a broadcast dim. */
  private val q202 = QueryDef(
    "q202_sole_late_supplier",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val perSupp = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max((datediff(to_date(col("l_shipdate")),
          to_date(col("o_orderdate"))) > 60).cast(LongType)).as("late"))
      val w = Window.partitionBy(col("l_orderkey"))
      val flagged = perSupp
        .withColumn("ns", count(lit(1)).over(w))
        .withColumn("nl", sum(col("late")).over(w))
        .filter(col("late") === 1 && col("ns") >= 2 && col("nl") === 1)
      flagged.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""
      WITH ps AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CASE WHEN datediff('day', CAST(o_orderdate AS TIMESTAMP),
                                      CAST(l_shipdate AS TIMESTAMP)) > 60
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      fl AS (
        SELECT l_suppkey, late,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS ns,
               SUM(late) OVER (PARTITION BY l_orderkey) AS nl
        FROM ps)
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM fl JOIN supplier ON l_suppkey = s_suppkey
      WHERE late = 1 AND ns >= 2 AND nl = 1
      GROUP BY s_name
      ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** q203 — dormant high-balance customers (TPC-H Q22 shape): per
    * nation, customers whose balance exceeds the average POSITIVE
    * balance and who have never placed an URGENT order. The textbook
    * form is a scalar subquery threshold + correlated NOT EXISTS;
    * decorrelated: the threshold is one broadcast scalar frame, the
    * NOT EXISTS is a left-anti join on the priority-pruned orders
    * scan. The float hazard in `acctbal > avg(...)` is removed by
    * comparing the exact DECIMAL cross-product `bal·cnt > sum` —
    * no division, engine-exact on both sides. */
  private val q203 = QueryDef(
    "q203_dormant_capital",
    (s, dir) => {
      val cust = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_acctbal").cast(Dec).as("bal"))
      val thr = broadcast(cust.filter(col("bal") > 0)
        .agg(sum(col("bal")).as("sum_bal"), count(lit(1)).as("cnt")))
      val urgent = table(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val dormant = cust.crossJoin(thr)
        .filter(col("bal") * col("cnt") > col("sum_bal"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      dormant
        .join(broadcast(table(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("bal")).cast(DoubleType).as("total_bal"))
        .orderBy(col("n_name"))
    },
    Some("""
      WITH c AS (
        SELECT c_custkey, c_nationkey,
               CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        FROM customer),
      thr AS (
        SELECT SUM(bal) AS sum_bal, COUNT(*) AS cnt FROM c WHERE bal > 0)
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(bal) AS DOUBLE) AS total_bal
      FROM c CROSS JOIN thr
      JOIN nation ON c_nationkey = n_nationkey
      WHERE bal * cnt > sum_bal
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY n_name ORDER BY n_name"""))

  /** q204 — winnowing fingerprints (Schleimer et al. 2003, the MOSS
    * scheme): each document's 3-gram shingle sequence is hashed and a
    * sliding window of w = 4 consecutive positions selects its
    * minimal hash — guaranteeing any shared run of ≥ w+k-1 tokens
    * yields a shared fingerprint, at ~2/(w+1) density. Unlike
    * MinHash (q31), winnowing is POSITIONAL: matches point at the
    * actual shared span. Ties break to the rightmost position by
    * packing `hash·2²⁰ + (2²⁰−1−pos)` into one BIGINT (40-bit md5
    * hash, so no overflow; documents are pre-chunked < 2²⁰ tokens —
    * q125's chunker enforces this upstream at scale), so `min` alone
    * implements robust winnowing and both engines agree bit-for-bit.
    * Short documents (< w windows) fall back to one whole-doc window.
    * Output: top-10 document pairs by winnowed-set Jaccard (exact
    * ppm), via an inverted index on selected hashes — fingerprint
    * sets, never shingle sets, shuffle. */
  private val q204 = QueryDef(
    "q204_winnow_fingerprints",
    (s, dir) => {
      val P = lit(1048576L) // 2^20 position packing
      val toks = table(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
      val pos = toks.select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(1, size(t) - 2), " +
              "i -> concat_ws(' ', t[i-1], t[i], t[i+1]))")))
        .select(col("doc_id"), (col("pos") + 1).as("i"),
          (conv(substring(md5(col("col")), 1, 10), 16, 10).cast(LongType) * P
            + (P - 1 - (col("pos") + 1))).as("key"))
      val wWin = Window.partitionBy(col("doc_id")).orderBy(col("i"))
        .rowsBetween(Window.currentRow, 3)
      val nWin = Window.partitionBy(col("doc_id"))
      val sel = pos
        .withColumn("wmin", min(col("key")).over(wWin))
        .withColumn("np", count(lit(1)).over(nWin))
        .filter(col("i") <= greatest(col("np") - 3, lit(1)))
        .select(col("doc_id"), expr("wmin div 1048576L").as("fp"))
        .distinct()
      val sizes = sel.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
      val shared = sel.as("x").join(sel.as("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
      shared
        .join(sizes.select(col("doc_id").as("doc_a"), col("nf").as("fp_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("nf").as("fp_b")), "doc_b")
        .withColumn("jaccard_ppm",
          expr("(shared * 1000000L) div (fp_a + fp_b - shared)"))
        .orderBy(col("jaccard_ppm").desc, col("doc_a"), col("doc_b"))
        .limit(10)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, $toksSql AS t FROM documents
        WHERE len($toksSql) >= 3),
      pos AS (
        SELECT doc_id, i,
               CAST('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                                   1, 10) AS BIGINT) * 1048576
                 + (1048575 - i) AS key
        FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
      win AS (
        SELECT doc_id, i,
               MIN(key) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                 AS wmin,
               COUNT(*) OVER (PARTITION BY doc_id) AS np
        FROM pos),
      sel AS (
        SELECT DISTINCT doc_id, wmin // 1048576 AS fp
        FROM win WHERE i <= greatest(np - 3, 1)),
      sizes AS (SELECT doc_id, COUNT(*) AS nf FROM sel GROUP BY 1),
      shared AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS shared
        FROM sel x JOIN sel y ON x.fp = y.fp AND x.doc_id < y.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
             CAST(sa.nf AS BIGINT) AS fp_a, CAST(sb.nf AS BIGINT) AS fp_b,
             CAST((shared * 1000000) // (sa.nf + sb.nf - shared) AS BIGINT)
               AS jaccard_ppm
      FROM shared
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      ORDER BY jaccard_ppm DESC, doc_a, doc_b LIMIT 10"""))

  /** q205 — count-min sketch with an exact overestimate audit
    * (Cormode & Muthukrishnan 2005): token frequencies compressed
    * into a 4×256 counter array (md5-salted row hashes, so both
    * engines build the identical sketch), point estimates as the min
    * over rows. Count-min NEVER underestimates; the audit proves it
    * — the top-50 exact counts sit beside their estimates with the
    * overestimate spelled out, all integers. The sketch builds from
    * the distinct-token count table (one explode + one agg), and the
    * 1,024-cell array is a broadcast frame — the mergeable-summary
    * shape that replaces exact per-key counting when the key space
    * no longer fits (heavy-hitter q76's sketch-side sibling). */
  private val q205 = QueryDef(
    "q205_countmin_audit",
    (s, dir) => {
      val counts = table(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val rows = (0 until 4).map { r =>
        counts.select(lit(r).as("r"),
          (conv(substring(md5(concat(lit(s"$r:"), col("tok"))), 1, 8), 16, 10)
            .cast(LongType) % 256).as("bucket"), col("c"))
      }.reduce(_ unionAll _)
      val sketch = broadcast(
        rows.groupBy(col("r"), col("bucket")).agg(sum(col("c")).as("cell")))
      val top = counts
        .orderBy(col("c").desc, col("tok")).limit(50)
      val probes = (0 until 4).map { r =>
        top.select(col("tok"), col("c"), lit(r).as("r"),
          (conv(substring(md5(concat(lit(s"$r:"), col("tok"))), 1, 8), 16, 10)
            .cast(LongType) % 256).as("bucket"))
      }.reduce(_ unionAll _)
      probes.join(sketch, Seq("r", "bucket"))
        .groupBy(col("tok"), col("c"))
        .agg(min(col("cell")).as("est"))
        .select(col("tok"), col("c").as("exact"), col("est"),
          (col("est") - col("c")).as("overestimate"))
        .orderBy(col("exact").desc, col("tok"))
    },
    Some(s"""
      WITH counts AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT unnest($toksSql) AS tok FROM documents)
        GROUP BY 1),
      rows_ AS (
        SELECT r, tok, c,
               CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 8)
                 AS BIGINT) % 256 AS bucket
        FROM counts CROSS JOIN (VALUES (0), (1), (2), (3)) AS u(r)),
      sketch AS (
        SELECT r, bucket, SUM(c) AS cell FROM rows_ GROUP BY 1, 2),
      top AS (
        SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 50)
      SELECT t.tok, CAST(t.c AS BIGINT) AS exact,
             CAST(MIN(s.cell) AS BIGINT) AS est,
             CAST(MIN(s.cell) - t.c AS BIGINT) AS overestimate
      FROM top t
      JOIN rows_ r ON t.tok = r.tok
      JOIN sketch s ON r.r = s.r AND r.bucket = s.bucket
      GROUP BY t.tok, t.c
      ORDER BY exact DESC, t.tok"""))

  val all: Seq[QueryDef] = Seq(q201, q202, q203, q204, q205)
}
