package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.queries.QueryDef.{eventsTable, table}

/** Round-3 fifth widening: classic warehouse consumption shapes the
  * serving tier hadn't exercised yet — a TPC-H-Q9-style multi-way
  * star join (the Catalyst join-reorder / broadcast-selection
  * showcase), gaps-and-islands streak detection, and deterministic
  * weighted sampling (the weighted twin of q52/q85's hash sampling).
  *
  * Same bit-stability conventions as the rest of the registry
  * ([[QueryDef]]): DECIMAL money until one final double cast, scaled
  * integer ratios, BIGINT keys, fully-ordered output.
  */
object LakehouseQueries {

  private val Dec = DecimalType(18, 2)

  /** q114 — profit by nation × order-year (TPC-H Q9 shape): lineitem
    * narrowed by a broadcast filtered part dim, enriched through
    * supplier → nation broadcasts, then the ONE genuinely wide join
    * (lineitem ⋈ orders, both fact-sized) for the order year. The
    * written join order applies the selective part filter BEFORE any
    * shuffle, so at 100 TB only matching lineitems reach the
    * orders exchange; dims ship once per executor. Catalyst is free
    * to reorder — the plan shape (three BroadcastHashJoins, one
    * shuffle join) is what ScaleSpec pins. */
  private val q114 = QueryDef(
    "q114_profit_by_nation",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      val p = broadcast(table(s, dir, "part")
        .filter(col("p_type") === "PROMO").select("p_partkey"))
      val sup = broadcast(table(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey"))
      val n = broadcast(table(s, dir, "nation"))
      val o = table(s, dir, "orders").select("o_orderkey", "o_orderdate")
      li.join(p, li("l_partkey") === p("p_partkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .select(n("n_name").as("nation"),
          year(o("o_orderdate")).cast(LongType).as("o_year"),
          (li("l_extendedprice").cast(Dec) *
            (lit(1).cast(Dec) - li("l_discount").cast(Dec))).as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("amount")).cast(DoubleType).as("profit"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("nation"), col("o_year"))
    },
    Some("""
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit,
             COUNT(*) AS n_lines
      FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q115 — gaps-and-islands: per-user longest consecutive-active-day
    * streak. The classic trick — `day - row_number()` is constant
    * within a consecutive run — turns streak detection into a plain
    * GROUP BY: one shuffle on user_id serves the distinct, the
    * window, and both aggregates (Catalyst reuses the partitioning
    * through all four). No self-join, no iteration — at 100 TB this
    * is a single pass per user partition. */
  private val q115 = QueryDef(
    "q115_user_streaks",
    (s, dir) => {
      eventsTable(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .withColumn("grp", expr("date_sub(day, row_number() OVER (PARTITION BY user_id ORDER BY day))"))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(sum(col("len")).cast(LongType).as("active_days"),
          max(col("len")).as("longest_streak"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events),
      runs AS (
        SELECT user_id,
               day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        FROM days),
      lens AS (
        SELECT user_id, grp, COUNT(*) AS len FROM runs GROUP BY 1, 2)
      SELECT user_id,
             CAST(SUM(len) AS BIGINT) AS active_days,
             CAST(MAX(len) AS BIGINT) AS longest_streak
      FROM lens GROUP BY 1 ORDER BY user_id"""))

  /** q116 — deterministic weighted sampling: selection priority is
    * `md5_60bit(doc_id) div weight` (weight = document length), so a
    * doc's selection odds scale with its weight, reruns are
    * bit-stable with no RNG state, and the global top-k plans as
    * `TakeOrderedAndProject` (per-partition heap, no global sort).
    * The weighted twin of q52 (uniform hash sample) and q85
    * (per-group reservoir); at 100 TB the only cost is one scan. */
  private val q116 = QueryDef(
    "q116_weighted_sample",
    (s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast(LongType)).as("h"))
        .withColumn("priority", expr("h div greatest(n_chars, 1L)"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("priority"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(20)
    },
    Some("""
      SELECT doc_id, source, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               // greatest(n_chars, 1) AS priority
      FROM documents
      ORDER BY priority, doc_id LIMIT 20"""))

  val all: Seq[QueryDef] = Seq(q114, q115, q116)
}
