package graft

import org.apache.spark.sql.functions._

/** Behavior + scale-shape assertions for the serving tier
  * (q101–q108): oracle hash-parity is the driver's job; here we pin
  * semantic properties (BM25 monotonicity, TWAP on a hand-computed
  * timeline, transition rows summing to ~1, classifier diagonal
  * dominance) and the plan shapes that survive 100 TB (broadcast
  * stats/probe sides, checksum partitioning-independence). */
class ServingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q101 BM25: scores positive, ranked desc, df/corpus sides broadcast") {
    val q = SparkEntry.queries("q101_bm25_topk")(spark, sf)
    val plan = finalPlan(q)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(800))
    val rows = q.as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 > 0))
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "top-k must be ranked by score desc")
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 3), "matched-term count in [1,3]")
  }

  test("q101 BM25 saturates: more hits never scores lower, all else equal") {
    // single-term corpus with equal doc lengths: tf 1 vs 3 vs 5 — the
    // saturating tf part must be strictly increasing and bounded
    val docs = Seq(
      (1L, "spark x x x x"), (2L, "spark spark spark x x"),
      (3L, "spark spark spark spark spark")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("tmp_bm25")
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val stats = docs.select(col("doc_id"), size(t).cast("long").as("dl"), t.as("tk"))
      .withColumn("tf", size(filter(col("tk"), x => x === "spark")))
    val byDoc = stats.crossJoin(
        stats.agg(count(lit(1)).as("n"), sum(col("dl")).as("tt")))
      .withColumn("si",
        expr("(1000000L * 44L * tf * tt) div (20L * tt * tf + 6L * tt + 18L * n * dl)"))
      .select(col("doc_id"), col("si")).as[(Long, Long)].collect().toMap
    assert(byDoc(1L) < byDoc(2L) && byDoc(2L) < byDoc(3L))
    assert(byDoc(3L) <= 2200000L, "tf part is bounded by (k1+1) = 11/5 scaled")
  }

  test("q103 TWAP matches a hand-computed holding timeline") {
    // user 1: value 10.00 held 2000ms, then 20.00 held 1000ms
    //   twap = (10*2000 + 20*1000) / 3000 = 40000/3000 = 13.333…
    val e = Seq(
      (1L, 1L, 0L, 10.0), (2L, 1L, 2000L, 20.0), (3L, 1L, 3000L, 30.0)
    ).toDF("event_id", "user_id", "ts_ms", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val iv = e.select(col("user_id"), col("event_id"), col("ts_ms"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("next_ms", lead(col("ts_ms"), 1).over(w))
      .where(col("next_ms").isNotNull)
      .withColumn("dur", (col("next_ms") - col("ts_ms")).cast("decimal(18,0)"))
      .groupBy(col("user_id"))
      .agg(sum(col("dur")).cast("long").as("held_ms"),
        sum(col("v") * col("dur")).as("wsum"))
      .withColumn("twap", col("wsum").cast("double") / col("held_ms").cast("double"))
      .select(col("held_ms"), col("twap")).as[(Long, Double)].head()
    assert(iv._1 == 3000L)
    assert(math.abs(iv._2 - 40000.0 / 3000.0) < 1e-12)
  }

  test("q104 transition probabilities per from_type sum to ≤ 1e6 (floor) and > 1e6 - fanout") {
    val q = SparkEntry.queries("q104_markov_transitions")(spark, sf)
    val sums = q.groupBy($"from_type")
      .agg(sum($"prob_ppm").as("s"), count(lit(1)).as("k"))
      .as[(String, Long, Long)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (ft, s, k) =>
      assert(s <= 1000000L, s"$ft: floored shares cannot exceed 1e6")
      assert(s > 1000000L - k, s"$ft: floor loses < 1 ppm per row")
    }
  }

  test("q105 fuzzy match finds the planted misspellings via blocking") {
    val got = SparkEntry.queries("q105_fuzzy_match")(spark, sf)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> r._2).toSet
    val expected = Set("wigdet" -> "widget", "bolte" -> "bolt", "geer" -> "gear",
      "plat" -> "plate", "rng" -> "ring", "lrge" -> "large", "blu" -> "blue",
      "anvill" -> "anvil")
    assert(expected.subsetOf(got), s"missing: ${expected -- got}")
    // blocking is sound here: every match shares first letter, |len diff| ≤ 1
    got.foreach { case (p, t) =>
      assert(p.head == t.head && math.abs(p.length - t.length) <= 1)
    }
  }

  test("q106 RFM: every quintile holds n/5 ± 1 customers; segment echoes scores") {
    val q = SparkEntry.queries("q106_rfm_segments")(spark, sf).cache()
    val n = q.count()
    for (c <- Seq("r_q", "f_q", "m_q")) {
      val sizes = q.groupBy(col(c)).count().as[(Long, Long)].collect().toMap
      assert(sizes.keySet == (1L to 5L).toSet, s"$c must cover 1..5")
      assert(sizes.values.forall(v => math.abs(v - n / 5.0) <= 1), s"$c sizes: $sizes")
    }
    val bad = q.where(col("segment") =!=
      concat(col("r_q"), col("f_q"), col("m_q"))).count()
    assert(bad == 0)
    q.unpersist()
  }

  test("q107 per-day checksums are partitioning-independent and roll up to the table") {
    val q = SparkEntry.queries("q107_partition_checksums")(spark, sf)
      .as[(java.sql.Date, Long, Long)].collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .repartition(17, $"l_returnflag")   // deliberately scrambled layout
    val h = li.select(
      to_date($"l_shipdate").as("ship_day"),
      conv(substring(md5(concat_ws("|",
        $"l_orderkey", $"l_partkey", $"l_suppkey", $"l_linenumber",
        $"l_quantity".cast("decimal(18,2)"),
        $"l_extendedprice".cast("decimal(18,2)"),
        $"l_discount".cast("decimal(18,2)"),
        $"l_returnflag", $"l_linestatus",
        unix_millis($"l_shipdate".cast("timestamp")))), 1, 15), 16, 10)
        .cast("long").as("h"))
      .groupBy($"ship_day")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("cs"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(q.nonEmpty && q.forall { case (d, n, cs) => h(d) == ((n, cs)) })
    assert(q.map(_._2).sum == li.count(), "day partition counts roll up")
  }

  test("q109 buckets bound their gaps by consecutive powers of two") {
    val rows = SparkEntry.queries("q109_gap_histogram")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, n, lo, hi) =>
      assert(n > 0)
      assert(lo >= (1L << (bucket - 1)) && hi < (1L << bucket),
        s"bucket $bucket must hold gaps in [2^${bucket - 1}, 2^$bucket): [$lo, $hi]")
    }
  }

  test("q110 sweep line counts overlapping intervals exactly (hand case)") {
    // three intervals of 10 min starting 0, 5m, 9m: all three live at 9m;
    // a fourth at 30m never overlaps → its own peak segment of 1
    val e = Seq(0L, 300000L, 540000L, 1800000L).zipWithIndex
      .map { case (t, i) => (i.toLong, "x", t) }
      .toDF("event_id", "event_type", "ts_ms")
    val b = e.select(col("event_type"), col("ts_ms").as("t"), lit(1L).as("delta"))
      .unionAll(e.select(col("event_type"), (col("ts_ms") + 600000L).as("t"),
        lit(-1L).as("delta")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("t"), col("delta"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val peak = b.withColumn("live", sum(col("delta")).over(w))
      .agg(max(col("live"))).as[Long].head()
    assert(peak == 3L)
    // half-open semantics: an interval ending exactly when another starts
    // does NOT overlap it — ends (-1) sort before starts (+1)
    val e2 = Seq((1L, "y", 0L), (2L, "y", 600000L)).toDF("event_id", "event_type", "ts_ms")
    val b2 = e2.select(col("event_type"), col("ts_ms").as("t"), lit(1L).as("delta"))
      .unionAll(e2.select(col("event_type"), (col("ts_ms") + 600000L).as("t"),
        lit(-1L).as("delta")))
    val peak2 = b2.withColumn("live", sum(col("delta")).over(w))
      .agg(max(col("live"))).as[Long].head()
    assert(peak2 == 1L)
  }

  test("q111 Benford audit covers all orders; shares floor-sum to ≤ 1e6") {
    val rows = SparkEntry.queries("q111_benford_digits")(spark, sf)
      .as[(String, Long, Long)].collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_._2).sum == total, "every order has exactly one leading digit")
    assert(rows.forall(r => r._1.length == 1 && r._1.head.isDigit && r._1 != "0"))
    val s = rows.map(_._3).sum
    assert(s <= 1000000L && s > 1000000L - rows.length)
  }

  test("q112 interval reformulation equals the naive event self-join") {
    val e = graft.queries.QueryDef.eventsTable(spark, sf)
      .select($"user_id", $"event_type", $"ts".cast("long").as("t"), $"event_id")
    // ground truth, O(events²) per user — viable only at test scale
    val naive = e.as("a").join(e.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.t" < $"b.t")
      .select($"a.user_id", $"a.event_type".as("ft"), $"b.event_type".as("tt"))
      .distinct()
      .groupBy($"ft", $"tt").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = SparkEntry.queries("q112_seq_pair_reach")(spark, sf)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == naive, s"diff: ${(got.toSet diff naive.toSet) ++ (naive.toSet diff got.toSet)}")
  }

  test("q113 calibration preserves rank order and pins the extremes per source") {
    val rows = SparkEntry.queries("q113_quantile_calibrate")(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    val global = rows.map(_._3).sorted
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val byRank = docs.sortBy(d => (d._3, d._1)) // (n_chars, doc_id) source order
      // monotone: calibrated never decreases along the source ranking
      assert(byRank.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"$src: calibration must be monotone in rank")
      // endpoints map to the global min / max exactly
      assert(byRank.head._4 == global.head && byRank.last._4 == global.last,
        s"$src: extremes must pin to the global extremes")
      // every calibrated value is an actually-occurring global value
      val gset = global.toSet
      assert(byRank.forall(d => gset.contains(d._4)))
    }
  }

  test("q108 classifier: exact row cover, diagonal dominance, centroids broadcast") {
    val q = SparkEntry.queries("q108_centroid_classify")(spark, sf)
    val plan = finalPlan(q)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    val rows = q.as[(Long, Long, Long)].collect()
    val total = rows.map(_._3).sum
    assert(total == spark.read.parquet(s"$sf/embeddings.parquet").count(),
      "every vector classified exactly once")
    // nearest-own-label-centroid should beat chance by a wide margin
    val correct = rows.filter(r => r._1 == r._2).map(_._3).sum
    assert(correct.toDouble / total > 0.2, s"accuracy $correct/$total vs 0.1 chance")
  }
}
