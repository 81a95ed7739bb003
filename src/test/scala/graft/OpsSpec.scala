package graft

import org.apache.spark.sql.functions._

/** Behavior + scale-shape assertions for the ops/decorrelation tier
  * (q201–q213): oracle hash-parity is the driver's job; here we pin
  * the algorithmic guarantees — winnowing's shared-run ⇒ shared-
  * fingerprint theorem and density bound, count-min's one-sided
  * error, attribution mass conservation, skyline non-dominance,
  * link-prediction parity with a brute-force reference — and the
  * plan shapes that survive 100 TB (broadcast dim/stats sides). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q201 small-lot: stats and part sides broadcast, threshold matches a float recompute") {
    val q = SparkEntry.queries("q201_small_lot_revenue")(spark, sf)
    assert(finalPlan(q).contains("BroadcastExchange"))
    val Array((nSmall, rev)) = q.as[(Long, Double)].collect()
    // brute-force float recompute of the same predicate
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val pt = spark.read.parquet(s"$sf/part.parquet")
      .filter($"p_brand" === "Brand#7").select("p_partkey")
    val j = li.join(pt, $"l_partkey" === $"p_partkey")
    val avg_ = j.groupBy($"l_partkey".as("k")).agg(avg($"l_quantity").as("m"))
    val expect = j.join(avg_, $"l_partkey" === $"k")
      .filter($"l_quantity" < $"m" * 0.2).count()
    assert(nSmall == expect && rev >= 0.0)
  }

  test("q204 winnowing: density near 2/(w+1) and a duplicated run yields a shared fingerprint") {
    // two synthetic docs sharing an exact 12-token run must share a
    // fingerprint (guarantee: any shared run of >= w+k-1 = 6 tokens)
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"unrelated prefix words here $shared and a suffix tail"),
      (2L, s"$shared completely different ending material follows now")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("winnow_tmp")
    // re-run the q204 pipeline inline on the two docs via the registry
    // shape: easiest is to check the registered query on testdata for
    // structural properties, then the theorem on the synthetic pair
    // using the same window/pack constants.
    val P = 1048576L
    val toks = docs.select($"doc_id",
      graft.functions.TextFunctions.tokens($"text").as("t"))
    val pos = toks.select($"doc_id",
        posexplode(expr("transform(sequence(1, size(t) - 2), i -> concat_ws(' ', t[i-1], t[i], t[i+1]))")))
      .select($"doc_id", ($"pos" + 1).as("i"),
        (conv(substring(md5($"col"), 1, 10), 16, 10).cast("long") * P
          + (lit(P) - 1 - ($"pos" + 1))).as("key"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"i").rowsBetween(0, 3)
    val n = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
    val sel = pos.withColumn("wmin", min($"key").over(w))
      .withColumn("np", count(lit(1)).over(n))
      .filter($"i" <= greatest($"np" - 3, lit(1)))
      .select($"doc_id", expr("wmin div 1048576L").as("fp")).distinct()
    val byDoc = sel.as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "a shared 12-token run must produce at least one shared fingerprint")
    // density: for w=4 expected ~2/(w+1)=0.4 of positions selected
    val counts = pos.groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    byDoc.foreach { case (d, fps) =>
      val density = fps.size.toDouble / counts(d)
      assert(density > 0.15 && density < 0.75, s"doc $d density $density")
    }
  }

  test("q205 count-min never underestimates and estimates equal exact for unique buckets") {
    val rows = SparkEntry.queries("q205_countmin_audit")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tok, exact, est, over) =>
      assert(est >= exact, s"$tok: count-min must never underestimate")
      assert(over == est - exact)
    }
    // ranked by exact desc
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q206 attribution conserves exactly 1e6 ppm per conversion under both models") {
    // per event_type sums are registry output; conservation must hold
    // over the total: sum(linear) == sum(position) == 1e6 * conversions
    val rows = SparkEntry.queries("q206_multitouch_attribution")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nConv = {
      // conversions counted once per (user, conv) across rows — the
      // registry groups by touch type, so recompute the distinct count
      val e = graft.queries.QueryDef.eventsTable(spark, sf)
        .select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ms".desc, $"event_id".desc)
        .rowsBetween(Long.MinValue, -1)
      e.withColumn("conv", min(when($"event_type" === "purchase",
          $"ms" * 1048576L + $"event_id")).over(w))
        .filter($"event_type".isin("click", "view") && $"conv".isNotNull &&
          expr("conv div 1048576") - $"ms" <= 7L * 86400000L)
        .select($"user_id", $"conv").distinct().count()
    }
    assert(rows.map(_._4).sum == 1000000L * nConv, "linear mass conserved")
    assert(rows.map(_._5).sum == 1000000L * nConv, "position mass conserved")
  }

  test("q211 RA parity with an in-memory brute-force on the same graph") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".as[Long], $"l_partkey".as[Long]).distinct()
      .collect()
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    byOrder.values.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        support((parts(i), parts(j))) =
          support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val edges = support.filter(_._2 >= 2).keySet
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      nbrs(a) = nbrs(a) + b; nbrs(b) = nbrs(b) + a
    }
    val deg = nbrs.view.mapValues(_.size).toMap
    val scores = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    nbrs.keys.foreach { v =>
      if (deg(v) <= 256) {
        val ns = nbrs(v).toSeq.sorted
        for (i <- ns.indices; j <- i + 1 until ns.length) {
          val p = (ns(i), ns(j))
          if (!edges.contains(p)) {
            val (s0, c0) = scores.getOrElse(p, (0L, 0L))
            scores(p) = (s0 + 1000000000L / deg(v), c0 + 1)
          }
        }
      }
    }
    val expect = scores.toSeq
      .sortBy { case ((u, w), (s, _)) => (-s, u, w) }.take(20)
      .map { case ((u, w), (s, c)) => (u, w, s, c) }
    val got = SparkEntry.queries("q211_link_prediction")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q213 skyline: no returned supplier is dominated, and every dominator is returned") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy($"l_suppkey").agg(sum($"l_quantity".cast("long")).as("volume"))
    val all = spark.read.parquet(s"$sf/supplier.parquet")
      .join(li, $"s_suppkey" === $"l_suppkey")
      .select($"s_name".as[String],
        $"volume".as[Long],
        ($"s_acctbal".cast("decimal(18,2)") * 100).cast("long").as[Long])
      .collect()
    val got = SparkEntry.queries("q213_pareto_suppliers")(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    def dominated(p: (String, Long, Long)) = all.exists(q =>
      (q._2 >= p._2 && q._3 >= p._3) && (q._2 > p._2 || q._3 > p._3))
    got.foreach(p => assert(!dominated(p), s"$p is dominated"))
    all.filterNot(dominated).foreach(p =>
      assert(got.contains(p), s"frontier point $p missing"))
  }

  test("q214 CUSUM equals the sequential max(0, s+dev) recursion") {
    val daily = graft.queries.QueryDef.eventsTable(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("x"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
    val expect = daily.map { case (et, days) =>
      val n = days.length.toLong
      val total = days.map(_._3).sum
      var s = 0L
      var best = 0L
      var bestDay = days.head._2
      days.foreach { case (_, d, x) =>
        s = math.max(0L, s + (x * n - total))
        if (s > best) { best = s; bestDay = d }
      }
      et -> (best, bestDay)
    }
    val got = SparkEntry.queries("q214_cusum_shift")(spark, sf)
      .as[(String, Long, Long, java.sql.Date, java.sql.Date)].collect()
    got.foreach { case (et, _, maxC, peak, onset) =>
      assert((maxC, peak) == expect(et), s"$et cusum/peak mismatch")
      assert(!onset.after(peak), s"$et onset must not follow the peak")
    }
    assert(got.map(_._1).toSet == expect.keySet)
  }

  test("q215 length-sorted batching never wastes more than arrival order") {
    val rows = SparkEntry.queries("q215_padding_waste")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (arr, srt) = (rows("arrival"), rows("sorted"))
    assert(arr._3 == srt._3, "real token mass is strategy-invariant")
    assert(srt._4 <= arr._4, "sorted padded mass must not exceed arrival")
    assert(srt._5 <= arr._5, "sorted waste ppm must not exceed arrival")
    assert(arr._2 == srt._2, "batch count is strategy-invariant")
  }

  test("q216 release diff card: masses partition and ppm fields bounded") {
    val Array(r) = SparkEntry.queries("q216_release_diff")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(r._1 + r._2 == total, "v1+v2 docs partition the corpus")
    Seq(r._7, r._8, r._9).foreach(p => assert(p >= 0 && p <= 1000000L))
    assert(r._5 > 0 && r._6 > 0)
  }

  test("q217 SLO alerts require BOTH windows above threshold and 6h covers 1h") {
    val rows = SparkEntry.queries("q217_slo_burn")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (_, total, errors, r1, r6) =>
      assert(r1 > 300000L && r6 > 300000L)
      assert(r1 == errors * 1000000L / total)
    }
    assert(rows.map(_._1) sameElements rows.map(_._1).sorted)
  }

  test("q218 roaring: every container priced at its cheapest encoding") {
    val rows = SparkEntry.queries("q218_roaring_census")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nc, nids, na, nb, nr, bytes, vsRaw) =>
      assert(na + nb + nr == nc, "encodings partition the containers")
      assert(bytes <= nids * 2,
        "cheapest-of-three can never beat-lose to the pure array pricing")
      assert(vsRaw == bytes * 1000000L / (nids * 8))
    }
  }

  test("q219 sorted layout never stores more than arrival layout") {
    val rows = SparkEntry.queries("q219_delta_encoding")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (arr, srt) = (rows("arrival"), rows("sorted"))
    assert(arr._3 == srt._3, "key mass is layout-invariant")
    assert(srt._5 <= arr._5, "sorted bytes must not exceed arrival bytes")
    assert(srt._4 <= arr._4, "sorted max bit width must not exceed arrival")
  }

  test("q207 stratified quotas are exact floors and ppm fields bounded") {
    val rows = SparkEntry.queries("q207_stratified_sample")(spark, sf)
      .as[(String, Long, Long, Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, quota, before, after) =>
      assert(quota == n * 200000L / 1000000L, "quota is the exact floor")
      assert(before >= 0 && before <= 1000000L)
      after.foreach(a => assert(a >= 0 && a <= 1000000L))
      assert(quota > 0 == after.isDefined)
    }
  }

  test("q208 shards partition the corpus and expectation matches source masses") {
    val rows = SparkEntry.queries("q208_shuffle_audit")(spark, sf)
      .as[(Long, Long, Option[Long], Long)].collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum == total, "shards partition the corpus")
    val masses = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy($"source").count().as[(String, Long)].collect().map(_._2)
    val expected = masses.map(n => n * n).sum * 1000000L / (total * total)
    assert(rows.map(_._4).distinct.toSeq == Seq(expected))
  }

  test("q210 compaction plan: bins never exceed files, fill bounded") {
    val rows = SparkEntry.queries("q210_compaction_plan")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nFiles, total, target, nBins, saved, fill, _) =>
      assert(nBins <= 5, "quarter-target packing plans at most 5 bins")
      assert(saved == nFiles - nBins)
      assert(target == math.max(total / 4, 1L))
      assert(nBins >= 1 && fill > 0 && fill <= 1400000L,
        s"fill ppm $fill out of the floor-division band")
    }
  }

  test("q220 dictionary wins on low-cardinality columns with exact bit widths") {
    val rows = SparkEntry.queries("q220_dictionary_audit")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("l_linenumber", "l_linestatus", "l_returnflag"))
    rows.foreach { case (_, ndv, _, plain, bits, dictB, vsPlain) =>
      val expectBits =
        if (ndv == 1) 0L
        else 64 - java.lang.Long.numberOfLeadingZeros(ndv - 1)
      assert(bits == expectBits, "index width is length(bin(ndv-1))")
      assert(dictB < plain && vsPlain < 1000000L,
        "dictionary must beat plain on these enum-like columns")
    }
  }

  test("q221 dedup mixture: per-source masses partition and survivors are distinct texts") {
    val rows = SparkEntry.queries("q221_dedup_mixture_cost")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_._2).sum == docs.count())
    assert(rows.map(_._3).sum ==
      docs.select($"text").distinct().count(),
      "survivors count one doc per distinct text")
    rows.foreach { r =>
      assert(r._3 <= r._2 && r._5 <= r._4)
      assert(r._6 >= 0 && r._6 <= 1000000L && r._7 >= 0 && r._7 <= 1000000L)
    }
  }

  test("q222 histogram product equals the true join count; uniform estimate errs") {
    val rows = SparkEntry.queries("q222_join_estimate_audit")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    val sfd = sf
    def actual(a: String, ka: String, b: String, kb: String) =
      spark.read.parquet(s"$sfd/$a.parquet")
        .join(spark.read.parquet(s"$sfd/$b.parquet"),
          col(ka) === col(kb)).count()
    val truth = Map(
      "customer-orders" -> actual("customer", "c_custkey", "orders", "o_custkey"),
      "orders-lineitem" -> actual("orders", "o_orderkey", "lineitem", "l_orderkey"),
      "part-lineitem" -> actual("part", "p_partkey", "lineitem", "l_partkey"))
    rows.foreach { case (name, _, _, _, est, exact, mult, err) =>
      assert(exact == truth(name), s"$name histogram product must be exact")
      assert(mult >= 1 && est > 0)
      assert(err == math.abs(est - exact) * 1000000L / math.max(exact, 1L))
    }
  }

  test("q223 two-level prefix scan equals the single-window running max") {
    val e = graft.queries.QueryDef.eventsTable(spark, sf)
      .select($"event_id".as[Long], unix_millis($"ts").as[Long]).collect()
      .sortBy(_._1)
    var run = Long.MinValue
    val expect = Seq(3600000L, 21600000L, 86400000L).map { d =>
      run = Long.MinValue
      var dropped = 0L
      e.foreach { case (_, ms) =>
        if (run != Long.MinValue && ms < run - d) dropped += 1
        run = math.max(run, ms)
      }
      dropped
    }
    val got = SparkEntry.queries("q223_watermark_audit")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .sortBy(r => Seq("1h", "6h", "24h").indexOf(r._1)).map(_._3).toSeq
    assert(got == expect, s"two-level scan must equal the sequential scan: $got vs $expect")
  }

  test("q212 merkle diff isolates exactly the corrupted key ranges") {
    val rows = SparkEntry.queries("q212_merkle_diff")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val corrupted = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderkey" % 9973 === 0)
      .select(($"o_orderkey".cast("long") / 1024).cast("long"))
      .as[Long].collect().toSet
    assert(rows.map(_._2).toSet == corrupted,
      "diverging leaves must be exactly the leaves holding corrupted keys")
    rows.foreach { case (parent, leaf, lo, hi, _) =>
      assert(parent == leaf / 16 && lo == leaf * 1024 && hi == lo + 1023)
    }
  }
}
