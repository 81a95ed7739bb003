package graft

import graft.operators.{Reconcile, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-3 curation operators: snapshot diff, PII scrub, boilerplate
  * removal, TF-IDF. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val before = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "seg", "bal")
    val after = Seq(
      (1L, "a", 10.0),          // unchanged
      (2L, "B2", 20.0),         // seg changed
      (3L, "c", 33.0),          // bal changed
      (5L, "e", 50.0))          // added; 4 removed
      .toDF("k", "seg", "bal")
    val out = Reconcile.snapshotDiff(before, after, Seq("k"), Seq("seg", "bal"))
      .select("k", "status", "changed_cols").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "unchanged", ""),
      (2L, "changed", "seg"),
      (3L, "changed", "bal"),
      (4L, "removed", ""),
      (5L, "added", "")))
  }

  test("snapshotDiff is null-safe on compared columns") {
    val before = Seq((1L, Option("x")), (2L, Option.empty[String]))
      .toDF("k", "seg")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "seg")
    val out = Reconcile.snapshotDiff(before, after, Seq("k"), Seq("seg"))
      .select("k", "status").as[(Long, String)].collect().sortBy(_._1)
    // null -> null is unchanged; x -> null is changed (not dropped)
    assert(out.toSeq == Seq((1L, "changed"), (2L, "unchanged")))
  }

  test("scrubPii redacts and counts every class, leaves clean text alone") {
    val docs = Seq(
      (1L, "mail me at bob.smith@corp.io and see https://a.b/c now"),
      (2L, "call 555-0134 or 555-9999 twice"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(docs)
      .select("doc_id", "n_emails", "n_urls", "n_phones", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 1L, 1L, 0L, "mail me at <EMAIL> and see <URL> now")))
    assert(out(1) == ((2L, 0L, 0L, 2L, "call <PHONE> or <PHONE> twice")))
    assert(out(2) == ((3L, 0L, 0L, 0L, "nothing sensitive here")))
  }

  test("stripBoilerplate drops frequent lines, keeps order, keeps empty docs") {
    val docs = (1L to 10L).map { i =>
      (i, s"shared header\nbody line $i\nshared footer")
    }.toDF("doc_id", "text")
      // one doc that is ALL boilerplate
      .unionByName(Seq((11L, "shared header\nshared footer")).toDF("doc_id", "text"))
    val out = TextAnalysis.stripBoilerplate(docs, minDocFreq = 5)
      .select("doc_id", "clean_text", "n_lines_kept", "n_lines_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 11)
    assert(out(0) == ((1L, "body line 1", 1L, 2L)))
    // all-boilerplate doc survives with empty text, not a missing row
    assert(out(10) == ((11L, "", 0L, 2L)))
  }

  test("stripBoilerplate preserves multi-line kept order") {
    val docs = Seq(
      (1L, "keep a\nNOISE\nkeep b\nkeep c"),
      (2L, "NOISE"), (3L, "NOISE"), (4L, "NOISE")).toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplate(docs, minDocFreq = 3)
      .filter($"doc_id" === 1L).select("clean_text").as[String].head()
    assert(out == "keep a\nkeep b\nkeep c")
  }

  test("upsert: updates win, new keys insert, untouched rows pass through") {
    import graft.operators.Upsert
    val current = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "v", "x")
    val updates = Seq((2L, "B", 9.0), (4L, "d", 4.0)).toDF("k", "v", "x")
    val out = Upsert.merge(current, updates, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 1.0), (2L, "B", 9.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    // idempotent: re-applying the same batch changes nothing
    val again = Upsert.merge(
      Upsert.merge(current, updates, Seq("k")), updates, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(again.toSeq == out.toSeq)
    // schema drift is rejected
    intercept[IllegalArgumentException] {
      Upsert.merge(current, updates.select("k", "v"), Seq("k"))
    }
  }

  test("applyCdc drops delete-terminated keys, latestByKey would resurrect them") {
    import graft.operators.Upsert
    import org.apache.spark.sql.functions.col
    val feed = Seq(
      (1L, 1L, "U", 10L), (1L, 2L, "D", 0L),   // delete-terminated → absent
      (2L, 1L, "U", 20L), (2L, 3L, "U", 22L),  // plain upsert chain
      (3L, 1L, "D", 0L), (3L, 2L, "U", 30L)    // delete then re-insert → present
    ).toDF("k", "seq", "op", "v")
    val out = Upsert.applyCdc(feed, Seq("k"), Seq(col("seq")))
      .select("k", "seq", "v", "_n_ops").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((2L, 3L, 22L, 2L), (3L, 2L, 30L, 2L)))
    // the hazard applyCdc exists to fix: latestByKey keeps key 1's tombstone row
    val naive = Upsert.latestByKey(feed, Seq("k"), Seq(col("seq")))
    assert(naive.count() == 3)
  }

  test("tfIdfTopTerms ranks corpus-frequent-but-distinctive terms") {
    val docs = Seq(
      (1L, "g1", "apple apple banana common"),
      (2L, "g1", "apple cherry common"),
      (3L, "g2", "durian durian common"),
      (4L, "g2", "elderberry common")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, k = 2)
      .select("source", "rk", "term").as[(String, Long, String)]
      .collect().sortBy(t => (t._1, t._2))
    // 'common' has df=4 -> idf=ln(1)=0 -> never ranks
    assert(out.toSeq == Seq(
      ("g1", 1L, "apple"), ("g1", 2L, "banana"),
      ("g2", 1L, "durian"), ("g2", 2L, "elderberry")))
    assert(!out.exists(_._3 == "common"))
  }

  test("dropDuplicateSpans cuts cross-doc and intra-doc duplicated spans, merges overlaps") {
    val docs = Seq(
      (1L, "a b c d e f g h"),              // shares "a b c d" with doc 2
      (2L, "x y a b c d w z"),
      (3L, "p q r s t u v"),                // untouched
      (4L, "m n o p m n o p"),              // intra-doc repeat: all dropped
      (5L, ""),                             // token-less: passes through
      (6L, null)                            // null text: same contract as ''
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dropDuplicateSpans(docs, window = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((8L, 4L, "e f g h")))
    assert(got(2L) == ((8L, 4L, "x y w z")))
    assert(got(3L) == ((7L, 0L, "p q r s t u v")))
    assert(got(4L) == ((8L, 8L, "")))
    assert(got(5L) == ((0L, 0L, "")))
    // tokens(NULL) is NULL — without the coalesce the row came back
    // (n_tokens=null, clean_text=null) where q134's oracle COALESCEs
    // both to (0, '') (round-8 ADVICE fix)
    assert(got(6L) == ((0L, 0L, "")))
  }

  test("repeatedWindowStarts: hash prefilter + string verify equals grouping " +
    "the window strings directly (all modes)") {
    // the lossless-prefilter claim, proved against the composed twin
    // on real fixture text: a hash collision may nominate a candidate
    // but the string re-count must discard it, so both forms mark the
    // exact same (doc, start) set
    import graft.functions.TextFunctions
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 400)
      .select($"doc_id".cast("long").as("_id"),
        TextFunctions.tokens($"text").as("t"))
    for ((w, s, cd) <- Seq((8, 1, false), (16, 4, true), (4, 2, false))) {
      val got = TextAnalysis.repeatedWindowStarts(docs, w, s, cd)
        .as[(Long, Int)].collect().sorted.toSeq
      val wins = docs.filter(size($"t") >= w)
        .select($"_id", posexplode(expr(
          s"transform(sequence(1, size(t) - $w + 1, $s), i -> array_join(slice(t, i, $w), ' '))"))
          .as(Seq("p0", "k")))
        .select($"_id", ($"p0" * s + 1).as("i"), $"k")
      val dupAgg =
        if (cd) wins.groupBy($"k").agg(countDistinct($"_id").as("c"))
        else wins.groupBy($"k").agg(count(lit(1)).as("c"))
      val want = wins
        .join(dupAgg.filter($"c" > 1).select($"k"), Seq("k"), "left_semi")
        .select($"_id", $"i").as[(Long, Int)].collect().sorted.toSeq
      assert(got == want, s"(w=$w, stride=$s, crossDocOnly=$cd)")
      assert(want.nonEmpty, s"fixture must exercise (w=$w, stride=$s, crossDocOnly=$cd)")
    }
  }

  test("charEntropy: uniform chars max out, repeats zero out, empty doc kept") {
    val docs = Seq(
      (1L, "abcd"),     // 4 distinct chars once each → exactly 2 bits
      (2L, "aaaa"),     // one char → 0 bits
      (3L, ""),         // empty → zero counts via left join
      (4L, "aabb")      // two chars twice each → exactly 1 bit
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((4L, 2.0)))
    assert(got(2L) === ((4L, 0.0)))
    assert(got(3L) === ((0L, 0.0)))
    assert(got(4L) === ((4L, 1.0)))
  }

  test("zipfSlope recovers the exact slope of a constructed power law") {
    // source "z": freq(rank r) = 2^(8-r) for r=1..8 → ln f = 8ln2 - r·ln2;
    // regressing on ln(rank) is NOT linear, so compare against the
    // sequential OLS with the operator's own rounding discipline.
    val words = (1 to 8).flatMap(r =>
      Seq.fill(1 << (8 - r))(s"w$r")) // distinct words, power-law freqs
    val docs = Seq(("z", words.mkString(" "))).toDF("source", "text")
    val got = TextAnalysis.zipfSlope(docs, topK = 100)
      .as[(String, Long, Double)].collect().head
    val freqs = (1 to 8).map(r => (1 << (8 - r)).toDouble)
    def r9(v: Double) = // Spark round(): BigDecimal HALF_UP
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = freqs.zipWithIndex.map { case (f, i) =>
      val x = math.log(i + 1.0); val y = math.log(f)
      (r9(x), r9(y), r9(x * y), r9(x * x))
    }
    val n = terms.size.toDouble
    val sx = terms.map(t => BigDecimal(t._1)).sum.toDouble
    val sy = terms.map(t => BigDecimal(t._2)).sum.toDouble
    val sxy = terms.map(t => BigDecimal(t._3)).sum.toDouble
    val sxx = terms.map(t => BigDecimal(t._4)).sum.toDouble
    val raw = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val want = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 === "z" && got._2 === 8L)
    assert(got._3 === want)
  }

  test("dsirWeights favors docs resembling the target distribution") {
    import spark.implicits._
    // target docs talk about "spark shuffle"; raw docs 3 (on-topic)
    // and 4 (off-topic); 5 is empty
    val docs = Seq(
      (1L, "spark shuffle spark shuffle join", true),
      (2L, "spark shuffle partition spark shuffle", true),
      (3L, "spark shuffle wide join", false),
      (4L, "grape banana orchard harvest season", false),
      (5L, "", false)
    ).toDF("doc_id", "text", "is_tgt")
    val w = TextAnalysis.dsirWeights(docs, col("is_tgt"), buckets = 64)
      .select($"doc_id", $"n_feats", $"weight")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(w.size == 5)                      // every doc keeps a row
    assert(w(5L)._2 == 0L && w(5L)._3 == 0.0) // empty doc scores zero
    assert(w(3L)._3 > w(4L)._3)              // on-topic beats off-topic
    assert(w(1L)._3 > w(4L)._3)              // target docs score high too
  }
}
