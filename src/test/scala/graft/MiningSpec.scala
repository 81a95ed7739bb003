package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Pruning, Sketches}

/** Mining-tier operators: k-means building blocks, SemDeDup,
  * sketch-narrowed heavy hitters, Bloom join pruning. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  test("assignCells picks the nearest centroid by cosine, ties to smaller id") {
    // centroids along axes; vectors near each axis
    val cents = Seq((0L, vec(1, 0, 0)), (1L, vec(0, 1, 0)))
      .toDF("c_id", "c_v")
    val corpus = Seq(
      (10L, vec(0.9, 0.1, 0)),  // → cell 0
      (11L, vec(0.1, 0.9, 0)),  // → cell 1
      (12L, vec(1, 1, 0))       // equidistant → tie → cell 0
    ).toDF("vec_id", "embedding")
    val got = Clustering.assignCells(corpus, cents)
      .select("n_id", "cell").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("centroidUpdate computes exact per-dimension means") {
    val assigned = Seq(
      (1L, vec(1, 3), 7L),
      (2L, vec(3, 5), 7L),
      (3L, vec(10, 0), 8L)
    ).toDF("n_id", "n_v", "cell")
    val got = Clustering.centroidUpdate(assigned)
      .select("cell", "pos", "n_vecs", "centroid")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((7L, 1L, 2L, 2.0), (7L, 2L, 2L, 4.0),
      (8L, 1L, 1L, 10.0), (8L, 2L, 1L, 0.0)))
  }

  test("daviesBouldin: exact scatter, worst neighbor, and DB term on a hand case") {
    val assigned = Seq(
      (1L, vec(1, 3), 7L), (2L, vec(3, 5), 7L),      // centroid (2,4), S=2
      (3L, vec(10, 0), 8L), (4L, vec(12, 0), 8L),    // centroid (11,0), S=1
      (5L, vec(2, 100), 9L), (6L, vec(2, 102), 9L)   // centroid (2,101), S=1
    ).toDF("n_id", "n_v", "cell")
    val got = Clustering.daviesBouldin(assigned)
      .select("cell", "n_vecs", "scatter", "worst_neighbor", "db_term")
      .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(7L)._2 == 2L && got(7L)._3 == 2.0)
    assert(got(8L)._3 == 1.0 && got(9L)._3 == 1.0)
    // M(7,8)=97 dominates both 7 and 8; 9's nearest trouble is 7
    assert(got(7L)._4 == 8L && math.abs(got(7L)._5 - 3.0 / 97) < 1e-9)
    assert(got(8L)._4 == 7L && math.abs(got(8L)._5 - 3.0 / 97) < 1e-9)
    assert(got(9L)._4 == 7L && math.abs(got(9L)._5 - 3.0 / 9409) < 1e-9)
  }

  test("one Lloyd step strictly reduces within-cluster scatter on separated data") {
    // two tight blobs far apart; seeds off-center inside each blob
    val rnd = new Random(7)
    def blob(cx: Double, cy: Double, n: Int, base: Long) =
      (0 until n).map(i => (base + i,
        vec(cx + rnd.nextGaussian() * 0.05, cy + rnd.nextGaussian() * 0.05)))
    val corpus = (blob(1, 0, 40, 0L) ++ blob(0, 1, 40, 1000L))
      .toDF("vec_id", "embedding")
    val seeds = Seq((0L, vec(0.9, 0.2)), (1L, vec(0.2, 0.9))).toDF("c_id", "c_v")
    val assigned = Clustering.assignCells(corpus, seeds)
    // every member of blob A lands in cell 0, blob B in cell 1
    val cells = assigned.select("n_id", "cell").as[(Long, Long)].collect()
    assert(cells.forall { case (id, cell) => (id < 1000L) == (cell == 0L) })
    val updated = Clustering.centroidUpdate(assigned)
      .select("cell", "pos", "centroid").as[(Long, Long, Double)].collect()
    // updated centroids sit at the blob means, i.e. near (1,0) and (0,1)
    val m = updated.map { case (c, p, v) => (c, p) -> v }.toMap
    assert(math.abs(m((0L, 1L)) - 1.0) < 0.05 && math.abs(m((0L, 2L))) < 0.05)
    assert(math.abs(m((1L, 1L))) < 0.05 && math.abs(m((1L, 2L)) - 1.0) < 0.05)
  }

  test("iterated kmeans recovers blob directions from poor seeds") {
    val rnd = new Random(13)
    // three tight directional blobs (cosine clustering → directions)
    val dirs = Seq((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    val corpus = dirs.zipWithIndex.flatMap { case ((x, y, z), b) =>
      (0 until 30).map(i => (b * 1000L + i, vec(
        x + rnd.nextGaussian() * 0.05, y + rnd.nextGaussian() * 0.05,
        z + rnd.nextGaussian() * 0.05)))
    }.toDF("vec_id", "embedding")
    // seeds: three arbitrary corpus members, one per blob region
    val seeds = Seq((0L, vec(0.8, 0.3, 0.1)), (1L, vec(0.3, 0.8, 0.1)),
      (2L, vec(0.1, 0.3, 0.8))).toDF("c_id", "c_v")
    val trained = Clustering.kmeans(corpus, seeds, rounds = 3)
      .as[(Long, Array[Double])].collect().toMap
    assert(trained.size == 3)
    // each final centroid aligns with one distinct blob direction
    def cos(a: Array[Double], b: (Double, Double, Double)): Double = {
      val d = a(0) * b._1 + a(1) * b._2 + a(2) * b._3
      d / math.sqrt(a.map(x => x * x).sum)
    }
    val aligned = dirs.map(d => trained.values.count(c => cos(c, d) > 0.99))
    assert(aligned == Seq(1, 1, 1), s"alignment counts $aligned")
    // assignment under the trained codebook is the true blob partition
    val cells = Clustering.assignCells(corpus,
        trained.toSeq.toDF("c_id", "c_v"))
      .select("n_id", "cell").as[(Long, Long)].collect()
    val byBlob = cells.groupBy(_._1 / 1000L).view.mapValues(_.map(_._2).distinct)
    assert(byBlob.values.forall(_.size == 1))
  }

  test("semanticDedup removes near-identical vectors, keeping the smallest id") {
    val cents = Seq((0L, vec(1, 0)), (1L, vec(0, 1))).toDF("c_id", "c_v")
    val corpus = Seq(
      (1L, vec(1, 0.01)), (2L, vec(1, 0.011)), (3L, vec(1, 0.012)), // trio
      (4L, vec(0.01, 1)), (5L, vec(0.012, 1)),                      // pair
      (6L, vec(0.6, 0.8))                                           // lone
    ).toDF("vec_id", "embedding")
    val got = Clustering.semanticDedup(corpus, cents, threshold = 0.999)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 3L -> 1L, 5L -> 4L))
  }

  test("semanticDedup window-128 refinement: measured recall vs brute-force within-cell") {
    // A corpus big enough that the rank window BINDS: 14,400 sphere-
    // uniform vectors (ScaleGen's fixture distribution) + every-5th
    // near-dup mutants (q75's augmentation) over ≤40 seeded cells →
    // ~430 members/cell, 3.4× the window. Brute force = the same
    // operator with the window wider than any cell, i.e. exact
    // all-pairs-within-cell SemDeDup.
    val base = ScaleGen.embeddingsDf(spark, 14400L)
      .select(col("vec_id"), col("embedding"))
    val aug = base.unionByName(base.filter(col("vec_id") % 5 === 0).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x.cast("double") * 1.01).as("embedding")))
    val cents = Clustering.seedCentroids(base, 50)
      .select(col("c_id"), transform(col("c_v"), x => x.cast("double")).as("c_v"))
    def removed(window: Int): Set[Long] =
      Clustering.semanticDedup(aug, cents, threshold = 0.95, window = window)
        .select("removed_id").as[Long].collect().toSet
    val exact = removed(1 << 24)
    val windowed = removed(128)
    assert(exact.nonEmpty, "degenerate corpus: brute force removed nothing")
    val recall = (windowed & exact).size.toDouble / exact.size
    info(f"semanticDedup window=128 recall vs brute force: $recall%.4f " +
      s"(${(windowed & exact).size}/${exact.size} removed ids)")
    // docstring claim: near-identical vectors have near-identical
    // centroid cosines, so a true ≥0.95 pair >128 ranks apart is
    // vanishingly rare — measured here, not argued
    assert(recall >= 0.99, f"windowed recall $recall%.4f below 0.99")
    // restriction ⇒ no invented removals
    assert((windowed -- exact).isEmpty, "windowed removed ids not in exact set")
  }

  test("misraGries retains every item above the frequency guarantee") {
    val stream = Seq.fill(400)("hot") ++ Seq.tabulate(300)(i => s"cold$i") ++
      Seq.fill(200)("warm")
    val shuffled = new Random(3).shuffle(stream)
    val kept = Sketches.misraGries(shuffled.iterator, k = 8).toSet
    // hot: 400/900 > 1/9, warm: 200/900 > 1/9 → both must survive
    assert(kept.contains("hot") && kept.contains("warm"))
    assert(kept.size <= 8)
  }

  test("heavyHitters equals exact GROUP BY HAVING under any partitioning") {
    val rnd = new Random(11)
    // zipf-ish: token t_i with multiplicity ~ 2000/(i+1)
    val toks = (0 until 50).flatMap(i => Seq.fill(2000 / (i + 1))(s"t$i"))
    val shuffled = rnd.shuffle(toks)
    val exact = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = shuffled.size
    val phi = 0.02
    val expected = exact.filter(_._2 >= math.ceil(n * phi).toLong)
    for (parts <- Seq(1, 3, 16)) {
      val df = shuffled.toDF("token").repartition(parts)
      val got = Sketches.heavyHitters(spark, df, phi)
        .select("token", "cnt").as[(String, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("MinhashUnion aggregator: group sketch equals the union-set signature") {
    import graft.functions.{MinhashAgg, MinhashExprs, TextFunctions, TextExprs}
    val docs = Seq(
      (1L, "g", "alpha beta gamma delta epsilon zeta"),
      (2L, "g", "gamma delta epsilon zeta eta theta"),
      (3L, "g", "one two three four five six seven")
    ).toDF("doc_id", "grp", "text")
    val sh = docs.select($"grp", array_distinct(
      TextExprs.word_shingles(TextFunctions.tokens($"text"), 3)).as("sh"))
    val perDoc = sh.select($"grp",
      MinhashExprs.minhash_signature(
        MinhashExprs.minhash_base_hashes($"sh"), 16).as("sig"))
    val grouped = perDoc.groupBy($"grp")
      .agg(MinhashAgg.minhashUnion(16)($"sig").as("usig"))
      .select("usig").as[Array[Long]].head()
    // signature computed directly on the UNION of the shingle sets
    val unionSig = sh.groupBy($"grp")
      .agg(array_distinct(flatten(collect_list($"sh"))).as("all_sh"))
      .select(MinhashExprs.minhash_signature(
        MinhashExprs.minhash_base_hashes($"all_sh"), 16).as("sig"))
      .as[Array[Long]].head()
    assert(grouped.toSeq == unionSig.toSeq)
  }

  test("bloomPrunedJoin equals the plain join and actually prunes the scan") {
    val fact = (1L to 5000L).map(i => (i, i % 100)).toDF("f_id", "f_key")
    val dim = Seq((3L, "a"), (7L, "b"), (11L, "c")).toDF("d_key", "d_name")
    val pruned = Pruning.bloomPrunedJoin(fact, dim, "f_key", "d_key",
      expectedKeys = Some(100L), fpp = 0.01)
    val plain = fact.join(dim, $"f_key" === $"d_key")
    assert(pruned.select("f_id", "f_key", "d_key", "d_name").collect().toSet ==
      plain.select("f_id", "f_key", "d_key", "d_name").collect().toSet)
    // the filter lives IN the plan: a might_contain predicate over a
    // bloom_filter_agg scalar subquery, no interpreted UDF in the scan
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"), planStr.take(800))
    assert(!planStr.contains("UDF") && !planStr.contains("BatchEvalPython"),
      planStr.take(800))
    // the Bloom pre-filter must drop the vast majority of the 5000
    // fact rows before the join (3 hot keys → 150 matches; allow fpp slack)
    val bf = dim.stat.bloomFilter("d_key", 100L, 0.01)
    val prefiltered = fact.filter(udf((k: Long) => bf.mightContainLong(k))
      .apply($"f_key")).count()
    assert(prefiltered < 500, s"bloom should prune, kept $prefiltered")
  }
}
