package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quantization, Similarity}

/** Properties of the compressed-index tier (int8 scalar quantization
  * and product quantization) that the SQL oracle can't express:
  * reconstruction-error bounds, recall against the exact baseline,
  * and degenerate-input behavior. */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticCorpus(n: Int, dim: Int) = {
    // deterministic pseudo-random floats in [-1, 1] from a hash mix
    val rows = (0 until n).map { i =>
      val v = (0 until dim).map { d =>
        val h = (i * 2654435761L + d * 40503L + 12345L) & 0xffffL
        (h.toFloat / 0x8000L) - 1.0f
      }.toArray
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("int8 quantization: max dequantization error is half a step per dim") {
    val corpus = syntheticCorpus(60, 8)
    val scales = Quantization.dimScales(corpus)
    val sc = scales.select(col("scales")).as[Seq[Double]].head
    val q = Quantization.scalarQuantize(corpus, scales)
      .select(col("vec_id"), col("qv")).as[(Long, Seq[Long])].collect().toMap
    val orig = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    for ((id, v) <- orig; d <- v.indices) {
      val deq = q(id)(d).toDouble * sc(d) / 127.0
      val step = sc(d) / 127.0
      assert(math.abs(deq - v(d)) <= step / 2 + 1e-12,
        s"vec $id dim $d: ${v(d)} vs dequant $deq (step $step)")
      assert(math.abs(q(id)(d)) <= 127L)
    }
  }

  test("int8 quantization: all-zero dimension quantizes to 0, zero vector gets qcos 0") {
    val corpus = Seq(
      (0L, Array(0.0f, 1.0f, 0.5f)),
      (1L, Array(0.0f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val quantized = Quantization.scalarQuantize(corpus, Quantization.dimScales(corpus))
    val qv = quantized.select(col("vec_id"), col("qv"), col("qn"))
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> r).toMap
    assert(qv.values.forall(_._2.head == 0L), "dead dim must quantize to 0")
    assert(qv(2L)._2.forall(_ == 0L) && qv(2L)._3 == 0L)
    val top = Quantization.quantizedTopK(quantized,
      Seq(Tuple1(2L)).toDF("vec_id"), k = 2)
      .select(col("q_id"), col("n_id"), col("qcos")).as[(Long, Long, Double)]
      .collect()
    assert(top.forall(_._3 == 0.0), "zero vector scores 0 against everything")
  }

  test("int8 brute-force recall@5 vs exact float top-5 is high on smooth data") {
    val corpus = syntheticCorpus(200, 16)
    val qIds = corpus.filter(col("vec_id") % 40 === 0).select(col("vec_id"))
    val quantTop = Quantization
      .quantizedTopK(Quantization.scalarQuantize(corpus, Quantization.dimScales(corpus)), qIds, k = 5)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect().toSet
    val exactTop = Similarity
      .bruteForceTopK(corpus, corpus.filter(col("vec_id") % 40 === 0), k = 5)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect().toSet
    val recall = (quantTop & exactTop).size.toDouble / exactTop.size
    assert(recall >= 0.8, s"int8 recall@5 $recall below 0.8")
  }

  test("binarize packs sign bits exactly; hamming ranks by bit disagreement") {
    val corpus = Seq(
      (0L, Array.fill(64)(1.0f)),                       // all ones
      (1L, Array.fill(64)(-1.0f)),                      // all negative
      (2L, Array.tabulate(64)(i => if (i < 32) 1.0f else -1.0f)), // half
      (3L, Array.tabulate(64)(i => if (i == 0) -1.0f else 1.0f))  // 1 bit off vs 0
    ).toDF("vec_id", "embedding")
    val bits = Quantization.binarize(corpus)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(bits(0L) == ((0xffffffffL, 0xffffffffL)))
    assert(bits(1L) == ((0L, 0L)))
    assert(bits(2L) == ((0xffffffffL, 0L)))
    assert(bits(3L) == ((0xfffffffeL, 0xffffffffL)))
    val top = Quantization.hammingTopK(Quantization.binarize(corpus),
      Seq(Tuple1(0L)).toDF("vec_id"), k = 3)
      .select(col("rank"), col("n_id"), col("hamming"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(top.toSeq == Seq((1L, 3L, 1L), (2L, 2L, 32L), (3L, 1L, 64L)))
  }

  test("pq: codes are within the codebook, one per (vector, subspace)") {
    val corpus = syntheticCorpus(120, 16)
    val cb = Quantization.pqTrain(corpus, nSub = 4, subDim = 4, every = 20, rounds = 2)
    val cbIds = cb.select(col("m"), col("c_id")).as[(Long, Long)].collect().toSet
    val codes = Quantization.pqEncode(corpus, cb, nSub = 4, subDim = 4)
      .select(col("vec_id"), col("m"), col("code")).as[(Long, Long, Long)].collect()
    assert(codes.length == 120 * 4)
    assert(codes.map(c => (c._1, c._2)).distinct.length == 120 * 4)
    assert(codes.forall(c => cbIds.contains((c._2, c._3))),
      "every code must reference a trained centroid")
  }

  test("pq Lloyd round strictly reduces total assignment distance") {
    val corpus = syntheticCorpus(120, 16)
    def totalDist(rounds: Int): Double = {
      val cb = Quantization.pqTrain(corpus, nSub = 4, subDim = 4, every = 20, rounds = rounds)
      val subs = Quantization.subVectors(corpus, nSub = 4, subDim = 4)
      subs.join(broadcast(cb), "m")
        .withColumn("d",
          graft.functions.VectorFunctions.dot(col("sv"), col("sv"))
            + graft.functions.VectorFunctions.dot(col("c_v"), col("c_v"))
            - lit(2.0) * graft.functions.VectorFunctions.dot(col("sv"), col("c_v")))
        .groupBy(col("vec_id"), col("m")).agg(min(col("d")).as("best"))
        .agg(sum(col("best"))).as[Double].head
    }
    val d1 = totalDist(1)
    val d2 = totalDist(2)
    assert(d2 <= d1 + 1e-9, s"round 2 total distance $d2 worse than round 1 $d1")
  }

  test("pq ADC recall@5 vs exact float top-5 beats chance and self is excluded") {
    val corpus = syntheticCorpus(200, 16)
    val qs = corpus.filter(col("vec_id") % 40 === 0)
    val cb = Quantization.pqTrain(corpus, nSub = 4, subDim = 4, every = 20, rounds = 2)
    val codes = Quantization.pqEncode(corpus, cb, nSub = 4, subDim = 4)
    val adcTop = Quantization.pqSearch(qs, codes, cb, nSub = 4, subDim = 4, k = 5)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect()
    assert(adcTop.forall(p => p._1 != p._2), "self-match must be excluded")
    val exactTop = Similarity.bruteForceTopK(corpus, qs, k = 5)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect().toSet
    val recall = (adcTop.toSet & exactTop).size.toDouble / exactTop.size
    // 4-byte codes vs 64-byte floats: lossy, but must beat the ~2.5%
    // random-overlap floor by a wide margin on smooth data
    assert(recall >= 0.3, s"pq recall@5 $recall below 0.3")
  }
}
