package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.functions.VectorFunctions

/** Embedding compression for billion-vector similarity search
  * (SURVEY.md §7.5 extension tier): int8 scalar quantization and
  * product quantization (PQ, Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search") with asymmetric
  * distance computation (ADC).
  *
  * Why this matters at 100 TB: a 64-dim float corpus is 256 B/vector;
  * int8 cuts it 4× and PQ with 4 sub-codebooks cuts it to 4 B/vector
  * (64×), which is the difference between "the index fits in cluster
  * memory" and "it doesn't". Search cost drops the same way — ADC
  * scores a candidate with M lookup-table adds instead of a d-dim
  * float dot product.
  *
  * Determinism discipline (the property the DuckDB oracle checks):
  *  - per-dimension scales are `max(|x|)` — order-independent;
  *  - quantized codes are integers; integer dot products accumulate
  *    exactly, so ranking is bit-stable under any partitioning;
  *  - PQ codebook training reuses [[Clustering]]'s exact-DECIMAL
  *    Lloyd mean; sub-distances round to 9 decimals and sum as
  *    DECIMAL (the q132 round-then-exact-sum discipline), so ADC
  *    totals never depend on float addition order;
  *  - L2² is always computed as ‖a‖²+‖b‖²−2⟨a,b⟩ from the same
  *    strict left-to-right [[VectorFunctions.dot]] fold the oracle's
  *    `list_dot_product` uses — identical doubles on both engines.
  *
  * Scale shape: codebooks and scale vectors are tiny (≤ k·M rows) and
  * always broadcast; the corpus shuffles at most once per operation
  * (the same contract as [[Clustering.assignCells]] /
  * [[Similarity.ivfTopK]]).
  */
object Quantization {

  // ------------------------------------------------ int8 scalar quantization

  /** Per-dimension symmetric scales as ONE broadcastable row
    * `(scales: array<double>)`: scales(d) = max |x_d| over the
    * corpus. Max is order-independent, so the "trained" quantizer is
    * reproducible on any engine and any partitioning. */
  def dimScales(corpus: DataFrame, vecCol: String = "embedding"): DataFrame =
    corpus
      .select(posexplode(col(vecCol)).as(Seq("pos0", "x")))
      .groupBy((col("pos0") + 1).as("pos"))
      .agg(max(abs(col("x").cast(DoubleType))).as("s"))
      .groupBy()
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        p => p.getField("s")).as("scales"))

  /** Quantize every vector to int8 codes `q_d = round(x_d·127/s_d)`
    * (all-zero dimensions quantize to 0) plus its integer squared
    * norm. One narrow map over the corpus — the scales row broadcasts.
    * Output: (idCol, qv: array<long>, qn: long). */
  def scalarQuantize(corpus: DataFrame, scales: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    corpus.crossJoin(broadcast(scales))
      .select(col(idCol).cast(LongType).as(idCol),
        zip_with(col(vecCol), col("scales"), (x, s) =>
          when(s === 0.0, lit(0L))
            .otherwise(round(x.cast(DoubleType) * 127.0 / s).cast(LongType)))
          .as("qv"))
      .withColumn("qn",
        aggregate(col("qv"), lit(0L), (acc, v) => acc + v * v))

  /** Exact top-k by QUANTIZED cosine: the int8 analogue of
    * [[Similarity.bruteForceTopK]]. The score is
    * ⟨qa,qb⟩/(‖qa‖·‖qb‖) with integer dot/norms — exact integer
    * accumulation, one final double division. Queries broadcast; the
    * corpus is scanned once; per-query ranking is the only shuffle.
    * Output: (q_id, rank, n_id, qcos). */
  def quantizedTopK(quantized: DataFrame, queryIds: DataFrame, k: Int,
                    idCol: String = "vec_id"): DataFrame = {
    val c = quantized.select(col(idCol).as("n_id"),
      col("qv").as("n_qv"), col("qn").as("n_qn"))
    val q = broadcast(quantized.join(queryIds, idCol)
      .select(col(idCol).as("q_id"), col("qv").as("q_qv"), col("qn").as("q_qn")))
    val scored = c.join(q, col("q_id") =!= col("n_id"))
      .withColumn("dot", aggregate(
        zip_with(col("q_qv"), col("n_qv"), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v))
      .withColumn("qcos",
        when(col("q_qn") * col("n_qn") === 0L, lit(0.0))
          .otherwise(col("dot").cast(DoubleType) /
            sqrt((col("q_qn") * col("n_qn")).cast(DoubleType))))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qcos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast(LongType).as("rank"),
        col("n_id"), col("qcos"))
  }

  // ------------------------------------------------ binary (1-bit) quantization

  /** Binarize to sign bits packed into two 32-bit words (`b0` = dims
    * 1–32, `b1` = dims 33–64): bit i set iff x > 0. Two words instead
    * of one keep every shift ≤ 31, which every engine's BIGINT shift
    * handles without sign-overflow edge cases. 512× smaller than the
    * float vector — the coarsest tier of the compression family.
    * Output: (idCol, b0, b1). */
  def binarize(corpus: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    def pack(offset: Int): Column = aggregate(
      transform(sequence(lit(1), lit(32)), i =>
        when(element_at(col(vecCol), i + offset).cast(DoubleType) > 0.0,
          call_function("shiftleft", lit(1L), i - 1)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
    corpus.select(col(idCol).cast(LongType).as(idCol),
      pack(0).as("b0"), pack(32).as("b1"))
  }

  /** Top-k by Hamming distance over the packed sign bits: two XORs
    * and two popcounts per candidate — the cheapest possible scan.
    * Pure-integer scoring, so ranking (distance asc, id asc) is
    * exactly reproducible anywhere. Output: (q_id, rank, n_id,
    * hamming). */
  def hammingTopK(binarized: DataFrame, queryIds: DataFrame, k: Int,
                  idCol: String = "vec_id"): DataFrame = {
    val c = binarized.select(col(idCol).as("n_id"),
      col("b0").as("n_b0"), col("b1").as("n_b1"))
    val q = broadcast(binarized.join(queryIds, idCol)
      .select(col(idCol).as("q_id"), col("b0").as("q_b0"), col("b1").as("q_b1")))
    val scored = c.join(q, col("q_id") =!= col("n_id"))
      .withColumn("hamming",
        (bit_count(col("q_b0").bitwiseXOR(col("n_b0"))) +
          bit_count(col("q_b1").bitwiseXOR(col("n_b1")))).cast(LongType))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast(LongType).as("rank"),
        col("n_id"), col("hamming"))
  }

  // ------------------------------------------------ product quantization

  /** ‖a−b‖² via the dot identity — NOT a fused (x−y)² fold — so both
    * engines combine the same three strict-fold dot products with the
    * same scalar ops. */
  private def l2sq(a: Column, b: Column): Column =
    VectorFunctions.dot(a, a) + VectorFunctions.dot(b, b) -
      lit(2.0) * VectorFunctions.dot(a, b)

  /** Explode each vector into its M contiguous subvectors (cast to
    * double). Output: (vec_id, m ∈ [0,M), sv: array<double>). */
  def subVectors(df: DataFrame, nSub: Int, subDim: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).cast(LongType).as("vec_id"),
        explode(array((0 until nSub).map(m =>
          struct(lit(m.toLong).as("m"),
            transform(slice(col(vecCol), m * subDim + 1, subDim),
              x => x.cast(DoubleType)).as("sv"))): _*)).as("msv"))
      .select(col("vec_id"), col("msv.m").as("m"), col("msv.sv").as("sv"))

  /** Nearest sub-centroid per (vector, subspace): broadcast codebook
    * join + map-side `min(struct(dist, c_id))` partial aggregate —
    * ties break to the smaller centroid id, the N×k score matrix
    * never survives a task, and the shuffle carries N·M rows.
    * `carrySv` keeps the subvector for a following Lloyd update. */
  def pqAssign(subs: DataFrame, codebooks: DataFrame,
               carrySv: Boolean): DataFrame = {
    val keys: Seq[Column] =
      if (carrySv) Seq(col("vec_id"), col("m"), col("sv"))
      else Seq(col("vec_id"), col("m"))
    subs.join(broadcast(codebooks), "m")
      .withColumn("d", l2sq(col("sv"), col("c_v")))
      .groupBy(keys: _*)
      .agg(min(struct(col("d"), col("c_id"))).as("best"))
      .select(keys :+ col("best.c_id").as("code"): _*)
  }

  /** Train M sub-codebooks: deterministic seeds (every `every`-th
    * vector's subvectors, codebook id = vec_id) refined by `rounds`
    * Lloyd iterations with exact per-dimension DECIMAL means (the
    * [[Clustering.centroidUpdate]] discipline, grouped by subspace so
    * all M codebooks train in ONE plan per round). Lineage truncates
    * per round via [[Checkpoints]]. Output: (m, c_id, c_v).
    *
    * Seeds are capped at `maxCells` per subspace (the
    * [[Clustering.seedCentroids]] scale guard): codebook size is a
    * hyperparameter, so it must not grow with the corpus — uncapped,
    * the N×cells ADC/assignment scans go quadratic (×30 at 10× data,
    * SCALING.md). every=50 × maxCells=40 reproduces the sf0.1
    * fixture seed set exactly. */
  def pqTrain(corpus: DataFrame, nSub: Int, subDim: Int, every: Int,
              rounds: Int, idCol: String = "vec_id",
              vecCol: String = "embedding",
              maxCells: Int = 40): DataFrame = {
    val subs = subVectors(corpus, nSub, subDim, idCol, vecCol)
    var cents = subs.filter(col("vec_id") % every === 0 &&
        col("vec_id") < every.toLong * maxCells)
      .select(col("m"), col("vec_id").as("c_id"), col("sv").as("c_v"))
    for (_ <- 0 until rounds) {
      val assigned = pqAssign(subs, cents, carrySv = true)
      cents = Checkpoints.truncate(assigned
        .select(col("m"), col("code").as("cell"),
          posexplode(col("sv")).as(Seq("pos0", "x")))
        .select(col("m"), col("cell"), (col("pos0") + 1).cast(LongType).as("pos"),
          col("x").cast(DecimalType(20, 7)).as("xd"))
        .groupBy(col("m"), col("cell"), col("pos"))
        .agg((sum(col("xd")).cast(DoubleType) / count(lit(1))).as("c"))
        .groupBy(col("m"), col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("ps"))
        .select(col("m"), col("cell").as("c_id"),
          transform(col("ps"), p => p.getField("c")).as("c_v")))
    }
    cents
  }

  /** Encode the corpus: M small code ids per vector — the 64×
    * compression. Output: (vec_id, m, code). */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, nSub: Int,
               subDim: Int, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    pqAssign(subVectors(corpus, nSub, subDim, idCol, vecCol),
      codebooks, carrySv = false)

  /** ADC top-k: per query build the (M × k) lookup table of exact
    * sub-distances to every sub-centroid, broadcast it, and score
    * each encoded vector with M table adds — no float vector math per
    * candidate. Sub-distances round to 9 decimals and sum as DECIMAL
    * so the total is independent of add order. Self-matches are
    * excluded. Output: (q_id, rank, n_id, adc). */
  def pqSearch(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
               nSub: Int, subDim: Int, k: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val lut = subVectors(queries, nSub, subDim, idCol, vecCol)
      .select(col("vec_id").as("q_id"), col("m"), col("sv"))
      .join(broadcast(codebooks), "m")
      .select(col("q_id"), col("m"), col("c_id"),
        round(l2sq(col("sv"), col("c_v")), 9)
          .cast(DecimalType(28, 9)).as("dd"))
    val adc = codes.join(broadcast(lut),
        codes("m") === lut("m") && codes("code") === lut("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), codes("vec_id").as("n_id"))
      .agg(sum(col("dd")).cast(DoubleType).as("adc"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("n_id"))
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast(LongType).as("rank"),
        col("n_id"), col("adc"))
  }
}
