package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequency-sketch operators for the curation tier.
  *
  * [[heavyHitters]] is the canonical sketch-narrows / exact-verifies
  * pattern for 100 TB corpora: a Misra–Gries summary per partition
  * (bounded memory, one pass, no shuffle) nominates candidate tokens,
  * and only the candidates — thousands of rows, not the billions of
  * distinct tokens — pay for an exact global count. The final answer
  * is EXACT and partitioning-independent, which is what lets a DuckDB
  * oracle verify it (q76).
  */
object Sketches {

  /** Misra–Gries summary of one partition: at most `k` counters;
    * guaranteed to retain every item whose in-partition count exceeds
    * |partition|/(k+1). */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      if (counters.contains(t)) counters(t) += 1L
      else if (counters.size < k) counters(t) = 1L
      else {
        // decrement-all; drop zeros (the classic MG step)
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val n = counters(key) - 1L
          if (n == 0L) dead += key else counters(key) = n
        }
        dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Exact tokens with global count ≥ ceil(phi · N), found without a
    * full-vocabulary shuffle.
    *
    * Correctness of the candidate set for ANY partitioning: if
    * count(t) ≥ phi·N then by weighted average some partition p has
    * count_p(t)/N_p ≥ phi; with k ≥ ceil(1/phi) counters (we use
    * 2·ceil(1/phi) for slack), MG retains t in that partition because
    * count_p(t) > N_p/(k+1). The exact second pass then restores true
    * counts, so the result equals plain `GROUP BY HAVING` — only the
    * shuffle is k·numPartitions candidate rows instead of the full
    * token multiset.
    *
    * `tokens` must be a single string column named `token`. */
  def heavyHitters(spark: SparkSession, tokens: DataFrame, phi: Double): DataFrame = {
    import spark.implicits._
    val k = 2 * math.ceil(1.0 / phi).toInt
    val candidates = tokens.select(col("token")).as[String]
      .mapPartitions(it => misraGries(it, k))
      .distinct()
      .toDF("token")
    // exact global threshold: N computed in the same job via a
    // broadcast scalar aggregate — no driver-side collect
    val n = tokens.agg(count(lit(1)).as("n_total"))
    tokens.join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") >= ceil(col("n_total") * phi).cast("long"))
      .select(col("token"), col("cnt"), col("n_total"))
  }
}
