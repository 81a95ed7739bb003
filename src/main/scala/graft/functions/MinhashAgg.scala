package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` tier (SURVEY.md §4.3 option b — a typed
  * aggregation function, the one custom-API layer the expression and
  * plan tiers don't cover).
  *
  * [[MinhashUnion]] merges per-document MinHash signatures by
  * elementwise min. Because each signature component is
  * min_{s ∈ set} hash_j(s), the elementwise min over documents equals
  * the signature OF THE UNION of their shingle sets — so a group's
  * sketch is computed without ever materializing the union
  * (associative + commutative → map-side partial aggregation; the
  * shuffle carries one `numHashes`-long array per group per
  * partition, independent of corpus size). The group sketch then
  * estimates cross-group Jaccard at the granularity of sources,
  * shards, or time buckets — set-similarity over collections too big
  * to intersect exactly.
  */
object MinhashAgg {

  /** Elementwise-min fold of `array<long>` signatures. Null
    * signatures and null elements are identity (MaxValue). */
  final class MinhashUnion(val sigLen: Int)
      extends Aggregator[Array[java.lang.Long], Array[Long], Array[Long]] {

    override def zero: Array[Long] = Array.fill(sigLen)(Long.MaxValue)

    override def reduce(buf: Array[Long], sig: Array[java.lang.Long]): Array[Long] = {
      if (sig != null) {
        var i = 0
        val n = math.min(sigLen, sig.length)
        while (i < n) {
          val v = sig(i)
          if (v != null && v < buf(i)) buf(i) = v
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < sigLen) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column-world handle: `df.groupBy(k).agg(minhashUnion(16)(sig))`. */
  def minhashUnion(sigLen: Int): UserDefinedFunction =
    udaf(new MinhashUnion(sigLen), ExpressionEncoder[Array[java.lang.Long]]())
}
