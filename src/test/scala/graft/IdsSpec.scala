package graft

import graft.operators.Ids
import org.apache.spark.sql.functions._

/** Contiguous-id assignment: correct global numbering, direction
  * honoring, and stability across repeated evaluation (the property
  * the reverted lazy two-branch plan could not guarantee — see the
  * Ids scaladoc). */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("ids are contiguous and follow global key order") {
    for (n <- Seq(0, 1, 5, 1000)) {
      val df = spark.range(n).select(
        // reversed, shuffled insertion order; key = idx
        (lit(n.toLong) - $"id").as("key"), ($"id" % 7).as("v"))
        .repartition(5)
      val out = Ids.addContiguousIds(df, Seq(col("key")), "sk", offset = 100L)
        .select("sk", "key").as[(Long, Long)].collect().sortBy(_._2)
      assert(out.length == n)
      // key k (1-based dense) gets id 100 + k
      assert(out.forall { case (sk, key) => sk == 100L + key })
    }
  }

  test("descending sort expressions are honored (review r03 finding)") {
    val df = spark.range(1, 101).select($"id".as("key")).repartition(5)
    val out = Ids.addContiguousIds(df, Seq(col("key").desc), "sk")
      .select("sk", "key").as[(Long, Long)].collect().sortBy(_._1)
    // largest key gets id 1, smallest gets id 100
    assert(out.head == ((1L, 100L)) && out.last == ((100L, 1L)))
    assert(out.forall { case (sk, key) => sk == 101L - key })
  }

  test("repeated evaluation of one plan yields identical ids") {
    // zipWithIndex pins a single RDD: the count job and every data
    // job read the same partitioning, so re-evaluating the result
    // (no cache) cannot re-deal rows into different partitions
    val df = spark.range(20000).select(($"id" * 37 % 20011).as("key"))
      .repartition(7)
    val out = Ids.addContiguousIds(df, Seq(col("key")), "sk")
    val a = out.select("key", "sk").as[(Long, Long)].collect().sortBy(_._1)
    val b = out.select("key", "sk").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).distinct.length == a.length)
  }

  test("ntileFromRank is bit-identical to the NTILE window for every (n, k) shape") {
    import org.apache.spark.sql.expressions.Window
    // covers n < k, n = k, n % k = 0, and both fat/thin bucket mixes
    for (k <- Seq(5, 32); n <- Seq(1, 3, k - 1, k, k + 1, 2 * k + 3, 100, 101, 1500)) {
      val df = spark.range(n).select($"id".as("key")).repartition(4)
      val want = df.withColumn("t",
        ntile(k).over(Window.orderBy($"key")).cast("long"))
        .select("key", "t").as[(Long, Long)].collect().toMap
      val ranked = Ids.addContiguousIds(df, Seq(col("key")), "rk")
      val got = ranked.crossJoin(
          broadcast(ranked.groupBy().agg(count(lit(1)).as("n_rows"))))
        .select($"key", Ids.ntileFromRank($"rk", $"n_rows", k).as("t"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"n=$n k=$k: $got vs $want")
    }
  }

  test("distinct ids under skewed multi-column ordering") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2), ("a", 2), ("b", 1))
      .toDF("g", "k")
    val out = Ids.addContiguousIds(df, Seq(col("g"), col("k")), "sk")
      .orderBy("sk").select("g", "k").as[(String, Int)].collect().toSeq
    assert(out == Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2)))
  }
}
