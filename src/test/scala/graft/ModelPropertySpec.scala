package graft

import graft.operators.{Dedup, Ids, Upsert}
import org.apache.spark.sql.functions._

/** Seeded randomized model tests (SURVEY §5.2 style): each operator
  * compared against a trivially-correct in-memory model over many
  * random inputs. */
class ModelPropertySpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents matches in-memory union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      // last trial: a larger sparse graph with long accidental chains
      val nNodes = if (trial == 6) 2000 else 20 + rnd.nextInt(30)
      val nEdges = if (trial == 6) 1900 else 5 + rnd.nextInt(40)
      val pairs = (1 to nEdges).map { _ =>
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        if (a < b) (a, b) else (b, a + 1) // avoid self loops
      }.distinct
      // in-memory union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = nodes.map(n => n -> find(n)).toMap
      // min-reachable-id canonicalization: map each root to the min id in its set
      val minOfRoot = nodes.groupBy(find).map { case (r, ms) => r -> ms.min }
      val expectedMin = expected.map { case (n, r) => n -> minOfRoot(r) }

      val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expectedMin, s"trial $trial: $pairs")
    }
  }

  test("upsert matches a map model across random batch sequences") {
    val rnd = new scala.util.Random(11)
    var state = (1L to 10L).map(k => (k, s"v$k")).toMap
    var df = state.toSeq.toDF("k", "v")
    for (step <- 1 to 5) {
      val batch = (1L to 15L).flatMap { k =>
        if (rnd.nextBoolean()) Some((k, s"v$k-$step")) else None
      }
      if (batch.nonEmpty) {
        df = Upsert.merge(df, batch.toDF("k", "v"), Seq("k")).localCheckpoint()
        state ++= batch.toMap
        val got = df.as[(Long, String)].collect().toMap
        assert(got == state, s"step $step")
      }
    }
  }

  test("contiguous ids follow key order for random sizes and partitionings") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 4) {
      val n = rnd.nextInt(5000)
      val parts = 1 + rnd.nextInt(7)
      val keys = rnd.shuffle((1L to n.toLong).toList)
      val df = keys.toDF("key").repartition(parts)
      val out = Ids.addContiguousIds(df, Seq(col("key")), "id")
        .as[(Long, Long)].collect()
      assert(out.length == n)
      assert(out.forall { case (key, id) => id == key }, s"trial $trial n=$n parts=$parts")
    }
  }
}
