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

  test("streaming sessionize equals batch twin on random time-chunked arrivals") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.{Event, Session}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    for (trial <- 1 to 3) {
      // random events over 6 h for 3 users; integer-valued doubles so
      // the streaming state's running double sum is order-exact
      val events = (1 to 40).map { i =>
        Event(i.toLong, new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L),
          1L + rnd.nextInt(3), "e", (1 + rnd.nextInt(9)).toDouble)
      }
      // time-ordered chunks with random boundaries, shuffled inside
      // each chunk (arbitrary intra-batch arrival order)
      val sorted = events.sortBy(_.ts.getTime)
      val nCuts = 1 + rnd.nextInt(4)
      val cuts = (Seq(0, sorted.size) ++ (1 to nCuts).map(_ =>
        rnd.nextInt(sorted.size))).distinct.sorted
      val chunks = cuts.zip(cuts.tail).map { case (a, b) =>
        rnd.shuffle(sorted.slice(a, b)) }.filter(_.nonEmpty)

      val mem = MemoryStream[Event]
      val name = s"sess_prop_$trial"
      val q = StreamingOps.sessionize(mem.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      // sentinel per user closes every real session (10 h after max)
      val flushTs = new Timestamp(base + 16 * 3600 * 1000L)
      mem.addData((1L to 3L).map(u =>
        Event(1000L + u, flushTs, u, "flush", 0.0)): _*)
      q.processAllAvailable()
      q.stop()

      val got = spark.table(name).as[Session].collect()
        .map(s => (s.user_id, s.session_start_ms, s.session_end_ms,
          s.n_events, s.sum_value)).sorted.toSeq
      val expected = graft.operators.EventWindows.sessionize(
          events.toDF(), gapMinutes = 30)
        .select($"user_id", $"session_start_ms", $"session_end_ms",
          $"n_events", $"sum_value")
        .as[(Long, Long, Long, Long, Double)].collect().sorted.toSeq
      assert(got == expected, s"trial $trial chunks=${chunks.map(_.size)}")
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("streaming pattern detect equals an ordered fold on random chunked arrivals") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.{Event, PatternMatch}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val withinMs = 10 * 60 * 1000L
    val types = Vector("click", "purchase", "view")

    // the operator's contract, as a per-user ordered fold
    def ref(events: Seq[Event]): Set[(Long, Long, Long)] =
      events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        var trig = Option.empty[Long]
        val out = Seq.newBuilder[(Long, Long, Long)]
        es.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val t = e.ts.getTime
          if (e.event_type == "click") trig = Some(t)
          else if (e.event_type == "purchase") trig match {
            case Some(a) if t - a <= withinMs => out += ((u, a, t)); trig = None
            case Some(_) => trig = None
            case None => ()
          }
        }
        out.result()
      }.toSet

    for (trial <- 1 to 3) {
      // unique timestamps so chunking at a time boundary is unambiguous
      val offsets = rnd.shuffle((1 to 3600).toList).take(50)
      val events = offsets.zipWithIndex.map { case (sec, i) =>
        Event(i.toLong, new Timestamp(base + sec * 1000L),
          1L + rnd.nextInt(3), types(rnd.nextInt(3)), 0.0)
      }
      val sorted = events.sortBy(_.ts.getTime)
      val nCuts = 1 + rnd.nextInt(4)
      val cuts = (Seq(0, sorted.size) ++ (1 to nCuts).map(_ =>
        rnd.nextInt(sorted.size))).distinct.sorted
      val chunks = cuts.zip(cuts.tail).map { case (a, b) =>
        rnd.shuffle(sorted.slice(a, b)) }.filter(_.nonEmpty)

      val mem = MemoryStream[Event]
      val name = s"pat_prop_$trial"
      val q = StreamingOps.patternDetect(mem.toDS(), "click", "purchase", withinMs)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      q.stop()

      val got = spark.table(name).as[PatternMatch].collect()
        .map(m => (m.user_id, m.trigger_ms, m.target_ms)).toSet
      assert(got == ref(events), s"trial $trial chunks=${chunks.map(_.size)}")
      spark.sql(s"DROP TABLE IF EXISTS $name")
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
