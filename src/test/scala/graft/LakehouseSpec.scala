package graft

import java.security.MessageDigest

/** Behavior + plan-shape checks for the lakehouse consumption tier
  * (q114–q116). Oracle hash-parity is the driver's job; here we pin
  * the join strategy q114 is designed around, and verify q115/q116
  * against independent in-memory models over the same fixture data.
  */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q114 star joins broadcast every dim; no cartesian anywhere") {
    val q = SparkEntry.queries("q114_profit_by_nation")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"part/supplier/nation sides must broadcast:\n${plan.take(800)}")
  }

  test("q115 streaks match a per-user scan over the raw events") {
    val got = SparkEntry.queries("q115_user_streaks")(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (u, a, l) => u -> ((a, l)) }.toMap

    val days = graft.queries.QueryDef.eventsTable(spark, sf)
      .selectExpr("user_id", "to_date(ts) AS day")
      .as[(Long, java.sql.Date)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2.toLocalDate.toEpochDay).distinct.sorted.toSeq).toMap

    val expect = days.map { case (u, ds) =>
      var longest = 1L; var cur = 1L
      ds.sliding(2).foreach {
        case Seq(a, b) =>
          cur = if (b == a + 1) cur + 1 else 1L
          longest = math.max(longest, cur)
        case _ => ()
      }
      u -> ((ds.size.toLong, if (ds.size == 1) 1L else longest))
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (u, e) =>
      assert(got(u) == e, s"user $u: got ${got(u)}, expected $e")
    }
  }

  test("q116 equals a brute-force weighted-priority model; deterministic") {
    val got = SparkEntry.queries("q116_weighted_sample")(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    val docs = graft.queries.QueryDef.table(spark, sf, "documents")
      .selectExpr("doc_id", "source", "n_chars")
      .as[(Long, String, Long)].collect()
    val md = MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      md.reset()
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = docs
      .map { case (id, src, nc) => (id, src, nc, h60(id.toString) / math.max(nc, 1L)) }
      .sortBy(t => (t._4, t._1)).take(20).toSeq
    assert(got == expect)
    val again = SparkEntry.queries("q116_weighted_sample")(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(again == got, "weighted sample must be rerun-stable")
  }
}
