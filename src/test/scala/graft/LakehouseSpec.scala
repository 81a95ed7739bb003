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

  test("q120 null-safe join stays a hash-family join and matches null groups") {
    val q = SparkEntry.queries("q120_null_safe_join")(spark, sf)
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"<=> must remain an equi-join key:\n${plan.take(600)}")
    // the NULL bucket must appear and carry both sides' counts
    val nullRow = rows.find(_.isNullAt(0))
    assert(nullRow.isDefined, "NULL<=>NULL group must match")
    assert(nullRow.get.getLong(1) > 0 && nullRow.get.getLong(2) > 0)
  }

  test("q117 variant extraction agrees with string-path JSON extraction") {
    val viaVariant = SparkEntry.queries("q117_variant_props")(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val viaString = graft.queries.QueryDef.eventsTable(spark, sf)
      .selectExpr("CAST(get_json_object(props, '$.k') AS BIGINT) div 10 AS k_decile",
        "CAST(value AS DECIMAL(18,2)) AS v")
      .groupBy("k_decile")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"v").cast("double").as("sum_value"))
      .orderBy("k_decile")
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaVariant == viaString)
  }

  test("q118 SQL UDF inlines into the plan (no black-box UDF call)") {
    val q = SparkEntry.queries("q118_sql_udf_decode")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"SQL UDF must inline as expressions:\n${plan.take(600)}")
    // decode(encode(date)) round-trips: per-year bounds match the raw column
    val got = q.as[(Long, Long, java.sql.Date, java.sql.Date)].collect().toSeq
    val raw = graft.queries.QueryDef.table(spark, sf, "orders")
      .selectExpr("CAST(year(o_orderdate) AS BIGINT) AS y",
        "CAST(o_orderdate AS DATE) AS d")
      .groupBy("y")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min($"d").as("f"),
        org.apache.spark.sql.functions.max($"d").as("l"))
      .orderBy("y")
      .as[(Long, Long, java.sql.Date, java.sql.Date)].collect().toSeq
    assert(got == raw)
  }
}
