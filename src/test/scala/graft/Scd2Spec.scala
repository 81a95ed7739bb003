package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** C3 SCD2 merge: the reference's scenario matrix
  * (`README.md:198-216`, `docs/technical_report.md:217-251`) plus the
  * structural invariants from SURVEY.md §5.2. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val spec = Scd2.Spec("CustomerKey", "CustomerID",
    Seq("CustomerName", "SearchType", "CategoryCode"))
  private def ts(s: String) = to_timestamp(lit(s))

  private def batch(rows: (Long, String, String, String)*) =
    rows.toDF("CustomerID", "CustomerName", "SearchType", "CategoryCode")

  private val b1 = batch(
    (10L, "Acme", "C", "100"), (20L, "Globex", "C", "200"))

  test("new keys insert as active with contiguous surrogate keys") {
    val dim = Scd2.merge(Scd2.emptyDim(spark, b1, spec), b1, spec,
      ts("2024-01-01 00:00:00"))
    val rows = dim.orderBy("CustomerKey")
      .select("CustomerKey", "CustomerID", "IsActive").as[(Long, Long, Boolean)]
      .collect().toSeq
    assert(rows == Seq((1L, 10L, true), (2L, 20L, true)))
    assert(dim.filter($"ValidTo".isNotNull).count() == 0)
  }

  test("changed hash expires old version and inserts new; unchanged untouched") {
    val dim1 = Scd2.merge(Scd2.emptyDim(spark, b1, spec), b1, spec,
      ts("2024-01-01 00:00:00")).cache()
    val b2 = batch((10L, "Acme Corp", "C", "100"), (20L, "Globex", "C", "200"))
    val dim2 = Scd2.merge(dim1, b2, spec, ts("2024-06-01 00:00:00")).cache()
    assert(dim2.count() == 3)
    // old Acme version expired
    val old = dim2.filter($"CustomerID" === 10 && !$"IsActive").collect()
    assert(old.length == 1)
    assert(old.head.getAs[java.sql.Timestamp]("ValidTo").toString.startsWith("2024-06-01"))
    // new Acme version active with next key
    val nw = dim2.filter($"CustomerID" === 10 && $"IsActive").collect()
    assert(nw.head.getAs[Long]("CustomerKey") == 3L)
    assert(nw.head.getAs[String]("CustomerName") == "Acme Corp")
    // Globex untouched
    val gx = dim2.filter($"CustomerID" === 20).collect()
    assert(gx.length == 1 && gx.head.getAs[Boolean]("IsActive"))
  }

  test("idempotence: merging the same batch twice changes nothing") {
    val dim1 = Scd2.merge(Scd2.emptyDim(spark, b1, spec), b1, spec,
      ts("2024-01-01 00:00:00")).cache()
    val dim2 = Scd2.merge(dim1, b1, spec, ts("2024-06-01 00:00:00"))
    assert(dim2.count() == dim1.count())
    assert(dim2.exceptAll(dim1).count() == 0)
  }

  test("invariants: one active row per key; non-overlapping contiguous ranges") {
    val b2 = batch((10L, "Acme2", "C", "100"), (20L, "Globex", "C", "999"),
      (30L, "Initech", "C", "300"))
    val b3 = batch((10L, "Acme3", "C", "100"))
    val d1 = Scd2.merge(Scd2.emptyDim(spark, b1, spec), b1, spec, ts("2024-01-01 00:00:00")).cache()
    val d2 = Scd2.merge(d1, b2, spec, ts("2024-02-01 00:00:00")).cache()
    val d3 = Scd2.merge(d2, b3, spec, ts("2024-03-01 00:00:00")).cache()
    val active = d3.filter($"IsActive").groupBy("CustomerID").count()
      .filter($"count" =!= 1).count()
    assert(active == 0)
    // keys unique
    assert(d3.select("CustomerKey").distinct().count() == d3.count())
    // ranges: each expired row's ValidTo equals the successor's ValidFrom
    val gaps = d3.as("a").join(d3.as("b"),
        $"a.CustomerID" === $"b.CustomerID" &&
        $"a.ValidTo" === $"b.ValidFrom", "inner").count()
    val expiredRows = d3.filter(!$"IsActive").count()
    assert(gaps == expiredRows)
  }
}
