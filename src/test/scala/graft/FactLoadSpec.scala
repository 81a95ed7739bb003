package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.{CalendarDim, FactLoad}

/** C4 point-in-time join: version resolution, null-ValidTo = +inf,
  * the reference's drop-on-no-valid-version trap (SURVEY.md §7.4.3),
  * and C5 calendar shape. */
class FactLoadSpec extends SparkSpec {
  import spark.implicits._

  // dim: customer 1 has two versions split at 2020-06-01; customer 2
  // has one version starting 2021-01-01 (a PIT hole before that).
  private def dim = Seq(
    (101L, 1L, "2020-01-01 00:00:00", Some("2020-06-01 00:00:00")),
    (102L, 1L, "2020-06-01 00:00:00", None),
    (201L, 2L, "2021-01-01 00:00:00", None)
  ).toDF("CustomerKey", "CustomerID", "vf", "vt")
    .select($"CustomerKey", $"CustomerID",
      to_timestamp($"vf").as("ValidFrom"), to_timestamp($"vt").as("ValidTo"))

  private def silver = Seq(
    (1L, 1L, "2020-03-15"),  // → version 101
    (2L, 1L, "2020-06-01"),  // boundary day → version 102 (half-open)
    (3L, 1L, "2024-01-01"),  // open-ended current version → 102
    (4L, 2L, "2020-12-31"),  // matched key, no valid version
    (5L, 9L, "2020-01-01")   // unmatched key
  ).toDF("OrderNumber", "CustomerID", "od")
    .select($"OrderNumber", $"CustomerID", to_date($"od").as("OrderDate"))

  test("PIT join resolves the version containing the order date") {
    val got = FactLoad.pointInTimeJoin(silver, dim)
      .select($"OrderNumber", $"CustomerKey").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(101L))
    assert(got(2L).contains(102L)) // half-open [from, to): boundary → new version
    assert(got(3L).contains(102L)) // null ValidTo = +infinity
    assert(got(4L).isEmpty)        // kept with null key (fixed semantics)
    assert(got(5L).isEmpty)
  }

  test("faithful mode reproduces the reference's dropped-row behavior") {
    val got = FactLoad.pointInTimeJoin(silver, dim, faithful = true)
    assert(got.count() == 4) // order 4 vanishes (matched but out of range)
    assert(got.filter($"OrderNumber" === 4).count() == 0)
    assert(got.filter($"OrderNumber" === 5).count() == 1) // unmatched survives
  }

  test("loadFactSales assigns contiguous SalesKeys and validates DateKey") {
    val sil = silver
      .withColumn("OrderType", lit("SO"))
      .withColumn("ItemNumber", concat(lit("I"), $"OrderNumber"))
      .withColumn("DateKey", graft.functions.JdeFunctions.dateKey($"OrderDate"))
      .withColumn("Quantity", lit(1).cast("decimal(18,2)"))
      .withColumn("ExtendedAmount", lit(10).cast("decimal(18,2)"))
      .withColumn("UnitPrice", lit(10).cast("decimal(18,2)"))
    val cal = CalendarDim(spark, "2020-01-01", "2021-12-31")
    val fact = FactLoad.loadFactSales(sil, dim, cal,
      to_timestamp(lit("2024-01-01 00:00:00"))).cache()
    assert(fact.count() == 5)
    val keys = fact.select("SalesKey").as[Long].collect().sorted.toSeq
    assert(keys == Seq(1L, 2L, 3L, 4L, 5L))
    // 2024 order date is outside the calendar range → invalid DateKey
    val inv = fact.filter(!$"DateKeyValid").select("OrderNumber").as[Long].collect()
    assert(inv.toSeq == Seq(3L))
  }

  test("calendar dimension has reference row count and attributes") {
    val cal = CalendarDim(spark).cache()
    assert(cal.count() == 7671) // load_gold_data.sql:8
    val r = cal.filter($"FullDate" === Date.valueOf("2024-02-29")).collect().head
    assert(r.getAs[Int]("DateKey") == 20240229)
    assert(r.getAs[Boolean]("IsLeapYear"))
    assert(r.getAs[String]("DayOfWeekName") == "Thursday")
    assert(r.getAs[Int]("Quarter") == 1)
    val weekend = cal.filter($"IsWeekend").count()
    assert(weekend == cal.filter(dayofweek($"FullDate").isin(1, 7)).count())
  }
}
