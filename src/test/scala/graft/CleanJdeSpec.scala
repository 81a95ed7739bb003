package graft

import graft.operators.CleanJde

/** C2 JDE decode — golden fixture shaped like the reference generator
  * (`src/python/generate_jde_data.py:79-113`). */
class CleanJdeSpec extends SparkSpec {
  import spark.implicits._

  test("cleanJde decodes a reference-shaped F4211 row end to end") {
    val f4211 = Seq(
      // SDDOCO, SDDCTO, SDAN8, SDLITM, SDTRDJ, SDUORG, SDAEXP
      (123456, "SO", 10001, "4006381333931", 123032, 500, 300000),
      (123457, "SO", 10002, "4006381333932", 124366, 100, 1050)
    ).toDF("SDDOCO", "SDDCTO", "SDAN8", "SDLITM", "SDTRDJ", "SDUORG", "SDAEXP")
    val got = CleanJde(f4211).orderBy("OrderNumber").collect()

    val r1 = got(0)
    assert(r1.getAs[Int]("OrderNumber") == 123456)
    assert(r1.getAs[String]("OrderType") == "SO")
    assert(r1.getAs[Int]("CustomerID") == 10001)
    assert(r1.getAs[String]("ItemNumber") == "4006381333931")
    assert(r1.getAs[java.sql.Date]("OrderDate").toString == "2023-02-01")
    assert(r1.getAs[Int]("DateKey") == 20230201)
    assert(r1.getAs[java.math.BigDecimal]("Quantity").toPlainString == "5.00")
    assert(r1.getAs[java.math.BigDecimal]("ExtendedAmount").toPlainString == "3000.00")
    assert(r1.getAs[java.math.BigDecimal]("UnitPrice").toPlainString == "600.00")

    val r2 = got(1)
    assert(r2.getAs[java.sql.Date]("OrderDate").toString == "2024-12-31")
    assert(r2.getAs[java.math.BigDecimal]("ExtendedAmount").toPlainString == "10.50")
    assert(r2.getAs[java.math.BigDecimal]("UnitPrice").toPlainString == "10.50")
  }

  test("schema matches the silver transaction contract") {
    val f4211 = Seq((1, "SO", 1, "x", 123001, 1, 1))
      .toDF("SDDOCO", "SDDCTO", "SDAN8", "SDLITM", "SDTRDJ", "SDUORG", "SDAEXP")
    val sch = CleanJde(f4211).schema
    assert(sch.fieldNames.toSeq == Seq("OrderNumber", "OrderType", "CustomerID",
      "ItemNumber", "OrderDate", "DateKey", "Quantity", "ExtendedAmount", "UnitPrice"))
    assert(sch("Quantity").dataType.typeName == "decimal(18,2)")
    assert(sch("OrderDate").dataType.typeName == "date")
  }
}
