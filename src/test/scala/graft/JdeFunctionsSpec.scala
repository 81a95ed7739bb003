package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.functions.JdeFunctions._

/** J1–J5 codec tests: known-answer pairs from the reference docs plus
  * vectorized round-trip properties mirroring the reference generator
  * (`src/python/generate_jde_data.py:28-42`). */
class JdeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def decodeOne(j: Int): Option[String] =
    Seq(j).toDF("j").select(julianToDate($"j").cast("string")).as[String]
      .collect().headOption.flatMap(Option(_))

  test("known-answer Julian pairs (docs/technical_report.md:40)") {
    assert(decodeOne(123001).contains("2023-01-01"))
    assert(decodeOne(100001).contains("2000-01-01"))
    assert(decodeOne(124366).contains("2024-12-31")) // leap year day 366
    assert(decodeOne(99365).contains("1999-12-31"))  // century-0, lpad-robust
    assert(decodeOne(1).contains("1900-01-01"))
  }

  test("invalid Julians decode to null") {
    assert(decodeOne(123000).isEmpty)  // DDD = 0
    assert(decodeOne(123366).isEmpty)  // day 366 of a non-leap year
    assert(decodeOne(123999).isEmpty)  // DDD > 366
    assert(decodeOne(-5).isEmpty)
    assert(decodeOne(300001).isEmpty)  // century out of range
  }

  test("julian round-trip decode(encode(d)) == d for every day 1900..2099") {
    val start = LocalDate.of(1900, 1, 1)
    val end = LocalDate.of(2099, 12, 31)
    val days = Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end))
      .map(d => ((d.getYear - 1900) * 1000 + d.getDayOfYear, d.toString)).toSeq
    val mismatches = days.toDF("j", "expected")
      .withColumn("got", julianToDate($"j").cast("string"))
      .filter($"got".isNull || $"got" =!= $"expected")
      .count()
    assert(mismatches == 0)
    // and dateToJulian is the true inverse
    val enc = days.toDF("j", "d")
      .filter(dateToJulian(to_date($"d")) =!= $"j").count()
    assert(enc == 0)
  }

  test("implicit decimal: known pairs (docs/technical_report.md:49-53)") {
    val got = Seq(1050, 250000, 1430130).toDF("c")
      .select(fromImplicitDecimal($"c").cast("string")).as[String].collect()
    assert(got.toSeq == Seq("10.50", "2500.00", "14301.30"))
  }

  test("implicit decimal: exact ×100 round-trip incl. negatives/extremes") {
    val ns = Seq(0L, 1L, -1L, 99L, -99L, 123456789L, -123456789L,
      2000000000L, -2000000000L, 999999999999999L)
    val bad = ns.toDF("c")
      .filter((fromImplicitDecimal($"c") * 100).cast("long") =!= $"c").count()
    assert(bad == 0)
  }

  test("safeDivide: zero denominator yields 0.00, raw-int cancellation") {
    val rows = Seq((300000, 500), (100, 0)).toDF("aexp", "uorg")
      .select(safeDivide($"aexp", $"uorg").cast("string")).as[String].collect()
    assert(rows.toSeq == Seq("600.00", "0.00"))
  }

  test("rowHash: pipe separator disambiguates, sha256 hex matches") {
    val h = Seq(("ab", "c")).toDF("a", "b").select(rowHash($"a", $"b")).as[String].collect().head
    val h2 = Seq(("a", "bc")).toDF("a", "b").select(rowHash($"a", $"b")).as[String].collect().head
    assert(h != h2)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("ab|c".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h == expected)
  }

  test("dateKey: yyyyMMdd int") {
    val k = Seq("2023-01-15").toDF("d")
      .select(dateKey(to_date($"d"))).as[Int].collect().head
    assert(k == 20230115)
  }
}
