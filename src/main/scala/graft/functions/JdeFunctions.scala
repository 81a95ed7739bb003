package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JDE EnterpriseOne domain decoders, re-expressed as codegen-friendly
  * `Column => Column` combinators (no UDFs — everything folds into
  * whole-stage codegen).
  *
  * Reference semantics (study-only, no code copied):
  *  - Julian CYYDDD date decode: `adf/dataflow/DF_Clean_JDE.json:70`,
  *    `docs/technical_report.md:26-42`
  *  - implicit 2-decimal ints: `docs/technical_report.md:44-54`
  *  - DateKey yyyyMMdd: `adf/dataflow/DF_Clean_JDE.json:74`
  *  - safe divide: `adf/dataflow/DF_Clean_JDE.json:73`
  *  - SHA-256 row hash: `adf/dataflow/DF_SCD2_Customer.json:135`,
  *    `sql_scripts/load_gold_data.sql:19-38`
  */
object JdeFunctions {

  /** decimal(18,2) — the money type; never double for financials
    * (reference's #1 stated risk: `docs/technical_report.md:54`). */
  val Money: DecimalType = DecimalType(18, 2)

  /** J1 — JDE Julian `CYYDDD` → date.
    * C: 0=1900s 1=2000s 2=2100s; YY 2-digit year; DDD ordinal day.
    * `123001` → 2023-01-01.
    *
    * Robust variant: we `lpad` the stringified int to 6 digits so
    * century-0 values decode correctly (the reference stringifies the
    * raw int and mis-decodes 5-digit 1900s values — documented
    * divergence, SURVEY.md §2.4 J1). Invalid encodings (DDD=0, DDD
    * past year end, negative, >299366) → null.
    */
  def julianToDate(j: Column): Column = {
    val s    = lpad(j.cast(StringType), 6, "0")
    val cc   = substring(s, 1, 1).cast(IntegerType)
    val yy   = substring(s, 2, 2).cast(IntegerType)
    val ddd  = substring(s, 4, 3).cast(IntegerType)
    val yr   = lit(1900) + cc * 100 + yy
    val jan1 = to_date(concat(yr.cast(StringType), lit("-01-01")))
    val d    = date_add(jan1, ddd - lit(1))
    // DDD beyond the year's length rolls into the next year; DDD<1
    // rolls into the previous — both caught by the year check.
    when(j.isNull || j < 0 || j > 299366 || ddd < 1 || year(d) =!= yr,
      lit(null).cast(DateType)).otherwise(d)
  }

  /** Inverse of J1 (test/generator aid): date → CYYDDD int. */
  def dateToJulian(d: Column): Column =
    ((year(d) - 1900) * 1000 + dayofyear(d)).cast(IntegerType)

  /** J2 — implicit 2-decimal int → decimal(18,2): 1050 → 10.50.
    * Cast BEFORE divide so integer truncation can't occur. */
  def fromImplicitDecimal(c: Column): Column =
    (c.cast(Money) / lit(100)).cast(Money)

  /** J3 — date → yyyyMMdd surrogate int key (Dim_Date join key). */
  def dateKey(d: Column): Column =
    date_format(d, "yyyyMMdd").cast(IntegerType)

  /** J4 — zero-safe divide on raw ints (the two implicit ÷100 cancel):
    * UnitPrice = SDAEXP/SDUORG, 0 when quantity is 0. */
  def safeDivide(num: Column, den: Column): Column =
    when(den =!= 0, (num.cast(Money) / den.cast(Money)).cast(Money))
      .otherwise(lit(0).cast(Money))

  /** J5 — SHA-256 change-detection hash over business columns,
    * pipe-separated so ("ab","c") != ("a","bc"). Lowercase hex. */
  def rowHash(cols: Column*): Column =
    sha2(concat_ws("|", cols: _*), 256)

  /** J13/J14 — calendar flags. */
  def isWeekend(d: Column): Column = dayofweek(d).isin(1, 7)

  def isLeapYear(d: Column): Column = {
    val y = year(d)
    (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)
  }
}
