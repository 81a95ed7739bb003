package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.MakeDecimal
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Cheap exact DECIMAL construction for money columns (round-14
  * optimization, guide §1.2 step 2 "per-task work").
  *
  * `CAST(double AS DECIMAL(18,2))` is the hot-loop tax of the whole
  * money-aggregate family: Spark's double→decimal cast goes through
  * `BigDecimal.valueOf(double)`, which FORMATS THE DOUBLE TO A STRING
  * and re-parses it, then `setScale(HALF_UP)` — ~1 µs and several
  * allocations per value. Stack-sampling the bench showed
  * `java.math.BigDecimal.<init>` as the single hottest frame across
  * the warehouse queries (q01's 600 k-row aggregate spends ~80% of
  * its scan stage there).
  *
  * [[dec2]] builds the identical DECIMAL(18,2) value as compact
  * unscaled-long arithmetic instead: cents = floor(x·100 + 0.5) (pure
  * double math, codegen), wrapped by Catalyst's internal
  * [[MakeDecimal]] (= `Decimal.createUnsafe(long)` — no BigDecimal
  * anywhere). Downstream decimal sums then run on the compact-long
  * fast path as well.
  *
  * EXACTNESS PRECONDITION (why this is equivalence, not
  * approximation): the input double must carry a value with AT MOST
  * 2 DECIMAL PLACES, i.e. be the nearest double to some exact n/100
  * (all TPC-H money/quantity/discount fixture columns are exactly
  * that by generator construction — TESTDATA.md). Then the exact
  * value of x·100 is within ~1e-6 of the integer n, never anywhere
  * near a .5 boundary, so floor(x·100 + 0.5) recovers n exactly and
  * the CAST's HALF_UP rounding recovers the same n — bit-identical
  * results (verified by the full oracle gate). Do NOT use this on
  * columns with free-form fractional values, where CAST's HALF_UP on
  * the exact binary expansion and the FP product could disagree.
  *
  * Negative inputs keep the same margin argument (floor(n ± 1e-6 +
  * 0.5) = n for any integer n), so sign does not matter; NULL
  * propagates through both forms identically.
  */
object DecimalExprs {

  /** Exact `CAST(x AS DECIMAL(18,2))` for ≤2-dp money doubles,
    * without the per-row BigDecimal round trip. */
  def dec2(x: Column): Column =
    ColumnBridge.column(MakeDecimal(
      ColumnBridge.expression(cents2(x)), 18, 2))

  /** Exact integer cents for ≤2-dp money doubles — the
    * `(CAST(x AS DECIMAL(18,2)) * 100).cast(LongType)` pattern as one
    * cheap double op (same precondition as [[dec2]]). */
  def cents2(x: Column): Column =
    floor(x * lit(100) + lit(0.5)).cast(LongType)
}
