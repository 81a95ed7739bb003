package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.JdeFunctions._

/** Composite C2 — the Silver-layer JDE decoder (pure function; the
  * unit-test anchor).
  *
  * Takes raw F4211 Sales Order Detail rows and produces the clean
  * silver transaction contract:
  *   OrderNumber, OrderType, CustomerID, ItemNumber, OrderDate,
  *   DateKey, Quantity, ExtendedAmount, UnitPrice
  *
  * Reference semantics: `adf/dataflow/DF_Clean_JDE.json:56-97`
  * (derive J1–J4 then rename/prune). All expressions are built-in
  * Catalyst — the whole operator stays inside one WholeStageCodegen
  * span over the parquet scan, with column pruning pushed to the
  * reader.
  */
object CleanJde {

  def apply(f4211: DataFrame): DataFrame =
    f4211.select(
      col("SDDOCO").as("OrderNumber"),
      col("SDDCTO").as("OrderType"),
      col("SDAN8").as("CustomerID"),
      col("SDLITM").as("ItemNumber"),
      julianToDate(col("SDTRDJ")).as("OrderDate"),
      dateKey(julianToDate(col("SDTRDJ"))).as("DateKey"),
      fromImplicitDecimal(col("SDUORG")).as("Quantity"),
      fromImplicitDecimal(col("SDAEXP")).as("ExtendedAmount"),
      // UnitPrice from the RAW ints — the two implicit ÷100 cancel
      // (reference: DF_Clean_JDE.json:73).
      safeDivide(col("SDAEXP"), col("SDUORG")).as("UnitPrice"))
}
