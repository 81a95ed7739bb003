package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation over the testdata
  * parquet tables plus (where SQL-expressible) an equivalent ANSI SQL
  * oracle the driver runs in DuckDB on the same tables.
  *
  * Oracle-parity conventions (so value hashes match across engines):
  *  - integer outputs cast to BIGINT on both sides (DuckDB date
  *    parts/counts are BIGINT, Spark's are INT);
  *  - money aggregates computed in DECIMAL(18,2) exactly (sum order
  *    must not matter), final column cast to DOUBLE on both sides;
  *  - timestamps surfaced as epoch-millis BIGINT;
  *  - every result deterministically ordered by a unique key.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Read one testdata table (`TESTDATA.md` layout). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read nanos as long and
    * convert with integer division (ns values ~1.7e18 overflow double
    * precision, so no `/`), landing on the same microsecond instants
    * the DuckDB oracle sees after `CAST(ts AS TIMESTAMP)`. */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
}
