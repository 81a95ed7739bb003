package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CapstoneQueries, CoresetQueries, CurationQueries, EvalQueries, ExtensionQueries, HygieneQueries, LakehouseQueries, LayoutQueries, MiningQueries, OpsQueries, ParityQueries, PlanningQueries, ProfilingQueries, QuantQueries, QueryDef, RetrievalQueries, ServingQueries, SketchAuditQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query over the `/root/testdata` parquet tables, each (where
  * SQL-expressible) with a DuckDB oracle twin in [[oracleSql]].
  */
object SparkEntry {

  /** All registered query definitions. */
  def defs: Seq[QueryDef] =
    ParityQueries.all ++ ExtensionQueries.all ++ CurationQueries.all ++
      MiningQueries.all ++ AnalyticsQueries.all ++ ServingQueries.all ++
      LakehouseQueries.all ++ QuantQueries.all ++ RetrievalQueries.all ++
      LayoutQueries.all ++ CoresetQueries.all ++ WarehouseQueries.all ++
      SketchAuditQueries.all ++ PlanningQueries.all ++ HygieneQueries.all ++
      EvalQueries.all ++ ProfilingQueries.all ++ CapstoneQueries.all ++
      OpsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_star_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
