package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.GraftQuery

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All capabilities live in the [[registry]]; each entry carries its own
  * DuckDB oracle twin (or is explicitly rows-only).
  */
object SparkEntry {

  def registry: Seq[GraftQuery] =
    loan.LoanQueries.all ++
      loan.PortfolioQueries.all ++
      relational.RelationalQueries.all ++
      text.TextQueries.all ++
      dedup.DedupQueries.all ++
      sim.SimQueries.all ++
      events.EventQueries.all ++
      multimodal.MultimodalQueries.all ++
      layout.LayoutQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    loan.LoanDomain.loanFinalFrame(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> ((s: SparkSession, d: String) => q.frame(s, d))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
