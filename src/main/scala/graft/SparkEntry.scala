package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the coverage inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("r3_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LlmOps.queries ++ graft.streaming.StreamingGates.queries ++
      graft.wikidata.EtlGates.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (the ETL gates read the checked-in mini-dump
    * by absolute path instead). Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ LlmOps.oracleSql ++ graft.streaming.StreamingGates.oracleSql ++
      graft.wikidata.EtlGates.oracleSql
}
