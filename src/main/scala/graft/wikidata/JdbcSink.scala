package graft.wikidata

import java.sql.DriverManager
import java.util.Properties

/** JDBC sink for the wd2sql tables — drop-in parity with the reference's
  * SQLite output (reference: src/main.rs:42-67 creates tables + bulk
  * inserts, then src/value.rs:128-139 indexes every column).
  *
  * The writer is plain `df.write.jdbc` (executor-parallel batched inserts —
  * the distributed analogue of the reference's prepared-statement batches),
  * followed by reference-style per-column index DDL. Works against any JDBC
  * database; the container has embedded Derby to prove it, SQLite is a URL
  * and driver swap away.
  */
object JdbcSink {

  /** Column type overrides keeping strings indexable (default dialect
    * mappings pick CLOB/TEXT, which many databases refuse to index). */
  private val columnTypes: Map[String, String] = Map(
    "meta"   -> "label VARCHAR(2048), description VARCHAR(8192)",
    "string" -> "string VARCHAR(8192)")

  /** Derby's stock dialect binds StringType as CLOB, which conflicts with
    * the VARCHAR columns above on null binds — override the write-side type.
    * Registered once; Spark consults registered dialects before built-ins. */
  private object VarcharDerbyDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(8192)", java.sql.Types.VARCHAR))
      case _ => None
    }
  }
  private lazy val registerDialect: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(VarcharDerbyDialect)

  def writeTables(tables: WikidataTables, url: String,
      properties: Properties = new Properties(), createIndices: Boolean = true): Unit = {
    registerDialect
    tables.byName.foreach { case (name, df) =>
      val writer = df.write.mode("overwrite")
      // quoted: `none` (reference table name, src/value.rs:100) is a SQL
      // reserved word in several databases
      columnTypes.get(name).fold(writer)(t => writer.option("createTableColumnTypes", t))
        .jdbc(url, "\"" + name + "\"", properties)
    }
    if (createIndices) createAllIndices(tables, url, properties)
  }

  /** Index every column of every table, as the reference does
    * (value.rs:128-139, main.rs:53-67). Long string columns are skipped
    * when the database refuses (matching "best effort index everything"). */
  def createAllIndices(tables: WikidataTables, url: String, properties: Properties): Unit = {
    val conn = DriverManager.getConnection(url, properties)
    try {
      val stmt = conn.createStatement()
      for ((table, df) <- tables.byName; column <- df.columns) {
        try stmt.execute(s"""CREATE INDEX ${table}_${column}_index ON "$table" ($column)""")
        catch { case _: java.sql.SQLException => () /* unindexable type */ }
      }
      stmt.close()
    } finally conn.close()
  }
}
