package graft.sources

import java.nio.file.{Files, Paths, Path => JPath}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import graft.operators.SnapshotTable
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** R58: a Spark `TableCatalog` over a directory of snapshot tables — the
  * piece that makes the format reachable from PURE SQL, including the
  * standard time-travel syntax (Spark routes both forms to the catalog's
  * time-travel `loadTable` overloads):
  *
  * {{{
  * SET spark.sql.catalog.graft_cat = graft.sources.GraftCatalog
  * SET spark.sql.catalog.graft_cat.warehouse = /data/tables
  *
  * SELECT * FROM graft_cat.events                        -- latest version
  * SELECT * FROM graft_cat.events VERSION AS OF 3        -- pinned version
  * SELECT * FROM graft_cat.events VERSION AS OF 'batch-7'-- R44 commit tag
  * SELECT * FROM graft_cat.events TIMESTAMP AS OF '2026-08-14 12:00:00'
  * SHOW TABLES IN graft_cat                              -- manifest dirs
  * }}}
  *
  * Identifiers map to directories under the configured `warehouse`
  * (namespace segments are subdirectories); a table is any directory
  * holding a `_log` manifest dir. Reads share R57's scan shape — manifest
  * resolved once at plan time, scan delegated to the parquet DSv2, so
  * pushdown/pruning/isolation behave identically whether the table is
  * reached by path ([[GraftSnapshotSource]]) or by name (here).
  *
  * Read-only by design, like the R57 source: DDL/DML through the catalog
  * is rejected loudly — commits, restores and vacuum own the CAS protocol
  * through [[SnapshotTable]], and a catalog write path that bypassed it
  * would break the atomicity the format exists to provide.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse=<snapshot-tables dir>")
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): JPath =
    (ident.namespace() :+ ident.name()).foldLeft(Paths.get(warehouse))(_.resolve(_))

  private def load(ident: Identifier, version: Long): Table = {
    val dir = dirOf(ident)
    if (SnapshotTable.latestVersion(dir.toString).isEmpty)
      throw new NoSuchTableException(ident)
    GraftRead.pinned(dir.toString, version)
  }

  override def loadTable(ident: Identifier): Table = load(ident, -1L)

  /** `VERSION AS OF <v>` — a numbered version, or an R44 commit tag. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident).toString
    val v = version.toLongOption.getOrElse(
      SnapshotTable.versions(dir)
        .filter(v => SnapshotTable.tagOf(dir, v).contains(version))
        .maxOption.getOrElse(throw new IllegalArgumentException(
          s"no version or tag '$version' in ${ident.name()}")))
    load(ident, v)
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands the catalog epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident).toString
    load(ident, SnapshotTable.versionAsOf(dir, timestampMicros / 1000L))
  }

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.latestVersion(dirOf(ident).toString).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = namespace.foldLeft(Paths.get(warehouse))(_.resolve(_))
    if (!Files.isDirectory(base)) throw new NoSuchNamespaceException(namespace)
    val children = Files.list(base)
    try children.iterator().asScala
      .filter(p => Files.isDirectory(p.resolve("_log")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally children.close()
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(s"graft catalog is read-only: " +
      s"$op must go through SnapshotTable's CAS commit protocol")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    readOnly("CREATE TABLE")
  override def createTable(ident: Identifier, info: TableInfo): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}
