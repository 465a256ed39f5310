package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import graft.operators.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** R57: the snapshot table format as a first-class Spark DataSourceV2 —
  * `spark.read.format("graft").load(tablePath)`, with Delta-style time
  * travel through options:
  *
  * {{{
  * spark.read.format("graft").load(t)                            // latest
  * spark.read.format("graft").option("versionAsOf", 2).load(t)   // pinned
  * spark.read.format("graft").option("timestampAsOf",
  *   "2026-08-14 12:00:00").load(t)                              // R55 AS OF
  * }}}
  *
  * The provider resolves the manifest log ONCE at plan time (driver-side
  * small reads, no data I/O) to the pinned version's exact file list, then
  * delegates the entire scan to Spark's own parquet DSv2 ([[ParquetTable]]
  * over that list) — so filter pushdown, column pruning, vectorized
  * reading and `PushedFilters`/`ReadSchema` in the plan all behave exactly
  * as a native parquet scan, while the file list carries the snapshot
  * isolation: a concurrent commit or compaction publishes a NEW manifest
  * and can never change the files this scan reads. This is the same
  * read-path shape as [[SnapshotTable.read]] (leaf-file roots, no
  * partition-directory inference), now reachable from the format-string
  * API any SQL/Python/R binding can call without graft classes on the
  * caller side of the API.
  *
  * Read-only by design: writes go through [[SnapshotTable.commit]] and
  * friends, which own the CAS commit protocol; a DSv2 write path that
  * bypassed it would break atomicity. Options other than
  * `path`/`versionAsOf`/`timestampAsOf` (e.g. `mergeSchema` for R52
  * evolution reads) pass through to the parquet scan untouched.
  */
class GraftSnapshotSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  private val reserved = Set("path", "paths", "versionasof", "timestampasof")

  private def tablePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      """graft source needs a table path: spark.read.format("graft").load(path)""")
    p
  }

  /** Millis-epoch long, or a `yyyy-MM-dd HH:mm:ss[.f…]` local timestamp, or
    * an ISO-8601 instant — the same inputs Delta's `timestampAsOf` takes. */
  private def parseTs(s: String): Long =
    s.toLongOption.getOrElse {
      try java.sql.Timestamp.valueOf(s).getTime
      catch {
        case _: IllegalArgumentException => java.time.Instant.parse(s).toEpochMilli
      }
    }

  /** Manifest resolution — the one graft-specific step of the read. */
  private def underlying(options: CaseInsensitiveStringMap): ParquetTable = {
    val table = tablePath(options)
    require(!(options.containsKey("versionAsOf") && options.containsKey("timestampAsOf")),
      "versionAsOf and timestampAsOf are mutually exclusive")
    val version =
      if (options.containsKey("versionAsOf")) options.get("versionAsOf").toLong
      else if (options.containsKey("timestampAsOf"))
        SnapshotTable.versionAsOf(table, parseTs(options.get("timestampAsOf")))
      else -1L
    val passThrough = options.asScala.toMap.filterNot { case (k, _) => reserved(k.toLowerCase) }
    GraftRead.pinned(table, version, passThrough)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    underlying(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    underlying(new CaseInsensitiveStringMap(properties))
}

/** Shared pinned-scan constructor for the R57 path source and the R58
  * catalog: one place owns the "resolve manifest → delegate to the parquet
  * DSv2" contract, so both access paths produce byte-identical plans. */
private[sources] object GraftRead {
  import scala.jdk.CollectionConverters._

  def pinned(table: String, version: Long,
      passThrough: Map[String, String] = Map.empty): ParquetTable =
    ParquetTable(s"graft:$table", SparkSession.active,
      new CaseInsensitiveStringMap(passThrough.asJava),
      SnapshotTable.filesOf(table, version),
      userSpecifiedSchema = None, classOf[ParquetFileFormat])
}
