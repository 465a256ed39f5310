package graft.operators

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{col, hash, lit, pmod, unix_micros}

/** R54: partition-aware snapshot commits with HIDDEN-partition pruning and
  * per-commit spec evolution — the Iceberg partitioning model grafted onto
  * the [[SnapshotTable]] manifest log.
  *
  * R42's footer stats prune on VALUE RANGES, which only bite when the
  * layout happens to cluster the predicate column. Partitioning makes the
  * clustering a declared contract: each data file lives under hive-style
  * directories of DERIVED partition values, and the manifest's file paths
  * therefore carry an exact per-file partition tuple — pruning reads paths,
  * not footers. The partitioning is HIDDEN (Iceberg's core fix to hive
  * tables): queries predicate on the SOURCE column (`ts`, `user_id`), never
  * on a synthetic partition column, so a layout change cannot silently
  * break query correctness — only pruning effectiveness. Source columns
  * stay IN the data files (only the derived `__p*` columns are carried by
  * the directory names), so a pinned read of any version needs no partition
  * reconstruction.
  *
  * Transforms (each maps a predicate on the source to a partition bound):
  *   - [[Identity]]: value itself — equality and ranges prune;
  *   - [[Truncate]]: floor to a width-multiple (longs) — ranges prune,
  *     because floor preserves order;
  *   - [[Day]]: UTC epoch-day of a timestamp — timestamp ranges prune (the
  *     literal compares in micros against the day's micro-span);
  *   - [[Bucket]]: murmur3-mod-n — equality/IN prune (hash the literal).
  *
  * SPEC EVOLUTION is per-commit, Iceberg-style: every commit directory
  * records ITS transform list in a `pspec.json` sidecar, so re-partitioning
  * a table is just "future commits use the new spec" — no rewrite of
  * history, and pruning evaluates each file under the spec it was written
  * with. Files of a foreign spec (or none) simply never prune — the
  * conservative polarity R42 established; the residual filter keeps every
  * read exact.
  *
  * Composes with the rest of the format: per-LEAF `stats.json` sidecars are
  * captured at commit time, so R42 min/max skipping works on partitioned
  * files too ([[readPruned]] consults BOTH path tuples and footer ranges);
  * vacuum walks commit dirs recursively; Append/Overwrite/CAS/tags are the
  * shared commit protocol.
  *
  * Scale shape: pruning is a driver-side walk over the manifest's PATHS —
  * zero data I/O, O(files) string work; at 100 TB with daily partitions a
  * one-day dashboard query plans 1/365th of the table before any executor
  * starts, and the bucket transform turns point lookups on a high-card key
  * into single-bucket scans. The write adds one local sort per task (the
  * dynamic-partition insert shape); small-file explosion is bounded by
  * choosing transforms whose cardinality matches the data volume (the same
  * judgment call Iceberg documents), and R41 OPTIMIZE repacks within a
  * partition when ingest dribbles.
  */
object SnapshotPartitions {

  /** One partition transform over a source column. `partCol` is the
    * synthetic hive directory-name column — namespaced per transform kind
    * so evolving `Identity(x)` → `Bucket(x, n)` can never collide. */
  sealed trait Transform {
    def source: String
    def partCol: String
    private[operators] def expr: Column
    private[operators] def kind: String
    private[operators] def param: Long
  }

  final case class Identity(source: String) extends Transform {
    val partCol = s"__p_$source"
    private[operators] def expr: Column = col(source)
    private[operators] def kind = "identity"
    private[operators] def param = 0L
  }

  /** Floor `source` (integral) to a multiple of `width`. */
  final case class Truncate(source: String, width: Long) extends Transform {
    require(width > 0, s"truncate width must be positive: $width")
    val partCol = s"__pt_$source"
    // x - pmod(x, w) floors toward -inf for negatives too (pmod >= 0)
    private[operators] def expr: Column =
      (col(source) - pmod(col(source), lit(width))).cast("long")
    private[operators] def kind = "truncate"
    private[operators] def param = width
  }

  /** murmur3(source) mod `n` — Spark's `hash()`, reproducible driver-side. */
  final case class Bucket(source: String, n: Int) extends Transform {
    require(n > 0, s"bucket count must be positive: $n")
    val partCol = s"__pb_$source"
    private[operators] def expr: Column = pmod(hash(col(source)), lit(n))
    private[operators] def kind = "bucket"
    private[operators] def param = n.toLong
  }

  /** UTC epoch-day of a timestamp column. */
  final case class Day(source: String) extends Transform {
    val partCol = s"__pd_$source"
    private val MicrosPerDay = 86400000000L
    // exact integer floor: (micros - pmod(micros, day)) / day — a double
    // division could mis-bin values near day boundaries past 2^53
    private[operators] def expr: Column =
      ((unix_micros(col(source)) - pmod(unix_micros(col(source)), lit(MicrosPerDay)))
        / MicrosPerDay).cast("long")
    private[operators] def kind = "day"
    private[operators] def param = 0L
  }

  private val MicrosPerDay = 86400000000L
  private val HiveNull = "__HIVE_DEFAULT_PARTITION__"

  // ------------------------------------------------------------ commit

  /** Commit `df` partitioned by `transforms` as the table's next version.
    * Interops freely with [[SnapshotTable.commit]] on the same table (a
    * flat commit just has no spec to prune by). Same CAS/tag semantics. */
  def commit(spark: SparkSession, table: String, df: DataFrame,
      transforms: Seq[Transform], mode: SnapshotTable.Mode = SnapshotTable.Overwrite,
      expectedVersion: Long = Long.MinValue,
      beforePublish: () => Unit = () => (), tag: Option[String] = None): Long = {
    require(transforms.nonEmpty, "partitioned commit needs at least one transform")
    require(transforms.map(_.partCol).distinct.size == transforms.size,
      "duplicate transforms on one source column")
    val (parent, version) = SnapshotTable.nextVersion(table, expectedVersion)
    val commitDir = f"data/c$version%016d-${java.util.UUID.randomUUID()}"
    val partCols = transforms.map(_.partCol)
    val staged = transforms.foldLeft(df) { (d, t) => d.withColumn(t.partCol, t.expr) }
    staged.write.partitionBy(partCols: _*).parquet(s"$table/$commitDir")
    val base = Paths.get(table, commitDir)
    val written = {
      val walk = Files.walk(base)
      try walk.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && n.startsWith("part-") && n.endsWith(".parquet")
        }
        .map(p => base.relativize(p).toString).toSeq.sorted
      finally walk.close()
    }
    // per-LEAF stats sidecars: SnapshotTable.prunedFiles resolves a file's
    // sidecar from its immediate parent dir, so R42 skipping composes
    try {
      // leaves are independent — footer opens were a sequential ~10-30 ms
      // per file on the driver (same fix as SnapshotTable.commit)
      import scala.collection.parallel.CollectionConverters._
      written.groupBy(f => f.take(f.lastIndexOf('/').max(0))).par.foreach {
        case (leaf, fs) =>
          val leafDir = if (leaf.isEmpty) base else base.resolve(leaf)
          SnapshotStats.write(leafDir, fs.map { f =>
            val name = f.split('/').last
            name -> SnapshotStats.fileStats(s"$table/$commitDir/$f")
          })
      }
    } catch { case e: Exception =>
      System.err.println(s"[snapshot] stats capture skipped: $e")
    }
    writeSpec(base, transforms)
    SnapshotTable.publishFiles(table, version, parent, mode,
      written.map(f => s"$commitDir/$f"), beforePublish, tag)
  }

  private def writeSpec(commitDir: Path, transforms: Seq[Transform]): Unit = {
    val root = new java.util.LinkedHashMap[String, Object]()
    val arr = new java.util.ArrayList[Object]()
    for (t <- transforms) {
      val m = new java.util.LinkedHashMap[String, Object]()
      m.put("kind", t.kind)
      m.put("source", t.source)
      m.put("param", java.lang.Long.valueOf(t.param))
      arr.add(m)
    }
    root.put("transforms", arr)
    new ObjectMapper().writeValue(commitDir.resolve("pspec.json").toFile, root)
  }

  /** The transform list a commit directory was written under (empty for
    * flat commits / unreadable specs — those files never prune). */
  private[operators] def loadSpec(commitDir: Path): Seq[Transform] = {
    val p = commitDir.resolve("pspec.json")
    if (!Files.isRegularFile(p)) return Seq.empty
    try {
      val root = new ObjectMapper().readTree(p.toFile)
      root.get("transforms").elements().asScala.flatMap { n =>
        val src = n.get("source").asText()
        n.get("kind").asText() match {
          case "identity" => Some(Identity(src))
          case "truncate" => Some(Truncate(src, n.get("param").asLong()))
          case "bucket" => Some(Bucket(src, n.get("param").asInt()))
          case "day" => Some(Day(src))
          case _ => None // forward-compat: unknown transform = no pruning
        }
      }.toSeq
    } catch { case _: Exception => Seq.empty }
  }

  // ------------------------------------------------------------ pruning

  /** Undo hive path escaping: `%xx` byte sequences only — URLDecoder would
    * also turn a literal `+` into a space, which Spark never encodes, and a
    * corrupted value means WRONG pruning, not conservative pruning. */
  private def unescapeHive(s: String): String = {
    if (!s.contains('%')) return s
    val bytes = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
          i += 3
        } catch { case _: NumberFormatException =>
          bytes.write(s.substring(i, i + 1).getBytes("UTF-8")); i += 1
        }
      } else {
        bytes.write(c.toString.getBytes("UTF-8")); i += 1
      }
    }
    new String(bytes.toByteArray, "UTF-8")
  }

  /** The hive `name=value` tuple encoded in a manifest path, decoded. */
  private def partValues(relToCommit: String): Map[String, String] =
    relToCommit.split('/').dropRight(1).iterator.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) None
      else Some(seg.take(i) -> unescapeHive(seg.drop(i + 1)))
    }.toMap

  /** Source-column ranges implied by a file's partition tuple — fed to the
    * SAME conservative range checker R42 uses ([[SnapshotStats.mayContain]]).
    * Bucket implies no range (handled by [[bucketMayContain]]). */
  private def impliedStats(spec: Seq[Transform],
      vals: Map[String, String]): Map[String, SnapshotStats.ColStats] =
    spec.iterator.flatMap {
      case t @ Identity(src) =>
        vals.get(t.partCol).filter(_ != HiveNull).map { v =>
          // numeric-looking values range as numbers (matches a numeric
          // literal); anything else as the string itself. A string COLUMN
          // whose value happens to parse numerically yields a numeric
          // range that is simply incomparable to string literals — no
          // pruning, still correct.
          val c: Any =
            try new java.math.BigDecimal(v)
            catch { case _: NumberFormatException => v }
          src -> SnapshotStats.ColStats(c, c)
        }
      case t @ Truncate(src, w) =>
        vals.get(t.partCol).filter(_ != HiveNull).flatMap(_.toLongOption).map { v =>
          src -> SnapshotStats.ColStats(
            new java.math.BigDecimal(v),
            new java.math.BigDecimal(v).add(new java.math.BigDecimal(w - 1)))
        }
      case t @ Day(src) =>
        vals.get(t.partCol).filter(_ != HiveNull).flatMap(_.toLongOption).map { d =>
          // timestamp literals reach the checker as Long MICROS — span the
          // day in the same unit
          src -> SnapshotStats.ColStats(
            new java.math.BigDecimal(d * MicrosPerDay),
            new java.math.BigDecimal((d + 1) * MicrosPerDay - 1))
        }
      case _: Bucket => None
    }.toMap

  /** Top-level AND-ed equality constraints (`attr = lit` / IN-lists) of the
    * optimized condition — the only shapes a hash bucket can refute. */
  private def eqConstraints(e: Expression): Seq[(String, Seq[Literal])] = e match {
    case And(l, r) => eqConstraints(l) ++ eqConstraints(r)
    case EqualTo(a: AttributeReference, l: Literal) => Seq(a.name -> Seq(l))
    case EqualTo(l: Literal, a: AttributeReference) => Seq(a.name -> Seq(l))
    case In(a: AttributeReference, elems) if elems.forall(_.isInstanceOf[Literal]) =>
      Seq(a.name -> elems.map(_.asInstanceOf[Literal]))
    case _ => Seq.empty
  }

  /** Could a file in hash-bucket `vals` hold a row satisfying every
    * equality constraint? Refuted only when a constrained source's literal
    * buckets provably elsewhere. */
  private def bucketMayContain(spec: Seq[Transform], vals: Map[String, String],
      cond: Expression): Boolean = {
    val eqs = eqConstraints(cond)
    spec.forall {
      case t @ Bucket(src, n) =>
        vals.get(t.partCol).filter(_ != HiveNull).flatMap(_.toLongOption) match {
          case None => true
          case Some(fileBucket) =>
            eqs.filter(_._1 == src).forall { case (_, lits) =>
              lits.exists { l =>
                if (l.value == null) true
                else {
                  // the literal's bucket under the WRITE-side function:
                  // murmur3 seed 42 (Spark's `hash`), positive mod
                  val h = Murmur3Hash(Seq(l), 42).eval(null).asInstanceOf[Int]
                  ((h % n) + n) % n == fileBucket
                }
              }
            }
        }
      case _ => true
    }
  }

  /** The version's file list split into (kept, skipped) by partition
    * pruning COMPOSED with R42 footer stats: a file survives only if its
    * path tuple AND its footer ranges both admit the predicate. Driver-side
    * metadata only — no data I/O. */
  def prunedFiles(spark: SparkSession, table: String, pred: Column,
      version: Long = -1L): (Seq[String], Seq[String]) = {
    val v = if (version >= 0) version
      else SnapshotTable.latestVersion(table).getOrElse(
        throw new IllegalArgumentException(s"no committed version in $table"))
    val files = SnapshotTable.manifestFiles(table, v)
    // resolve through analyzer + optimizer, as R42 does: typed comparisons
    // with casts folded, or no Filter at all (predicate folded away)
    val cond: Option[Expression] =
      SnapshotTable.read(spark, table, v).filter(pred)
        .queryExecution.optimizedPlan.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }
    // per-commit-dir spec + per-leaf footer stats, each loaded once
    val topOf = (f: String) => f.split('/').take(2).mkString("/")
    val specByTop = files.map(topOf).distinct
      .map(d => d -> loadSpec(Paths.get(table, d))).toMap
    val statsByLeaf = files.map(f => f.take(f.lastIndexOf('/'))).distinct
      .map(d => d -> SnapshotStats.load(Paths.get(table, d, "stats.json"))).toMap
    files.partition { f =>
      cond match {
        case None => true
        case Some(c) =>
          val top = topOf(f)
          val spec = specByTop(top)
          val vals = partValues(f.stripPrefix(top + "/"))
          val leaf = f.take(f.lastIndexOf('/'))
          val name = f.split('/').last
          val footer = statsByLeaf(leaf).getOrElse(name, Map.empty)
          // implied tuple ranges take precedence (exact by construction);
          // footer ranges cover the non-partition columns
          SnapshotStats.mayContain(c, footer ++ impliedStats(spec, vals)) &&
            bucketMayContain(spec, vals, c)
      }
    }
  }

  /** R54 × R41: OPTIMIZE that PRESERVES the partition layout — plain
    * [[SnapshotTable.optimize]] rewrites through a flat commit, which
    * silently demotes a partitioned table to unprunable on the optimized
    * version (content identical, pruning gone). This variant re-commits
    * the pinned read through the partitioned writer under `transforms`
    * (default: the spec of the LATEST partitioned commit), bin-packing the
    * scan side, so dribbled ingest compacts INTO the layout instead of out
    * of it. Also the re-partitioning migration tool: pass a new spec and
    * the whole table rewrites under it in one atomic, CAS-guarded commit. */
  def optimize(spark: SparkSession, table: String,
      transforms: Seq[Transform] = Seq.empty,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val v = SnapshotTable.latestVersion(table).getOrElse(
      throw new IllegalArgumentException(s"no committed version in $table"))
    val spec =
      if (transforms.nonEmpty) transforms
      else SnapshotTable.manifestFiles(table, v)
        .map(f => f.split('/').take(2).mkString("/")).distinct.reverse
        .map(d => loadSpec(Paths.get(table, d))).find(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(
          s"$table has no partitioned commit to take a spec from; pass transforms"))
    Compaction.withBinPackedScan(spark, targetBytes) {
      commit(spark, table, SnapshotTable.read(spark, table, v), spec,
        expectedVersion = v)
    }
  }

  /** Read with partition + stats pruning, `pred` re-applied as the exact
    * residual filter. */
  def readPruned(spark: SparkSession, table: String, pred: Column,
      version: Long = -1L): DataFrame = {
    val (kept, _) = prunedFiles(spark, table, pred, version)
    val scan =
      if (kept.isEmpty) SnapshotTable.read(spark, table, version).limit(0)
      else spark.read.parquet(kept.map(f => s"$table/$f"): _*)
    scan.filter(pred)
  }
}
