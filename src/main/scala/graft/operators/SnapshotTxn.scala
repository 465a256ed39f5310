package graft.operators

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** R50: atomic CROSS-TABLE transactions over [[SnapshotTable]]s — the layer
  * `commitAll` explicitly is not. A transaction stages ordinary per-table
  * commits (each atomic on its own) and then publishes ONE txn manifest
  * pinning every member table to the exact version the transaction wrote.
  * Readers resolve versions only through txn manifests, so they observe
  * whole transactions: a writer crashing after some table commits but
  * before the txn publish leaves those versions dark (unreferenced, never
  * read, vacuumable), and a racing reader keeps resolving the previous txn
  * — never a mix of old and new tables.
  *
  * This is the multi-table commit discipline of the lakehouse formats
  * (Delta's single-log limitation is exactly why its users ask for this):
  * X12/X13 approximated it with version-aligned cuts and shared tags; R50
  * makes the cut a first-class, CAS-able, time-travelable object.
  *
  * Layout: member tables live at `root/<name>` as ordinary snapshot
  * tables; txn manifests at `root/_txnlog/t%016d.json` hold
  * `{"txn":n,"parent":p,"tag":...,"tables":{"name":version,...}}` and
  * publish with the same write-temp + hard-link publish-if-absent protocol
  * as table manifests (atomic on POSIX local/NFS/HDFS-style semantics).
  *
  * Scale: a txn manifest is O(tables) bytes regardless of data size; the
  * data cost is the member commits themselves, which run concurrently.
  * Readers pay one tiny JSON read to pin an arbitrary number of tables.
  */
object SnapshotTxn {

  private def logDir(root: String): Path = Paths.get(root, "_txnlog")
  private def txnPath(root: String, t: Long): Path =
    logDir(root).resolve(f"t$t%016d.json")

  /** All published txn ids, ascending. */
  def txns(root: String): Seq[Long] = {
    val d = logDir(root)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("t") && n.endsWith(".json") =>
          n.stripPrefix("t").stripSuffix(".json").toLong }
        .toSeq.sorted
    } finally s.close()
  }

  def latestTxn(root: String): Option[Long] = txns(root).lastOption

  /** The (table → version) map a txn pinned (default: latest). */
  def tableVersions(root: String, txn: Long = -1L): Map[String, Long] = {
    val t = if (txn >= 0) txn else latestTxn(root).getOrElse(
      throw new IllegalArgumentException(s"no committed txn under $root"))
    val json = new String(Files.readAllBytes(txnPath(root, t)), "UTF-8")
    val tables = "\"tables\"\\s*:\\s*\\{([^}]*)\\}".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    "\"([^\"]+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(tables)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  /** The idempotency tag a txn was published with, if any. */
  def tagOf(root: String, txn: Long = -1L): Option[String] = {
    val t = if (txn >= 0) txn else latestTxn(root).getOrElse(return None)
    if (!Files.exists(txnPath(root, t))) return None
    val json = new String(Files.readAllBytes(txnPath(root, t)), "UTF-8")
    "\"tag\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(json).map(_.group(1))
  }

  /** Whether any published txn carries `tag` — the replay check (X13's
    * `hasTag`, lifted to the transaction). */
  def hasTag(root: String, tag: String): Boolean =
    txns(root).reverseIterator.exists(t => tagOf(root, t).contains(tag))

  /** Commit `pairs` as ONE transaction: member tables commit concurrently
    * (atomic each), then a single txn manifest publishes the whole cut.
    * `expectedTxn` CASes on the parent txn (-1 = require a fresh log);
    * `tag` makes the commit replay-idempotent: if a txn with this tag is
    * already published, NOTHING is staged and its txn id returns — the
    * at-least-once streaming/retry discipline. `beforePublish` is the
    * crash-injection window between the member commits and the txn
    * publish. Returns the txn id. */
  def commit(spark: SparkSession, root: String, pairs: Seq[(String, DataFrame)],
      mode: SnapshotTable.Mode = SnapshotTable.Overwrite,
      expectedTxn: Long = Long.MinValue, tag: Option[String] = None,
      beforePublish: () => Unit = () => ()): Long = {
    val replayed = tag.flatMap { tg =>
      require(!tg.contains("\"") && !tg.contains("\\"),
        s"""tag must not contain '"' or '\\': $tg""")
      txns(root).reverseIterator.find(t => tagOf(root, t).contains(tg))
    }
    if (replayed.isDefined) return replayed.get // already fully published
    val parent = latestTxn(root)
    if (expectedTxn != Long.MinValue && parent.getOrElse(-1L) != expectedTxn)
      throw new SnapshotTable.ConcurrentCommitException(parent.getOrElse(-1L))
    val txn = parent.getOrElse(0L) + 1
    // 1. stage member commits concurrently — published per-table but dark
    //    until the txn manifest names them
    val versions: Seq[(String, Long)] = {
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(math.max(1, pairs.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(pairs.map { case (name, df) =>
        require(!name.contains("/") && !name.contains("\""),
          s"table name must be a simple identifier: $name")
        // txn-level Append must append onto the LAST PUBLISHED CUT, not the
        // per-table latest: a crashed attempt leaves a DARK version whose
        // file list already contains its batch — plain Append on replay
        // would carry those files AND write the batch again, doubling it.
        // Replace(base files of the published cut) is immune by
        // construction; Overwrite/Replace pass through untouched.
        val effMode = mode match {
          case SnapshotTable.Append =>
            SnapshotTable.Replace(
              parent.flatMap(p => tableVersions(root, p).get(name))
                .map(v => SnapshotTable.manifestFiles(s"$root/$name", v))
                .getOrElse(Seq.empty))
          case other => other
        }
        Future(name -> SnapshotTable.commit(spark, s"$root/$name", df, mode = effMode))
      }), Duration.Inf)
      finally pool.shutdown()
    }
    // carry forward tables the txn did not touch — a reader of txn n must
    // be able to resolve EVERY table the log has ever pinned
    val carried = parent.map(tableVersions(root, _)).getOrElse(Map.empty)
    val all = (carried ++ versions.toMap).toSeq.sortBy(_._1)
    // 2. one txn manifest names the whole cut
    Files.createDirectories(logDir(root))
    val tmp = logDir(root).resolve(s".tmp-${java.util.UUID.randomUUID()}.json")
    val tagField = tag.map(t => s""""tag":"$t",""").getOrElse("")
    val body = all.map { case (n, v) => s""""$n":$v""" }.mkString(
      s"""{"txn":$txn,"parent":${parent.getOrElse(-1L)},$tagField"tables":{""",
      ",", "}}")
    Files.write(tmp, body.getBytes("UTF-8"))
    beforePublish()
    try {
      Files.createLink(txnPath(root, txn), tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new SnapshotTable.ConcurrentCommitException(txn)
    }
    txn
  }

  /** The minimum version of `table` that any published txn still pins.
    * [[SnapshotTable.vacuum]] on a MEMBER table must keep from at most
    * this version — per-table vacuuming below it would delete files a
    * retained txn cut still resolves to. (Txn manifests are the source of
    * truth for liveness here, exactly like table manifests are for files.) */
  def minPinnedVersion(root: String, table: String): Option[Long] = {
    val pinned = txns(root).flatMap(t => tableVersions(root, t).get(table))
    if (pinned.isEmpty) None else Some(pinned.min)
  }

  /** Read `table` at the version `txn` pinned (default: latest txn). The
    * returned plan scans exactly that version's files — immutable under
    * later txns, so a job reading many tables from one pinned txn gets a
    * consistent cut for its whole lifetime. */
  def readAt(spark: SparkSession, root: String, table: String,
      txn: Long = -1L): DataFrame = {
    val vs = tableVersions(root, txn)
    val v = vs.getOrElse(table, throw new IllegalArgumentException(
      s"table $table is not pinned by txn ${if (txn >= 0) txn else "latest"} " +
        s"(pinned: ${vs.keys.toSeq.sorted.mkString(", ")})"))
    SnapshotTable.read(spark, s"$root/$table", v)
  }
}
