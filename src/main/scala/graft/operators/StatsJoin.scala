package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R61: statistics-driven join planning over [[SnapshotTable]]s — the CBO
  * consumption side of R60's ANALYZE sidecars. Every warehouse makes this
  * decision (Spark's own CBO, Delta's stats-informed broadcast, Trino's
  * stats-based reordering); here it is an explicit, testable law over the
  * two metadata surfaces the format already maintains:
  *
  *   - BYTES from the manifest: the pinned version's file list, sizes
  *     read driver-side — no data I/O, exact, always available.
  *   - KEY NDV from the `_analyze` sidecar (R60): zero data I/O when the
  *     version was analyzed; absent stats degrade the plan, never the
  *     answer.
  *
  * Strategy law (priority order), applied at PLAN time on the driver:
  *
  *   1. BROADCAST the smaller side when its bytes ≤ `broadcastBytes`
  *      (default 10 MB, Spark's own autoBroadcast default). Kills the
  *      shuffle of the big side entirely — at 100 TB the difference
  *      between a map-side join and re-clothing the whole table.
  *   2. SALT when the join key's NDV (bigger side) is BELOW the shuffle
  *      parallelism target: a shuffle on a low-cardinality key can keep
  *      at most NDV reducers busy however many executors exist, so the
  *      R16 salted shape (big side salted mod `salts`, small side
  *      exploded ×salts) restores parallelism. NDV is the honest sidecar
  *      signal for THIS pathology (it is an avg-parallelism law, not a
  *      hot-key detector — runtime hot keys are AQE skew-join's job, R39,
  *      which composes with every strategy here).
  *   3. SHUFFLE otherwise — hash-partitioned equi-join, AQE re-planning
  *      at runtime.
  *
  * The decision is returned WITH the frame so callers (and the r61 gate)
  * can assert what was chosen and why; the answer is strategy-invariant
  * by construction.
  */
object StatsJoin {

  sealed trait Strategy
  case object BroadcastLeft extends Strategy
  case object BroadcastRight extends Strategy
  case class Salted(salts: Int) extends Strategy
  case object Shuffle extends Strategy

  /** Plan-time facts about one side, from metadata only. */
  final case class SideStats(rows: Option[Long], bytes: Long, keyNdv: Option[Long])

  /** Manifest + sidecar stats of `table`'s pinned `version` for join key
    * `key`. Bytes come from the manifest's file list (driver-side size
    * lookups, zero data I/O); rows/NDV from the R60 `_analyze` sidecar
    * when present (None otherwise — callers degrade gracefully). */
  def sideStats(spark: SparkSession, table: String, key: String,
      version: Long = -1L): SideStats = {
    // filesOf already returns table-prefixed paths
    val bytes = SnapshotTable.filesOf(table, version)
      .map(f => try Files.size(Paths.get(f)) catch { case _: Exception => 0L })
      .sum
    val prof = SnapshotAnalyze.readProfile(spark, table, version)
      .map(_.filter(col("column") === key).collect())
      .flatMap(_.headOption)
    SideStats(prof.map(_.getLong(1)), bytes, prof.map(_.getLong(3)))
  }

  /** The strategy law. `parallelism` defaults to the session's shuffle
    * partitions — the resource the NDV must cover for a plain shuffle to
    * use the cluster. */
  def choose(left: SideStats, right: SideStats,
      broadcastBytes: Long = 10L << 20, parallelism: Int = 0,
      spark: SparkSession = null): Strategy = {
    // lazy: the parallelism target only matters on the shuffle path, so a
    // metadata-only caller whose sides fit the broadcast budget may omit
    // both parallelism and the session; the shuffle path demands one of
    // them with a real message instead of an NPE
    lazy val par = if (parallelism > 0) parallelism
      else {
        require(spark != null,
          "StatsJoin.choose: neither side fits the broadcast budget, so a " +
            "shuffle-parallelism target is needed — pass parallelism > 0 " +
            "or a SparkSession to read spark.sql.shuffle.partitions from")
        spark.sessionState.conf.numShufflePartitions
      }
    if (left.bytes <= broadcastBytes || right.bytes <= broadcastBytes) {
      if (left.bytes <= right.bytes) BroadcastLeft else BroadcastRight
    } else {
      // NDV of the join key on the BIGGER side caps shuffle parallelism;
      // unknown NDV (no sidecar) means no salt — plain shuffle + AQE.
      val bigNdv = if (left.bytes >= right.bytes) left.keyNdv else right.keyNdv
      bigNdv match {
        case Some(ndv) if ndv > 0 && ndv < par =>
          // enough salt to cover the parallelism target, bounded: the
          // small side is replicated ×salts, so salts stays modest
          Salted(math.min(64, math.max(2, (par / ndv).toInt + 1)))
        case _ => Shuffle
      }
    }
  }

  /** Inner equi-join of two snapshot tables on `key`, strategy picked by
    * [[choose]] from metadata alone and returned alongside the frame. */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, broadcastBytes: Long = 10L << 20, parallelism: Int = 0,
      leftVersion: Long = -1L, rightVersion: Long = -1L): (Strategy, DataFrame) = {
    val ls = sideStats(spark, leftTable, key, leftVersion)
    val rs = sideStats(spark, rightTable, key, rightVersion)
    val l = SnapshotTable.read(spark, leftTable, leftVersion)
    val r = SnapshotTable.read(spark, rightTable, rightVersion)
    val strat = choose(ls, rs, broadcastBytes, parallelism, spark)
    val joined = strat match {
      case BroadcastLeft  => broadcast(l).join(r, key)
      case BroadcastRight => l.join(broadcast(r), key)
      case Salted(salts) =>
        // R16 shape, big side salted: pick by bytes like choose() did
        if (ls.bytes >= rs.bytes) SkewJoin.saltedJoin(l, r, key, salts)
        else SkewJoin.saltedJoin(r, l, key, salts)
      case Shuffle =>
        // pin the no-hint path: Catalyst may still pick its own broadcast
        // from its size estimates; MERGE forces the shuffled shape the
        // stats said we need (deterministic for the plan asserts)
        l.hint("merge").join(r, key)
    }
    (strat, joined)
  }
}
