package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable

/** R63: R61's stats-driven broadcast law consumed INSIDE the SQL planner —
  * the piece that makes `SELECT ... FROM graft_cat.fact JOIN graft_cat.dim`
  * plan like [[graft.operators.StatsJoin.join]] does, with no hints and no
  * graft classes on the query side.
  *
  * An R57/R58 relation is a manifest-pinned parquet scan: its EXACT file
  * list is already resolved at plan time, so the side's true on-disk bytes
  * are a handful of driver-side `stat` calls — not the estimate Spark's
  * size-based threshold works from, and available even when the session's
  * `autoBroadcastJoinThreshold` is disabled or set conservatively for the
  * non-snapshot tables in the same query. When a join side bottoms out at
  * a graft-pinned relation (through projections/filters, which only shrink
  * it — manifest bytes are a sound upper bound) and those bytes fit the
  * budget, the rule stamps the side's [[HintInfo]] with BROADCAST; the
  * planner then builds the map-side join, and sides it cannot legally
  * build (e.g. the outer side of an outer join) ignore the hint — the
  * rule never changes answers, only strategy.
  *
  * Scale shape: the decision is metadata-only (pinned file list + file
  * sizes, memoized per file list — snapshot data files are immutable, so
  * the cache never staleness-checks). At 100 TB the win is R61's: a dim
  * that the stats PROVE small skips re-clothing the fact across the wire.
  * The NDV/salting half of the R61 law stays with the explicit API — a
  * hint cannot express the salted rewrite — and AQE's runtime skew split
  * (R39) composes with whatever this rule picks.
  *
  * Confs (session-settable, read per apply):
  *   - `spark.graft.statsJoin.enabled` (default true)
  *   - `spark.graft.statsJoin.broadcastBytes` (default 10 MB, Spark's own
  *     autoBroadcast default)
  */
case class StatsJoinRule() extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.statsJoin.enabled", "true").toBoolean

  private def broadcastBytes: Long =
    conf.getConfString("spark.graft.statsJoin.broadcastBytes",
      (10L << 20).toString).toLong

  /** The side's exact pinned bytes, when it bottoms out at a graft
    * manifest-pinned relation through size-shrinking operators only. */
  private def graftBytes(plan: LogicalPlan): Option[Long] = plan match {
    case p: Project       => graftBytes(p.child)
    case f: Filter        => graftBytes(f.child)
    case a: SubqueryAlias => graftBytes(a.child)
    // the post-pushdown form: `experimental.extraOptimizations` (attach)
    // runs after scan building, the extension injection runs before —
    // the rule serves both entry points
    case sr: DataSourceV2ScanRelation => graftBytes(sr.relation)
    case r: DataSourceV2Relation => r.table match {
      case t: ParquetTable if t.name != null && t.name.startsWith("graft:") =>
        Some(StatsJoinRule.bytesOf(t.paths))
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val budget = broadcastBytes
    plan.transform {
      case j @ Join(left, right, _, _, hint)
          // respect explicit strategy hints on either side: a user hint
          // (or a previous pass of this rule) owns the decision
          if hint.leftHint.flatMap(_.strategy).isEmpty &&
            hint.rightHint.flatMap(_.strategy).isEmpty =>
        val lb = graftBytes(left).filter(_ <= budget)
        val rb = graftBytes(right).filter(_ <= budget)
        (lb, rb) match {
          case (None, None) => j
          case _ =>
            // both qualify → broadcast the SMALLER side (one side only:
            // a double broadcast hint would leave the choice ambiguous)
            val pickLeft = lb.isDefined && rb.forall(_ >= lb.get)
            val mark = Some(HintInfo(strategy = Some(BROADCAST)))
            val nh = if (pickLeft) hint.copy(leftHint = mark)
              else hint.copy(rightHint = mark)
            j.copy(hint = nh)
        }
    }
  }
}

object StatsJoinRule {
  /** Idempotently add the rule to an EXISTING session's optimizer (the
    * extension-free path; `GraftExtensions` wires it at construction). */
  def attach(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[StatsJoinRule]))
      spark.experimental.extraOptimizations = cur :+ StatsJoinRule()
  }

  // data files of a published snapshot version are immutable, so a file
  // list's byte total memoizes soundly; bounded LRU like the manifest cache
  private val cacheMax = 1024
  private val cache =
    new java.util.LinkedHashMap[Seq[String], java.lang.Long](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[String], java.lang.Long]): Boolean =
        size() > cacheMax
    }

  private[plans] def bytesOf(paths: Seq[String]): Long = cache.synchronized {
    val hit = cache.get(paths)
    if (hit != null) hit.longValue()
    else {
      val b = paths.map { p =>
        try Files.size(Paths.get(p)) catch { case _: Exception => 0L }
      }.sum
      cache.put(paths, java.lang.Long.valueOf(b))
      b
    }
  }
}
