package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column⇄Expression converters — the
  * supported pattern for libraries that ship custom Catalyst expressions
  * (the alternative, SparkSessionExtensions + FunctionRegistry, forces
  * SQL-name indirection for what is a plain Scala API here).
  */
object ColumnBridge {
  def column(e: Expression): Column    = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]].logicalPlan

  /** `localCheckpoint(eager = true)` + row count in ONE job. Iterative
    * loops (closure doubling, BFS frontiers, CC rounds) need both the
    * materialized round AND its size for loop control; `Dataset
    * .localCheckpoint(true)` already runs a count internally to force
    * materialization but throws the number away, so a `df.count()` after
    * it pays a second driver round-trip per round. This mirrors the
    * Dataset.checkpoint implementation (execute → copy rows → persist →
    * mark for local checkpoint → count) and returns the count it was
    * going to compute anyway. The returned frame is a [[LogicalRDD]] over
    * the persisted blocks — lineage-truncated exactly like
    * `localCheckpoint`, releasable via [[unpersistCheckpoint]]. */
  def localCheckpointCounted(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Long) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    val internal = ds.queryExecution.executedPlan.execute().map(_.copy())
    internal.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    internal.localCheckpoint()
    val n = internal.count()
    (ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(
      ds.queryExecution.analyzed.output, internal)(spark)), n)
  }

  /** Release the storage behind a `checkpoint`/`localCheckpoint(eager)`'d
    * frame. `Dataset.unpersist` only talks to the CacheManager and cannot
    * reach checkpoint storage; the RDD handle lives inside the `LogicalRDD`
    * the checkpoint rewrote the plan to. Local checkpoints release their
    * block-manager blocks; RELIABLE checkpoints additionally delete their
    * files from the checkpoint filesystem — Spark itself only cleans those
    * via ContextCleaner when `spark.cleaner.referenceTracking
    * .cleanCheckpoints` is set (default false) and only after GC, so an
    * iterative algorithm's superseded rounds would otherwise accumulate
    * rounds × data-set bytes on the shared filesystem. No-op for
    * non-checkpointed frames.
    * CAUTION: a checkpointed frame has truncated lineage — after this call
    * it can never be computed again; only release frames whose consumers
    * are finished (e.g. superseded rounds of an iterative loop). */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    logicalPlan(df) match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
        lr.rdd.getCheckpointFile.foreach { dir =>
          val path = new org.apache.hadoop.fs.Path(dir)
          val conf = df.sparkSession.sparkContext.hadoopConfiguration
          path.getFileSystem(conf).delete(path, true): Unit
        }
      case _ => ()
    }
}
