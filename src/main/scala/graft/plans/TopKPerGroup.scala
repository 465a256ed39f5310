package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator extension demo (SURVEY.md §4 route (c)): top-k rows per
  * group as a first-class plan node.
  *
  * The DataFrame formulation (window rank + filter) must co-locate every row
  * of a group on one partition and sort it fully before discarding all but k
  * rows. This operator executes in TWO phases, mirroring partial/final
  * aggregation: a map-side pass keeps a bounded k-row heap per group per
  * input partition (no shuffle), then one hash shuffle on the group keys
  * moves only the ≤ partitions×k survivors per group to a final merging
  * pass. O(n log k) work, O(groups × k) memory, and shuffle volume bounded
  * by groups×k×partitions instead of n — the shape that survives a 100 TB
  * fact table with millions of groups, or one group holding the whole
  * corpus (the ANN top-k-per-query finish).
  */
object TopK {

  /** Top `k` rows per group, largest `orderCols` first (row_number
    * semantics: exactly k rows per group when available; supply a unique
    * tiebreaker column for determinism).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String], k: Int): DataFrame =
    perGroupOrdered(df, groupCols, orderCols.map(_ -> false), k)

  /** Top `k` rows per group under a per-column ordering spec:
    * `(column, ascending)` — `("cosine", false)` ranks high cosine first,
    * `("neighbor_id", true)` breaks ties on the smaller id. The ordering
    * must be total within a group (include a unique tiebreaker) for the
    * result to be deterministic.
    */
  def perGroupOrdered(df: DataFrame, groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    // experimental strategies attach to any session — no extension jar
    // wiring needed for library users
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val child  = ColumnBridge.logicalPlan(df)
    val groups = groupCols.map(n => ColumnBridge.expression(df(n)))
    val orders = orderSpec.map { case (n, asc) =>
      SortOrder(ColumnBridge.expression(df(n)), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark, TopKPerGroup(groups, orders, k, child))
  }
}

case class TopKPerGroup(
    groupingExpressions: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groups, ordering, k, child) =>
      // partial (map-side, no distribution requirement) under final
      // (clustered) — Spark inserts the one hash shuffle between them
      TopKPerGroupExec(groups, ordering, k, partial = false,
        TopKPerGroupExec(groups, ordering, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupingExpressions: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  /** Final pass co-locates each group on one partition (Spark inserts the
    * single hash shuffle — or none, if the child is already clustered
    * right); the partial pass runs wherever the data already is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupingExpressions) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = groupingExpressions
    val sortOrders = ordering
    val limit      = k
    val childOut   = child.output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOut)
      // rows may arrive as non-Unsafe InternalRows (e.g. out of a broadcast
      // nested-loop join) — normalize before copying into the heap
      val toUnsafe = UnsafeProjection.create(childOut, childOut)
      // codegen'd row comparator for the SortOrder spec
      val cmp = GenerateOrdering.generate(sortOrders, childOut)
      // per-group bounded heap with the WEAKEST kept row at the head (head =
      // maximum of the heap ordering = the row sorting last under the spec)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      val heapOrd: Ordering[UnsafeRow] = (a, b) => cmp.compare(a, b)
      iter.foreach { row =>
        val key  = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          val u = row match { case ur: UnsafeRow => ur; case r => toUnsafe(r) }
          heap.enqueue(u.copy())
        } else if (cmp.compare(row, heap.head) < 0) { // row sorts before current weakest
          heap.dequeue()
          val u = row match { case ur: UnsafeRow => ur; case r => toUnsafe(r) }
          heap.enqueue(u.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach(h => out ++= h.dequeueAll)
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
