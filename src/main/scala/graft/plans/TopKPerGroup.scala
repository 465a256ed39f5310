package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator extension demo (SURVEY.md §4 route (c)): top-k rows per
  * group as a first-class plan node.
  *
  * The DataFrame formulation (window rank + filter) must sort every
  * partition fully before discarding all but k rows. This operator keeps a
  * bounded heap per group instead: one shuffle on the group keys, O(n log k)
  * per partition, O(groups × k) memory — the shape that survives a 100 TB
  * fact table with millions of groups.
  */
object TopK {

  /** Top `k` rows per group, largest `orderCols` first (row_number
    * semantics: exactly k rows per group when available; supply a unique
    * tiebreaker column for determinism).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    // experimental strategies attach to any session — no extension jar
    // wiring needed for library users
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val child  = ColumnBridge.logicalPlan(df)
    val groups = groupCols.map(n => ColumnBridge.expression(df(n)))
    val orders = orderCols.map(n => SortOrder(ColumnBridge.expression(df(n)),
      org.apache.spark.sql.catalyst.expressions.Descending))
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
      TopKPerGroupExec(groups, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupingExpressions: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Co-locate each group on one partition; Spark inserts the (single)
    * hash shuffle — or none, if the child is already clustered right. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupingExpressions) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = groupingExpressions
    val sortOrders = ordering
    val limit      = k
    val childOut   = child.output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOut)
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
        if (heap.size < limit) heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        else if (cmp.compare(row, heap.head) < 0) { // row sorts before current weakest
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
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
