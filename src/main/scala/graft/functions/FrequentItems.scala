package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** R46: Misra–Gries heavy-hitter sketch as a native
  * `TypedImperativeAggregate` — the streaming-frequent-items summary
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012). The buffer holds at most `capacity` counters:
  *
  *   update(x): counter exists → +1; room → insert 1;
  *              full → decrement ALL counters, drop zeros (x uncounted)
  *   merge(a,b): sum counters; if over capacity, subtract the
  *              (capacity+1)-th largest count from all, keep positives
  *
  * Guarantee (the only contract callers rely on): any value with true
  * frequency > n/(capacity+1) has a surviving counter, REGARDLESS of
  * partitioning or merge order — total decrement across the stream is
  * bounded by n/(capacity+1). The surviving counter values (and which
  * sub-threshold extras survive) DO depend on merge order, which is why
  * `Relational.heavyHitters` treats the sketch output strictly as a
  * candidate set and re-counts exactly before thresholding: sketch pass →
  * ≤ capacity candidates broadcast → map-only exact count of just those
  * keys → deterministic result.
  *
  * Scale shape: per-partition state is a ≤ capacity-entry hash map
  * (fixed memory however large the partition), partials ship
  * ≤ capacity (key, count) pairs each — the same partial-agg/final-agg
  * plan as any SQL aggregate, no shuffle of raw values.
  */
case class MisraGries(child: Expression, capacity: Int,
    emitCounts: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= 100000,
    s"misra_gries capacity must be in [1, 100000], got $capacity")

  // SQL callers with a non-integral key get an ANALYSIS error instead of
  // a mid-job ClassCastException; integral widths narrower than LONG are
  // widened in update() (review-caught)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires an integral key column, got ${other.sql}")
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(b: mutable.LongMap[Long], input: InternalRow)
      : mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v == null) return b
    val k = v.asInstanceOf[java.lang.Number].longValue
    if (b.contains(k)) { b(k) += 1; b }
    else if (b.size < capacity) { b(k) = 1L; b }
    else decrementAll(b, 1L)
  }

  override def merge(b: mutable.LongMap[Long], o: mutable.LongMap[Long])
      : mutable.LongMap[Long] = MisraGries.mergeMaps(b, o, capacity)

  private def decrementAll(b: mutable.LongMap[Long], by: Long)
      : mutable.LongMap[Long] = MisraGries.decrementAll(b, by)

  /** Candidate keys sorted, or (item, cnt) structs sorted by item when
    * `emitCounts` (the cross-batch streaming state — X16 persists and
    * re-merges the counters). Sorting makes single-partition runs stable;
    * cross-partition candidate sets and counter values are inherently
    * merge-order dependent and must be re-counted — see the scaladoc. */
  override def eval(b: mutable.LongMap[Long]): Any = {
    val keys = b.keys.toArray
    java.util.Arrays.sort(keys)
    if (!emitCounts) new GenericArrayData(keys)
    else new GenericArrayData(keys.map(k =>
      InternalRow(k, b(k)): Any))
  }

  override def serialize(b: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, c) => out.writeLong(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { b(in.readLong()) = in.readLong(); i += 1 }
    b
  }

  override def dataType: DataType =
    if (!emitCounts) ArrayType(LongType, containsNull = false)
    else ArrayType(StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** The mergeable-summaries combine rule, shared by the aggregate's
    * executor-side merge and X16's driver-side cross-batch state merge:
    * sum counters, then subtract the (capacity+1)-th largest and keep
    * positives. */
  def mergeMaps(b: mutable.LongMap[Long], o: mutable.LongMap[Long],
      capacity: Int): mutable.LongMap[Long] = {
    o.foreach { case (k, c) => b(k) = b.getOrElse(k, 0L) + c }
    if (b.size <= capacity) b
    else {
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(b, counts(counts.length - capacity - 1))
    }
  }

  private[functions] def decrementAll(b: mutable.LongMap[Long], by: Long)
      : mutable.LongMap[Long] = {
    val out = mutable.LongMap.empty[Long]
    b.foreach { case (k, c) => if (c > by) out(k) = c - by }
    out
  }

  /** [[mergeMaps]] over plain pairs (the persisted X16 state format). */
  def mergePairs(a: Seq[(Long, Long)], b: Seq[(Long, Long)],
      capacity: Int): Seq[(Long, Long)] = {
    val m = mutable.LongMap.empty[Long]
    a.foreach { case (k, c) => m(k) = m.getOrElse(k, 0L) + c }
    val merged = mergeMaps(m, {
      val o = mutable.LongMap.empty[Long]
      b.foreach { case (k, c) => o(k) = o.getOrElse(k, 0L) + c }
      o
    }, capacity)
    merged.toSeq.sortBy(_._1)
  }
}

object FrequentItems {
  /** Misra–Gries candidate set over a LONG column: array of ≤ capacity
    * keys guaranteed to include every value with frequency >
    * n/(capacity+1). */
  def misraGries(key: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(key), capacity).toAggregateExpression())

  /** As [[misraGries]] but emitting (item, cnt) structs — the mergeable
    * summary X16 persists across micro-batches. */
  def misraGriesCounts(key: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(key), capacity, emitCounts = true)
        .toAggregateExpression())
}
