package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream, DataInputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** R51's build side: a Bloom-filter bitset as a native
  * `TypedImperativeAggregate` — `bloom_bits(key, m, k)` folds an integral
  * column into an m-bit set with k probes per value. The 100 TB shape the
  * driver-side alternative (collect_set of positions) is not: per-partition
  * state is the fixed m/8-byte bitset, partials ship bitsets and merge by
  * OR (associative, commutative, idempotent — merge order can't matter),
  * and the final value is the exact bit-union over however many rows the
  * group holds. Probe positions come from [[BloomAgg.positions]] —
  * XxHash64 over the long key with seeds 1..k — and the QUERY side calls
  * the same function, so build and probe can never drift. */
case class BloomAgg(child: Expression, m: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(m >= 64 && m <= (1 << 28) && (m & (m - 1)) == 0,
    s"bloom m must be a power of two in [64, 2^28], got $m")
  require(k >= 1 && k <= 16, s"bloom k must be in [1, 16], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits requires an integral key column, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return b
    val key = v.asInstanceOf[java.lang.Number].longValue
    var s = 0
    while (s < k) {
      val pos = BloomAgg.position(key, m, s)
      b(pos >>> 6) |= 1L << (pos & 63)
      s += 1
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    val bytes = new Array[Byte](b.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    b.foreach(bb.putLong)
    bytes
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_bits"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomAgg {

  /** Probe position for seed index `s` — m is a power of two, so the mask
    * is exact and the sign never leaks. Shared by build and query. */
  def position(key: Long, m: Int, s: Int): Int =
    (XxHash64Function.hash(key, LongType, s + 1L) & (m - 1)).toInt

  def positions(key: Long, m: Int, k: Int): Seq[Int] =
    (0 until k).map(position(key, m, _))

  /** Membership probe against an [[eval]]-shaped byte image. */
  def mightContain(bits: Array[Byte], m: Int, k: Int, key: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bits)
    positions(key, m, k).forall { pos =>
      (bb.getLong((pos >>> 6) * 8) & (1L << (pos & 63))) != 0
    }
  }

  /** `bloom_bits(key, m, k)` as a Column aggregate. */
  def bloomBits(key: Column, m: Int, k: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(key), m, k).toAggregateExpression())
}
