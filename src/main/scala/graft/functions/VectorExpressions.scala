package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels (see NativeExpressions for why: Spark's
  * higher-order functions evaluate interpreted; a cosine join scoring
  * millions of candidate pairs needs a primitive loop, not boxed folds).
  * Both float and double element types are supported without conversion.
  */
object VectorExpressions {
  def cosineNative(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hyperplaneBucketNative(v: Column, bits: Int, dim: Int, seed: Int): Column =
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(v), bits, dim, seed))

  private[functions] def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  private[functions] def getter(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }

  private[functions] def get(dt: DataType, arr: ArrayData, i: Int): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }
}

/** Cosine similarity of two vectors; 0.0 when either norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine expects array<float|double>, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(left.dataType, a, i)
      val y = get(right.dataType, b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na  = ctx.freshName("na")
      val nb  = ctx.freshName("nb")
      val x   = ctx.freshName("x")
      val y   = ctx.freshName("y")
      val d   = ctx.freshName("d")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(left.dataType, a, i)};
         |  double $y = ${getter(right.dataType, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $d = Math.sqrt($na) * Math.sqrt($nb);
         |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket: bit p = sign(w_p · v), planes drawn from a
  * seeded gaussian at plan time (identical on every executor/run). */
case class HyperplaneBucket(child: Expression, bits: Int, dim: Int, seed: Int)
    extends UnaryExpression {
  import VectorExpressions._

  // flat [bits × dim] weight matrix — plan-time constant shipped once per task
  private lazy val weights: Array[Double] = {
    val w = new Array[Double](bits * dim)
    for (p <- 0 until bits) {
      val rng = new scala.util.Random(seed.toLong * 1000003L + p)
      for (j <- 0 until dim) w(p * dim + j) = rng.nextGaussian()
    }
    w
  }

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplaneBucket expects array<float|double>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var bucket = 0
    var p = 0
    while (p < bits) {
      var proj = 0.0
      var j = 0
      while (j < n) {
        proj += weights(p * dim + j) * get(child.dataType, v, j)
        j += 1
      }
      if (proj >= 0.0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hyperplaneW", weights, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n      = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val p      = ctx.freshName("p")
      val j      = ctx.freshName("j")
      val proj   = ctx.freshName("proj")
      s"""
         |int $n = Math.min($dim, $v.numElements());
         |int $bucket = 0;
         |for (int $p = 0; $p < $bits; $p++) {
         |  double $proj = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $proj += $wRef[$p * $dim + $j] * ${getter(child.dataType, v, j)};
         |  }
         |  if ($proj >= 0.0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}
