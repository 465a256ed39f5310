package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for the IVF-PQ composed index (SURVEY §2.3 S6): residual
  * extraction, PQ encoding, and asymmetric-distance (ADC) scoring. Same
  * design rule as [[TopCentroids]]: centroid matrix and PQ codebooks ride
  * along as codegen REFERENCE OBJECTS, so plan size and janino compile time
  * are O(1) in cells × m × k — the column-algebra formulation
  * (ProductQuantizer.bookLit) inlines m×k×subDim literal doubles per use and
  * caps practical codebook sizes (the S5-codebook lesson); at a realistic
  * m=8/k=256 a literal table is ~16k doubles of generated code per
  * expression, past what whole-stage codegen tolerates.
  *
  * All distances are squared L2 on the RESIDUAL r = v − centroid(cid) (the
  * classic IVF-PQ formulation: one shared codebook quantizes residuals
  * across cells, and ‖q−v‖² ≈ ‖r_q − decode(codes_v)‖² within a cell).
  * Accumulation order is ascending element index everywhere, so
  * [[PqKernel.adcScore]] over the table is the SAME sum (grouped by
  * subspace) as a direct scan against the decoded vector —
  * [[IvfPqSpec]] asserts table-lookup ≡ brute-force-over-decoded.
  */
object PqExpressions {

  /** v − centroids(cid), as array<double> (training-path residual frame). */
  def centroidResidual(v: Column, cid: Column, centroids: Seq[Array[Double]]): Column =
    ColumnBridge.column(CentroidResidual(
      ColumnBridge.expression(v), ColumnBridge.expression(cid),
      centroids.map(_.clone()).toArray))

  /** m-element PQ code array of the residual v − centroids(cid): per
    * subspace j, the index of the nearest codeword in books(j) (first index
    * wins ties — identical vectors always code identically). */
  def pqEncode(v: Column, cid: Column, centroids: Seq[Array[Double]],
      books: Seq[Seq[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeResidual(
      ColumnBridge.expression(v), ColumnBridge.expression(cid),
      centroids.map(_.clone()).toArray,
      books.map(_.map(_.clone()).toArray).toArray))

  /** PQ codes of a RAW vector — no cell residual. The S5 scalar path and
    * PQ training assignment: a single zero-length centroid makes
    * [[PqKernel.residual]] the identity, so one kernel serves both the
    * residual (S6) and raw (S5) formulations. */
  def pqEncodeRaw(v: Column, books: Seq[Seq[Array[Double]]]): Column =
    pqEncode(v, org.apache.spark.sql.functions.lit(0),
      Seq(Array.emptyDoubleArray), books)

  /** Flat m×k ADC distance table for query `q` probing cell `cid`:
    * table(j*k + c) = ‖(q − centroids(cid))_j − books(j)(c)‖². Computed once
    * per (query, probed cell); every candidate in the cell is then scored by
    * m array lookups ([[adcScore]]) instead of a dim-length scan. */
  def adcTable(q: Column, cid: Column, centroids: Seq[Array[Double]],
      books: Seq[Seq[Array[Double]]]): Column =
    ColumnBridge.column(AdcTable(
      ColumnBridge.expression(q), ColumnBridge.expression(cid),
      centroids.map(_.clone()).toArray,
      books.map(_.map(_.clone()).toArray).toArray))

  /** Σ_j table(j*k + codes(j)) — the ADC approximation of ‖q − v‖². `m` and
    * `k` are recovered from the array lengths, so the expression needs no
    * shape parameters. */
  def adcScore(table: Column, codes: Column): Column =
    ColumnBridge.column(AdcScore(
      ColumnBridge.expression(table), ColumnBridge.expression(codes)))
}

/** Static kernels shared by the interpreted and codegen paths. */
object PqKernel {

  def residual(v: Array[Double], cent: Array[Double]): Array[Double] = {
    val n = v.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = v(i) - (if (i < cent.length) cent(i) else 0.0)
      i += 1
    }
    out
  }

  /** codes(j) = argmin_c ‖r_j − books(j)(c)‖², first index wins ties. */
  def encode(r: Array[Double], books: Array[Array[Array[Double]]]): Array[Int] = {
    val m = books.length
    val out = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val book = books(j)
      val subDim = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val ct = book(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = (if (off + i < r.length) r(off + i) else 0.0) - ct(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      off += subDim
      j += 1
    }
    out
  }

  /** Flat m×k table of per-subspace squared distances from `r`. */
  def adcTable(r: Array[Double], books: Array[Array[Array[Double]]]): Array[Double] = {
    val m = books.length
    val k = books(0).length
    val out = new Array[Double](m * k)
    var j = 0
    var off = 0
    while (j < m) {
      val book = books(j)
      val subDim = book(0).length
      var c = 0
      while (c < k) {
        val ct = book(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = (if (off + i < r.length) r(off + i) else 0.0) - ct(i)
          d += x * x
          i += 1
        }
        out(j * k + c) = d
        c += 1
      }
      off += subDim
      j += 1
    }
    out
  }

  def adcScore(table: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = table.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      s += table.getDouble(j * k + codes.getInt(j))
      j += 1
    }
    s
  }

  def toDoubles(dt: DataType, v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = VectorExpressions.get(dt, v, i); i += 1 }
    out
  }
}

private[functions] trait PqVecCidExpression extends BinaryExpression {
  import VectorExpressions.isVec

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects (array<float|double>, int), " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")

  protected def vecToDoubleSrc(ctx: CodegenContext, c: String): (String, String) = {
    val arr = ctx.freshName("varr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val toDouble = left.dataType match {
      case ArrayType(FloatType, _) => "true"
      case _                       => "false"
    }
    (arr,
      s"""
         |int $n = $c.numElements();
         |double[] $arr = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = $toDouble ? (double) $c.getFloat($i) : $c.getDouble($i);
         |}
       """.stripMargin)
  }
}

/** v − centroids(cid); out-of-range cid raises (an assignment bug must fail
  * loudly, not quantize against a phantom cell). */
case class CentroidResidual(left: Expression, right: Expression,
    centroids: Array[Array[Double]]) extends PqVecCidExpression {

  require(centroids.nonEmpty, "CentroidResidual needs at least one centroid")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any, cid: Any): Any =
    new GenericArrayData(PqKernel.residual(
      PqKernel.toDoubles(left.dataType, v.asInstanceOf[ArrayData]),
      centroids(cid.asInstanceOf[Int])))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, cid) => {
      val (arr, conv) = vecToDoubleSrc(ctx, v)
      s"""
         |$conv
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqKernel.residual($arr, $cRef[$cid]));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidResidual =
    copy(left = l, right = r)
}

/** PQ codes of the residual v − centroids(cid). */
case class PqEncodeResidual(left: Expression, right: Expression,
    centroids: Array[Array[Double]], books: Array[Array[Array[Double]]])
  extends PqVecCidExpression {

  require(centroids.nonEmpty && books.nonEmpty && books.forall(_.nonEmpty),
    "PqEncodeResidual needs centroids and non-empty codebooks")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any, cid: Any): Any = {
    val r = PqKernel.residual(
      PqKernel.toDoubles(left.dataType, v.asInstanceOf[ArrayData]),
      centroids(cid.asInstanceOf[Int]))
    new GenericArrayData(PqKernel.encode(r, books))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCentroids", centroids, "double[][]")
    val bRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, cid) => {
      val (arr, conv) = vecToDoubleSrc(ctx, v)
      s"""
         |$conv
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqKernel.encode(
         |    graft.functions.PqKernel.residual($arr, $cRef[$cid]), $bRef));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeResidual =
    copy(left = l, right = r)
}

/** Per-(query, probed cell) ADC distance table. */
case class AdcTable(left: Expression, right: Expression,
    centroids: Array[Array[Double]], books: Array[Array[Array[Double]]])
  extends PqVecCidExpression {

  require(centroids.nonEmpty && books.nonEmpty && books.forall(_.nonEmpty),
    "AdcTable needs centroids and non-empty codebooks")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any, cid: Any): Any = {
    val r = PqKernel.residual(
      PqKernel.toDoubles(left.dataType, v.asInstanceOf[ArrayData]),
      centroids(cid.asInstanceOf[Int]))
    new GenericArrayData(PqKernel.adcTable(r, books))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCentroids", centroids, "double[][]")
    val bRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, cid) => {
      val (arr, conv) = vecToDoubleSrc(ctx, v)
      s"""
         |$conv
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqKernel.adcTable(
         |    graft.functions.PqKernel.residual($arr, $cRef[$cid]), $bRef));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcTable =
    copy(left = l, right = r)
}

/** Σ_j table(j*k + codes(j)) — m lookups per candidate, no reference data. */
case class AdcScore(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adcScore expects (array<double>, array<int>), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(table: Any, codes: Any): Any =
    PqKernel.adcScore(table.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.PqKernel.adcScore($t, $c);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
}
