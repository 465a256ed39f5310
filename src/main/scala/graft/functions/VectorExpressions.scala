package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Top-m centroid ids by cosine, (sim desc, cid asc) — see TopCentroids. */
  def topCentroidsNative(v: Column, centroids: Seq[Array[Double]], m: Int): Column =
    ColumnBridge.column(TopCentroids(ColumnBridge.expression(v), centroids, m))

  /** Two-level top-m: scan `superCents`, descend into the `sprobe` nearest
    * super-cells' member centroids only — see TopCentroidsHier. */
  def topCentroidsHierNative(v: Column, superCents: Seq[Array[Double]],
      members: Seq[Array[Int]], centroids: Seq[Array[Double]],
      sprobe: Int, m: Int): Column =
    ColumnBridge.column(TopCentroidsHier(ColumnBridge.expression(v),
      superCents, members, centroids, sprobe, m))

  /** S15: pack sign bits into longs — see SignPack. */
  def signPackNative(v: Column): Column =
    ColumnBridge.column(SignPack(ColumnBridge.expression(v)))

  /** S15: asymmetric binary dot — float query against packed corpus signs,
    * see SignDot. */
  def signDotNative(q: Column, words: Column): Column =
    ColumnBridge.column(SignDot(ColumnBridge.expression(q), ColumnBridge.expression(words)))

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

/** Top-`m` nearest centroids of a vector by cosine, as an array of centroid
  * ids ordered (sim desc, cid asc). The codebook is a codegen REFERENCE
  * OBJECT, not literal sub-expressions: the earlier formulation built
  * `greatest(struct(cosine(v, lit(c_i)), i) ...)` over every centroid —
  * k×dim literal doubles inlined into the plan, generated-code size (and
  * janino compile time) linear in k, hard-capping practical cell counts.
  * One kernel call keeps plans O(1) in k, which is what lets IVF cell
  * counts follow the sqrt(n) sizing rule (IvfAnn.ivfPlan) instead of
  * staying test-sized. Cosine accumulation order matches CosineSimilarity
  * exactly (ascending i, dot/(sqrt(na)*sqrt(nb))), so SIMILARITIES agree
  * bit-for-bit with the literal formulation this replaces. Tie-break on
  * equal similarity is smallest-cid — deterministic, and the ordering the
  * probe-selection window used; note the old ASSIGNMENT path
  * (`greatest(struct(sim, cid))`) broke ties toward the LARGEST cid, so a
  * zero vector or duplicate centroids may assign to a different (equally
  * near) cell than before. */
case class TopCentroids(child: Expression, centroids: Seq[Array[Double]], m: Int)
    extends UnaryExpression {
  import VectorExpressions._

  require(centroids.nonEmpty, "TopCentroids needs at least one centroid")
  require(m >= 1, s"m must be >= 1, got $m")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topCentroids expects array<float|double>, got ${child.dataType.sql}")

  @transient private lazy val cents: Array[Array[Double]] = centroids.map(_.clone()).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(TopCentroids.top(vToDoubles(v), cents, m))
  }

  private def vToDoubles(v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = get(child.dataType, v, i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", cents, "double[][]")
    val toDouble = child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) => "true"
      case _ => "false"
    }
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("varr")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |double[] $arr = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = $toDouble ? (double) $c.getFloat($i) : $c.getDouble($i);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TopCentroids.top($arr, $cRef, $m));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

object TopCentroids {
  /** Static kernel shared by interpreted + codegen paths: cosine to every
    * centroid, top-m by (sim desc, cid asc) via bounded insertion. */
  def top(v: Array[Double], cents: Array[Array[Double]], m: Int): Array[Int] = {
    val k = cents.length
    val take = math.min(m, k)
    val topSim = new Array[Double](take)
    val topCid = new Array[Int](take)
    var filled = 0
    var c = 0
    while (c < k) {
      val ct = cents(c)
      val n = math.min(v.length, ct.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = v(i); val y = ct(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      val sim = if (d == 0.0) 0.0 else dot / d
      // insertion into the (sim desc, cid asc) top list; strict > keeps the
      // earlier (smaller) cid on ties
      var pos = filled
      while (pos > 0 && sim > topSim(pos - 1)) pos -= 1
      if (pos < take) {
        val last = math.min(filled, take - 1)
        var j = last
        while (j > pos) { topSim(j) = topSim(j - 1); topCid(j) = topCid(j - 1); j -= 1 }
        topSim(pos) = sim
        topCid(pos) = c
        if (filled < take) filled += 1
      }
      c += 1
    }
    java.util.Arrays.copyOf(topCid, filled)
  }
}

/** Two-level (coarse-quantized) variant of [[TopCentroids]], the assignment
  * kernel that keeps IVF viable past ~4096 cells: a flat scan is O(cells)
  * cosine evals PER ROW, so at cells = sqrt(n) the assignment pass itself
  * becomes the 100 TB bottleneck. Here the row is scored against
  * `superCents` (≈ sqrt(cells) of them), and only the member centroids of
  * its `sprobe` nearest super-cells are scanned — O(sqrt(cells)) per row at
  * sprobe ~ const·sqrt(cells)/sqrt(cells). All three tables ride along as
  * codegen reference objects (plan size O(1) in cell count, the
  * TopCentroids rule).
  *
  * Semantics: approximate — the true nearest cell can hide in an unprobed
  * super-cell. EXACTNESS INVARIANT (spec'd): with sprobe >= superCents
  * length every cell is scanned exactly once (membership partitions the
  * codebook), and the explicit (sim desc, cid asc) tie-break makes the
  * result identical to the flat kernel's — the hier path degrades to flat,
  * never to something third. */
case class TopCentroidsHier(child: Expression, superCents: Seq[Array[Double]],
    members: Seq[Array[Int]], centroids: Seq[Array[Double]], sprobe: Int, m: Int)
    extends UnaryExpression {
  import VectorExpressions._

  require(superCents.nonEmpty && centroids.nonEmpty,
    "TopCentroidsHier needs at least one super-centroid and one centroid")
  require(members.length == superCents.length,
    s"members (${members.length}) must align with superCents (${superCents.length})")
  require(sprobe >= 1 && m >= 1, s"sprobe/m must be >= 1, got $sprobe/$m")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topCentroidsHier expects array<float|double>, got ${child.dataType.sql}")

  @transient private lazy val supers: Array[Array[Double]] = superCents.map(_.clone()).toArray
  @transient private lazy val mems: Array[Array[Int]] = members.map(_.clone()).toArray
  @transient private lazy val cents: Array[Array[Double]] = centroids.map(_.clone()).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val arr = new Array[Double](n)
    var i = 0
    while (i < n) { arr(i) = get(child.dataType, v, i); i += 1 }
    new GenericArrayData(TopCentroidsHier.top(arr, supers, mems, cents, sprobe, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("ivfSuperCents", supers, "double[][]")
    val mRef = ctx.addReferenceObj("ivfMembers", mems, "int[][]")
    val cRef = ctx.addReferenceObj("ivfCentroids", cents, "double[][]")
    val toDouble = child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) => "true"
      case _ => "false"
    }
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("varr")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |double[] $arr = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = $toDouble ? (double) $c.getFloat($i) : $c.getDouble($i);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TopCentroidsHier.top($arr, $sRef, $mRef, $cRef, $sprobe, $m));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroidsHier =
    copy(child = newChild)
}

object TopCentroidsHier {
  /** Static kernel shared by interpreted + codegen paths. Member scan order
    * follows the probed super-cells, NOT ascending cid, so the tie-break is
    * explicit (sim desc, cid asc) — this is what makes full-sprobe output
    * identical to [[TopCentroids.top]], whose ascending scan + strict `>`
    * encodes the same ordering implicitly. */
  def top(v: Array[Double], supers: Array[Array[Double]],
      members: Array[Array[Int]], cents: Array[Array[Double]],
      sprobe: Int, m: Int): Array[Int] = {
    val sTop = TopCentroids.top(v, supers, math.min(sprobe, supers.length))
    val take = math.min(m, cents.length)
    val topSim = new Array[Double](take)
    val topCid = new Array[Int](take)
    var filled = 0
    var si = 0
    while (si < sTop.length) {
      val mem = members(sTop(si))
      var mi = 0
      while (mi < mem.length) {
        val cid = mem(mi)
        val ct = cents(cid)
        val n = math.min(v.length, ct.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = v(i); val y = ct(i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val d = math.sqrt(na) * math.sqrt(nb)
        val sim = if (d == 0.0) 0.0 else dot / d
        var pos = filled
        while (pos > 0 && (sim > topSim(pos - 1) ||
            (sim == topSim(pos - 1) && cid < topCid(pos - 1)))) pos -= 1
        if (pos < take) {
          val last = math.min(filled, take - 1)
          var j = last
          while (j > pos) { topSim(j) = topSim(j - 1); topCid(j) = topCid(j - 1); j -= 1 }
          topSim(pos) = sim
          topCid(pos) = cid
          if (filled < take) filled += 1
        }
        mi += 1
      }
      si += 1
    }
    java.util.Arrays.copyOf(topCid, filled)
  }
}

/** S15: 1-bit sign quantization — bit `i & 63` of word `i >> 6` is set iff
  * v(i) > 0. This is the 32×-vs-float32 compression point of the
  * quantization family (dim 64 → ONE long per vector): the packed words are
  * the ONLY corpus payload the binary scan ships, so scan bytes — shuffle,
  * page cache, memory bandwidth — shrink by the same 32×. Strict `> 0`
  * matches the asymmetric scorer ([[SignDot]]) and the recall probes'
  * oracle arithmetic: an exact-copy vector packs to identical words. */
case class SignPack(child: Expression) extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"signPack expects array<float|double>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val words = new Array[Long]((n + 63) >> 6)
    var i = 0
    while (i < n) {
      if (get(child.dataType, v, i) > 0.0) words(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val w = ctx.freshName("words")
      s"""
         |int $n = $c.numElements();
         |long[] $w = new long[($n + 63) >> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (${getter(child.dataType, c, i)} > 0.0) $w[$i >> 6] |= (1L << ($i & 63));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

/** S15: asymmetric binary dot product — the float/double QUERY vector scored
  * against a corpus vector's packed sign words: Σᵢ (bit i set ? qᵢ : −qᵢ).
  * Keeping the query un-quantized is what makes binary quantization usable
  * for search (symmetric Hamming collapses within-cluster order; measured
  * recall@10 0.50 vs 0.88 at the same shortlist on the test corpus). The
  * sum runs in fixed index order — bit-identical on every partitioning. An
  * exact copy of the query maximizes the score at Σ|qᵢ|, so planted-copy
  * structural oracles hold. */
case class SignDot(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && (right.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"signDot expects (array<float|double>, array<bigint>), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]
    val w = r.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), w.numElements() << 6)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = get(left.dataType, q, i)
      sum += (if (((w.getLong(i >> 6) >>> (i & 63)) & 1L) == 1L) x else -x)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, w) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val s = ctx.freshName("sum")
      s"""
         |int $n = Math.min($q.numElements(), $w.numElements() << 6);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(left.dataType, q, i)};
         |  $s += ((($w.getLong($i >> 6) >>> ($i & 63)) & 1L) == 1L) ? $x : -$x;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SignDot =
    copy(left = l, right = r)
}
