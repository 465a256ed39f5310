package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the signature kernels.
  *
  * The higher-order-function formulations (`transform`/`aggregate`) are
  * evaluated interpreted — every arithmetic op is a boxed `Expression.eval`
  * — which made the 64-permutation MinHash fold the bench bottleneck
  * (~45 ms/row at sf0.1). These expressions implement `doGenCode`, so the
  * whole kernel compiles into the surrounding WholeStageCodegen stage as one
  * primitive long-array loop: one pass over the shingle array updating all
  * permutation minima in registers/L1.
  */
object NativeExpressions {
  val MinhashPrime: Long = 2147483647L // 2^31-1; a*h stays < 2^62 (no overflow)

  /** Deterministic permutation constants — same values on every executor,
    * every run (plan-time constants, like the reference's fixed hash family). */
  def permutationConstants(numHashes: Int): (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(0x5eed5eedL)
    val a = Array.fill(numHashes)(1L + rng.nextLong(MinhashPrime - 1))
    val b = Array.fill(numHashes)(rng.nextLong(MinhashPrime))
    (a, b)
  }

  /** Column API: MinHash signature over a pre-hashed shingle array. */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingleHashes), numHashes))

  /** Column API: 64-bit SimHash over a token-hash array. */
  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  /** Column API: polynomial rolling fingerprint of a string. */
  def polyFingerprint(text: Column): Column =
    ColumnBridge.column(PolyFingerprint(ColumnBridge.expression(text)))

  /** Column API: k-word shingle hashes over a token array. */
  def wordShingleHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expression(tokens), k))

  /** Column API: fraction of positions where two long arrays agree. */
  def arrayAgreement(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayAgreement(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: |A ∩ B| of two ASCENDING-SORTED array<long> set columns. */
  def sortedOverlapCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedOverlapCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: LSH band hashes (length `bands`) over a minhash signature. */
  def bandHashes(sig: Column, bands: Int): Column =
    ColumnBridge.column(BandHashes(ColumnBridge.expression(sig), bands))

  /** Column API: Unicode NFC canonical composition of a string. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  // T26 / D15 as CONCRETE catalyst trees — one formulation serving both
  // the Column API (wrapped by TextAnalysis.normalizeText /
  // Urls.canonicalizeUrl) and the SQL registry (GraftFunctions), which
  // cannot accept unresolved Column-API function nodes.

  import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, ArrayJoin,
    ArraySort, CaseWhen, Concat, EqualTo, Expression, GreaterThan, If,
    LambdaFunction, Literal, Lower, NamedLambdaVariable, Not, RegExpExtract,
    RegExpReplace, RLike, Size, StringSplit, StringTrim}
  import org.apache.spark.sql.types.StringType

  private def rr(e: Expression, p: String, r: String): Expression =
    RegExpReplace(e, Literal(p), Literal(r))
  private def rx(e: Expression, p: String, i: Int): Expression =
    RegExpExtract(e, Literal(p), Literal(i))

  /** The T26 normalization chain (see `TextAnalysis.normalizeText` for the
    * step contract) over a string expression. */
  def normalizeTextExpr(child: Expression): Expression =
    StringTrim(rr(rr(rr(rr(rr(rr(NfcNormalize(child),
      "\\r\\n|\\r", "\n"),
      "[\\x{200B}-\\x{200D}\\x{FEFF}\\x{00AD}]", ""),
      "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]", ""),
      "[ \\t]+", " "),
      " ?\\n ?", "\n"),
      "\\n{3,}", "\n\n"))

  /** T27 profile detection over a string expression (see
    * `TextAnalysis.textProfile` for the presence law). */
  def textProfileExpr(child: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.And
    val j = RLike(child, Literal(graft.operators.TextAnalysis.JoiningScriptRe))
    val c = RLike(child, Literal(graft.operators.TextAnalysis.CjkRe))
    CaseWhen(Seq(
      (And(j, c), Literal("joining+cjk")),
      (j, Literal("joining")),
      (c, Literal("cjk"))),
      Some(Literal("latin")))
  }

  /** The T27 multilingual normalization chain (see
    * `TextAnalysis.normalizeTextMultilingual` for the step contract) over
    * a string expression — T26 with the invisible-strip and width steps
    * switched on the presence flags. */
  def normalizeTextMlExpr(child: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.StringTranslate
    val j = RLike(child, Literal(graft.operators.TextAnalysis.JoiningScriptRe))
    val c = RLike(child, Literal(graft.operators.TextAnalysis.CjkRe))
    val nl = rr(NfcNormalize(child), "\\r\\n|\\r", "\n")
    val inv = CaseWhen(
      Seq((j, rr(nl, "[\\x{200B}\\x{FEFF}\\x{00AD}]", ""))),
      Some(rr(nl, "[\\x{200B}-\\x{200D}\\x{FEFF}\\x{00AD}]", "")))
    val wide = CaseWhen(
      Seq((c, StringTranslate(inv,
        Literal(graft.operators.TextAnalysis.FullwidthFrom),
        Literal(graft.operators.TextAnalysis.HalfwidthTo)))),
      Some(inv))
    StringTrim(rr(rr(rr(rr(wide,
      "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]", ""),
      "[ \\t]+", " "),
      " ?\\n ?", "\n"),
      "\\n{3,}", "\n\n"))
  }

  /** The D15 canonical-URL algebra (see `Urls.canonicalizeUrl` for the
    * step contract) over a string expression. */
  def canonicalizeUrlExpr(url: Expression): Expression = {
    val scheme   = Lower(rx(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val after    = rr(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = Lower(rx(after, "^([^/?#]*)", 1))
    val noPort = CaseWhen(Seq(
      (EqualTo(scheme, Literal("http")), rr(hostport, ":80$", "")),
      (EqualTo(scheme, Literal("https")), rr(hostport, ":443$", ""))),
      Some(hostport))
    val host   = rr(noPort, "^www\\.", "")
    val pathQF = rx(after, "^[^/?#]*(.*)$", 1)
    val noFrag = rr(pathQF, "#.*$", "")
    val path0  = rx(noFrag, "^([^?]*)", 1)
    val path = If(EqualTo(path0, Literal("")), Literal("/"),
      rr(path0, "(.)/$", "$1"))
    val query = rx(noFrag, "\\?(.*)$", 1)
    val lv = NamedLambdaVariable("p", StringType, nullable = true)
    val keep = LambdaFunction(
      Not(org.apache.spark.sql.catalyst.expressions.Or(
        EqualTo(lv, Literal("")),
        RLike(lv, Literal(s"^(${graft.operators.Urls.TrackingParams})=")))),
      Seq(lv))
    val params = ArraySort(ArrayFilter(
      StringSplit(query, Literal("&"), Literal(-1)), keep),
      ArraySort.defaultComparator)
    val queryPart = If(GreaterThan(Size(params), Literal(0)),
      Concat(Seq(Literal("?"), ArrayJoin(params, Literal("&"), None))),
      Literal(""))
    Concat(Seq(scheme, Literal("://"), host, path, queryPart))
  }
}

/** array<long> minhash signature → array<long> of `bands` band hashes: the
  * signature is cut into `bands` contiguous slices and each slice is mixed
  * (FNV-1a seeded with the band index) into one long. Semantically any
  * deterministic function of the slice works — two rows share a band bucket
  * iff the slice VALUES are equal (modulo a 2^-64 mix collision) — so this
  * replaces the previous 16-column `xxhash64(element_at...)` projection,
  * whose unrolled generated code was a measurable share of the operator's
  * one-time janino compile cost, with one short loop. */
case class BandHashes(child: Expression, bands: Int) extends UnaryExpression {
  require(bands >= 1, s"bands must be >= 1, got $bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == ArrayType(LongType, false) || child.dataType == ArrayType(LongType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bandHashes expects array<bigint>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val arr  = input.asInstanceOf[ArrayData]
    val rows = arr.numElements() / bands
    val out  = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = -3750763034362895579L ^ b // FNV-1a offset basis, band-seeded
      var j = 0
      while (j < rows) {
        h = (h ^ arr.getLong(b * rows + j)) * 1099511628211L
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rows = ctx.freshName("rows")
      val out  = ctx.freshName("out")
      val b    = ctx.freshName("b")
      val j    = ctx.freshName("j")
      val h    = ctx.freshName("h")
      s"""
         |int $rows = $c.numElements() / $bands;
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = -3750763034362895579L ^ $b;
         |  for (int $j = 0; $j < $rows; $j++) {
         |    $h = ($h ^ $c.getLong($b * $rows + $j)) * 1099511628211L;
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

/** Set-intersection size of two ascending-sorted array<long> columns in one
  * merge walk — no per-pair hash set or intermediate array. The
  * `array_intersect`/`array_union` formulation of exact-Jaccard verification
  * built TWO fresh arrays (plus a hash set) per candidate pair; with ~1.4M
  * candidates at sf0.1 that allocation was the dominant cost of the verify
  * join. Inputs MUST be sorted ascending and duplicate-free (set semantics)
  * — `Dedup.shingleSets` stages them exactly so. */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes() = {
    def ok(dt: DataType) = dt == ArrayType(LongType, false) || dt == ArrayType(LongType, true)
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sortedOverlapCount expects array<bigint>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var ov = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { ov += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    ov
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i  = ctx.freshName("i")
      val j  = ctx.freshName("j")
      val ov = ctx.freshName("ov")
      val x  = ctx.freshName("x")
      val y  = ctx.freshName("y")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $ov = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $ov++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $ov;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedOverlapCount =
    copy(left = l, right = r)
}

/** Fraction of equal positions between two array<long> columns (the MinHash
  * Jaccard estimator). The `zip_with` + `aggregate` HOF formulation
  * evaluated interpreted per candidate pair; this is one primitive loop. */
case class ArrayAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes() = {
    def ok(dt: DataType) = dt == ArrayType(LongType, false) || dt == ArrayType(LongType, true)
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"arrayAgreement expects array<bigint>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) 0.0
    else {
      var eq = 0
      var i = 0
      while (i < n) {
        if (a.getLong(i) == b.getLong(i)) eq += 1
        i += 1
      }
      eq.toDouble / n
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n  = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      val i  = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = ($n == 0) ? 0.0 : ((double) $eq) / $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayAgreement =
    copy(left = l, right = r)
}

/** array<string> tokens → array<long> k-shingle hashes: xxhash64 each token
  * once, then combine each k-window with an FNV-style mix. Replaces the
  * `transform(sequence(...), i -> xxhash64(concat_ws(slice(...))))` HOF
  * formulation, which evaluated interpreted and built a concatenated STRING
  * per shingle per row — this is two primitive loops, no string allocation.
  * Fewer than k tokens → one hash of the whole token list (same convention
  * as the HOF version: every document gets ≥1 shingle).
  * Hash VALUES differ from the old formulation by design — every consumer
  * (MinHash, Jaccard counts, dedup) only needs set semantics, not specific
  * hash values. */
case class WordShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wordShingleHashes expects array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n   = arr.numElements()
    val tok = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      tok(i) = if (s == null) 0L
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          s, org.apache.spark.sql.types.StringType, 42L)
      i += 1
    }
    if (n < k) {
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      var j = 0
      while (j < n) { h = (h ^ tok(j)) * 1099511628211L; j += 1 }
      new GenericArrayData(Array(h))
    } else {
      val out = new Array[Long](n - k + 1)
      var w = 0
      while (w <= n - k) {
        var h = -3750763034362895579L
        var j = 0
        while (j < k) { h = (h ^ tok(w + j)) * 1099511628211L; j += 1 }
        out(w) = h
        w += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n   = ctx.freshName("n")
      val tok = ctx.freshName("tok")
      val i   = ctx.freshName("i")
      val out = ctx.freshName("out")
      val w   = ctx.freshName("w")
      val j   = ctx.freshName("j")
      val h   = ctx.freshName("h")
      val s   = ctx.freshName("s")
      s"""
         |int $n = $c.numElements();
         |long[] $tok = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |  $tok[$i] = ($s == null) ? 0L
         |    : org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
         |        $s, org.apache.spark.sql.types.DataTypes.StringType, 42L);
         |}
         |long[] $out;
         |if ($n < $k) {
         |  long $h = -3750763034362895579L;
         |  for (int $j = 0; $j < $n; $j++) { $h = ($h ^ $tok[$j]) * 1099511628211L; }
         |  $out = new long[] { $h };
         |} else {
         |  $out = new long[$n - $k + 1];
         |  for (int $w = 0; $w <= $n - $k; $w++) {
         |    long $h = -3750763034362895579L;
         |    for (int $j = 0; $j < $k; $j++) { $h = ($h ^ $tok[$w + $j]) * 1099511628211L; }
         |    $out[$w] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** array<long> shingle hashes → array<long> of `numHashes` minima under the
  * universal hash family (a_i·h + b_i) mod (2^31-1). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import NativeExpressions.MinhashPrime

  private lazy val (permA, permB) = NativeExpressions.permutationConstants(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == ArrayType(LongType, false) || child.dataType == ArrayType(LongType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash expects array<bigint>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val arr  = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      var hp = arr.getLong(i) % MinhashPrime
      if (hp < 0) hp += MinhashPrime
      var j = 0
      while (j < numHashes) {
        val v = (permA(j) * hp + permB(j)) % MinhashPrime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", permA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i    = ctx.freshName("i")
      val j    = ctx.freshName("j")
      val hp   = ctx.freshName("hp")
      val v    = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $hp = $c.getLong($i) % ${MinhashPrime}L;
         |  if ($hp < 0) $hp += ${MinhashPrime}L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($aRef[$j] * $hp + $bRef[$j]) % ${MinhashPrime}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** string → Rabin-Karp polynomial fingerprint: fold (acc·31 + codepoint)
  * mod 1e9+7 over the text. Replaces the `split(text, "")` + `aggregate` HOF
  * formulation, which allocated a per-character string array per document
  * and evaluated the fold interpreted — this is one primitive loop over the
  * string inside WholeStageCodegen, zero per-row allocation.
  * Matches `ascii()`-per-character semantics (code points). */
case class PolyFingerprint(child: Expression) extends UnaryExpression {
  private val Mod = 1000000007L

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyFingerprint expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s   = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i   = ctx.freshName("i")
      val cp  = ctx.freshName("cp")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31 + $cp) % ${Mod}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

/** array<long> token hashes → 64-bit SimHash (per-bit ±1 votes, sign bit). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == ArrayType(LongType, false) || child.dataType == ArrayType(LongType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash expects array<bigint>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val arr   = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i     = ctx.freshName("i")
      val b     = ctx.freshName("b")
      val h     = ctx.freshName("h")
      val sig   = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** string → Unicode NFC normalization (canonical composition): `é` typed as
  * `e` + U+0301 becomes the single precomposed U+00E9, so hashing, dedup and
  * tokenization see one byte sequence per canonically-equal text. Spark ships
  * no normalizer (collations compare, they don't rewrite), so this wraps the
  * JDK's `java.text.Normalizer` — the same Unicode 15 tables DuckDB's
  * `nfc_normalize` (utf8proc) implements, which is what makes the T26 gate
  * oracle-exact. The hot path never allocates for ASCII: a byte==codepoint
  * count check proves the input 7-bit and returns it untouched, so the
  * normalizer's String round-trip is paid only by rows that can actually
  * change. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (u.numBytes == u.numChars) u // pure ASCII: NFC is the identity
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |if ($c.numBytes() == $c.numChars()) {
         |  ${ev.value} = $c;
         |} else {
         |  String $s = $c.toString();
         |  ${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
