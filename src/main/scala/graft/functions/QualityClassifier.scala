package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** T21: learned quality scoring — a trained hashed-linear text classifier
  * (the fastText shape every production curation pipeline runs as its
  * learned keep/drop filter) served as ONE codegen'd expression.
  *
  * The model is linear over hashed unigram counts, so inference needs no
  * model runtime at all: score_mu = bias + Σ_token w[polyhash(tok) mod B]
  * in integer milli-units — one primitive loop per row inside
  * WholeStageCodegen, deterministic on any engine or partitioning (the
  * same reasoning as T20's integer BM25). Training happens OFFLINE
  * (tools/train_quality_clf.py, deterministic full-batch logistic
  * regression); the frozen weights ride into codegen as a reference
  * object, exactly like the S5 PQ codebooks. The per-token hash is the t4
  * PolyFingerprint fold, so the DuckDB oracle replays bucketing and
  * scoring digit-for-digit from the weight table.
  */
object QualityClassifier {

  /** Milli-unit score of a token array under the trained weights. */
  def scoreMu(tokens: Column,
      weightsMu: Array[Long] = QualityClfWeights.WeightsMu,
      biasMu: Long = QualityClfWeights.BiasMu): Column =
    ColumnBridge.column(
      HashedLinearScore(ColumnBridge.expression(tokens), weightsMu, biasMu))
}

/** array<string> tokens → bias + Σ weights[polyhash(token) mod B], all in
  * integer milli-units. Null tokens score as the empty string (hash 0). */
case class HashedLinearScore(child: Expression, weightsMu: Array[Long],
    biasMu: Long) extends UnaryExpression {
  private val Mod = 1000000007L

  require(weightsMu.nonEmpty, "empty weight table")

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashedLinearScore expects array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val b = weightsMu.length
    var acc = biasMu
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      var h = 0L
      if (s != null) {
        val str = s.toString
        var j = 0
        while (j < str.length) {
          val cp = str.codePointAt(j)
          h = (h * 31 + cp) % Mod
          j += Character.charCount(cp)
        }
      }
      acc += weightsMu((h % b).toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("clfWeightsMu", weightsMu, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val i   = ctx.freshName("i")
      val s   = ctx.freshName("s")
      val h   = ctx.freshName("h")
      val j   = ctx.freshName("j")
      val cp  = ctx.freshName("cp")
      s"""
         |long $acc = ${biasMu}L;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = 0L;
         |  if (!$c.isNullAt($i)) {
         |    String $s = $c.getUTF8String($i).toString();
         |    for (int $j = 0; $j < $s.length(); ) {
         |      int $cp = $s.codePointAt($j);
         |      $h = ($h * 31 + $cp) % ${Mod}L;
         |      $j += Character.charCount($cp);
         |    }
         |  }
         |  $acc += $wRef[(int) ($h % $wRef.length)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}
