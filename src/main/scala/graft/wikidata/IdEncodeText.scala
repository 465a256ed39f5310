package graft.wikidata

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass Wikidata id-text encode (reference: src/id.rs:6-24):
  * "Q42"/"P31"/"L9"/"L9-F2"/"L9-S1" → int64, anything else → null.
  *
  * Why an Expression and not the `when`-chain in `IdCodec.encodeTextColSql`:
  * the chain references its input ~10× (upper/substring/instr/
  * substring_index/try_cast per branch), so it both re-executes whatever
  * expression feeds it wherever CollapseProject merges projections (the
  * `meta` table paid 3 extra variant walks per row that way) and costs ~15
  * string kernels per id. This compiles to one bytes pass inside
  * WholeStageCodegen. Differentially tested against the SQL formulation in
  * IdCodecSpec.
  */
case class IdEncodeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"idEncodeText expects string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val r = IdCodec.encodePrim(input.asInstanceOf[UTF8String])
    if (r == IdCodec.Invalid) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.wikidata.IdCodec.encodePrim($c);
         |if (${ev.value} == Long.MIN_VALUE) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = 0L;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IdEncodeText =
    copy(child = newChild)
}
