package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** BINARY → LONG perceptual hash (dHash) as a native Catalyst expression —
  * the codegen tier of [[graft.operators.Multimodal.perceptualHash]]: one
  * static call into [[ImageCodec]], no UDF wrapper, no Option boxing per
  * row, stays inside whole-stage codegen. NULL when the payload is null OR
  * undecodable to pixels (metadata-only formats, corrupt bytes) — a
  * null-PRODUCING expression, hence the custom result-null codegen rather
  * than the nullIntolerant shortcut the string-distance expressions use.
  * SQL-registered as `dhash64` (GraftExtensions). */
case class DHash64Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "dhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${child.dataType.sql}")

  protected override def nullSafeEval(bytes: Any): Any =
    ImageCodec.dHash64OrNull(bytes.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dhash")
      s"""
         |java.lang.Long $r = graft.functions.ImageCodec.dHash64OrNull($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DHash64Expr = copy(child = newChild)
}
