package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** BINARY (WAV) → LONG energy-contour fingerprint as a native Catalyst
  * expression — the codegen tier of
  * [[graft.operators.Multimodal.audioFingerprints]], mirroring
  * [[DHash64Expr]] on the audio axis: one static call into [[WavCodec]],
  * no UDF ser/de, stays inside whole-stage codegen. NULL when the payload
  * is null, undecodable, or too short to frame (< 65 samples) — a
  * null-PRODUCING expression. SQL-registered as `audio_fingerprint64`
  * (GraftExtensions). */
case class AudioFingerprintExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "audio_fingerprint64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${child.dataType.sql}")

  protected override def nullSafeEval(bytes: Any): Any =
    WavCodec.fingerprint64OrNull(bytes.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("afp")
      s"""
         |java.lang.Long $r = graft.functions.WavCodec.fingerprint64OrNull($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): AudioFingerprintExpr = copy(child = newChild)
}
