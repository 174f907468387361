package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[LenientUtf8DecodeExpr]]: UTF-8 decode with the REPLACE
  * error action — `new String(bytes, UTF_8)` substitutes U+FFFD for
  * malformed sequences instead of throwing (the `String` constructor
  * contract), then re-encodes to Spark's UTF8String. */
object LenientUtf8 {
  def decode(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
}

/** Lenient UTF-8 decode of a binary column (the byte-grain ExactSubstr
  * trim's rejoin step). Spark 4's builtin `decode(bin, 'UTF-8')` throws
  * MALFORMED_CHARACTER_CODING on invalid input, and a duplicated BYTE
  * window may legitimately start mid-character — one such doc would
  * abort a whole corpus trim, the exact job-kill failure class the
  * quarantine contract exists to prevent (caught in the r15 review:
  * two docs sharing `<trail byte><run>` trim to a dangling lead byte).
  * This expression substitutes U+FFFD instead — the released
  * deduplicate-text-datasets tool emits raw bytes and defers decoding,
  * so lenient replacement is the faithful "decode anyway" behavior.
  * One static call inside whole-stage codegen. */
case class LenientUtf8DecodeExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lenient_utf8 expects a binary argument, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lenient_utf8"

  override protected def nullSafeEval(b: Any): Any =
    LenientUtf8.decode(b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LenientUtf8.decode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): LenientUtf8DecodeExpr = copy(child = newChild)
}
