package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 60-bit SimHash over a token array — bit-identical to the
  * portable SQL form (`Dedup.simhashExpr`): per token, the 60-bit value is
  * the first 15 hex chars of md5; per bit position the counter moves ±1;
  * the output bit is set when its counter ends positive.
  *
  * Why native (same case as [[VecDot]]): the SQL form nests higher-order
  * functions — `aggregate(transform(sequence(0,59), ...))` re-walks the
  * hash list per bit with interpreted lambdas, ~60×|tokens| boxed lambda
  * evaluations per row; this expression updates 60 counters in one
  * primitive loop per token. Measured ~1.3× end-to-end (md5 dominates
  * both paths; the win is the eliminated lambda interpretation and
  * boxing) — kept because it is also the simpler form to maintain and
  * the gap widens with token count.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(toks: Any): Any =
    SimHash60.compute(toks.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  // one digest per thread: getInstance does a synchronized JCA provider
  // lookup + allocation — per-ROW that cost would rival the hashing
  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel shared by eval and codegen. */
  def compute(toks: ArrayData): Long = {
    val md = localMd.get()
    val counters = new Array[Int](60)
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val t = toks.getUTF8String(i)
      md.reset()
      val digest = md.digest(t.getBytes)
      // first 15 hex chars = high 60 bits of the first 8 digest bytes,
      // i.e. a 64-bit big-endian read shifted right by 4
      var h64 = 0L
      var b = 0
      while (b < 8) { h64 = (h64 << 8) | (digest(b) & 0xffL); b += 1 }
      val h = h64 >>> 4
      var j = 0
      while (j < 60) {
        counters(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counters(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
