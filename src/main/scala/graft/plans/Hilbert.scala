package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Runtime for [[HilbertIndexExpr]]: the standard iterative xy→d walk
  * (the rot-and-accumulate formulation popularized by the Wikipedia
  * "Hilbert curve" reference implementation) over an order-`order`
  * curve — `order` quadrant-refinement steps, each reading one bit of
  * each coordinate, accumulating `s²·((3·rx) xor ry)` and rotating the
  * frame. Pure integer arithmetic, no tables, no allocation — one
  * static call inside whole-stage codegen, same discipline as
  * [[Hash60]].
  */
object Hilbert {
  /** Hilbert distance of (x, y) on the 2^order × 2^order grid.
    * Coordinates outside the grid are masked into it (callers normalize
    * like the Morton path; the mask makes stray bits harmless). */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Native Hilbert-curve index of two long columns (case (b) of the build
  * rules — a scalar the built-in surface lacks). The locality argument
  * vs the Morton/Z-order key ([[graft.sources.Layout.mortonKey]]): every
  * two CONSECUTIVE Hilbert cells are grid-ADJACENT (Manhattan distance
  * exactly 1, pinned by spec), while Z-order jumps across the plane at
  * every power-of-two boundary — so a range of Hilbert-sorted files
  * covers a compact spatial blob and a 2-D range predicate prunes
  * strictly fewer false-positive files. The trade: Morton is a pure
  * bit-interleave (cheap, n-dim); Hilbert pays `order` rotation steps
  * and this implementation is 2-D (the useful case for the
  * (user, value)-style clustered layouts here). Cost per row is ~16
  * shift/mask iterations — noise next to the parquet write it orders.
  */
case class HilbertIndexExpr(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) if order >= 1 && order <= 31 =>
        TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert expects (bigint, bigint) and order in [1, 31], " +
          s"got ($lt, $rt, order=$order)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(order, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.plans.Hilbert.xy2d($order, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}
