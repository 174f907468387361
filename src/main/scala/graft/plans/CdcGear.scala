package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[CdcGearCutsExpr]]: FastCDC-style gear rolling hash over
  * the bytes of a string, emitting CHAR positions (1-based, code-point
  * boundaries) where a chunk closes. The gear construction is the
  * published content-defined-chunking design (Xia et al., FastCDC,
  * USENIX ATC'16): `h = (h << 1) + gear(b)` per byte, cut when a fixed
  * bit mask of `h` is all-zero. The shift gives the hash a ~64-byte
  * sliding memory, so cut decisions depend on content alone — byte-
  * identical spans in two documents cut identically regardless of their
  * offsets, which is the whole point.
  *
  * Determinism: the 256-entry gear table derives from md5
  * (`Hash60.hash("gear:<b>")`), so every JVM computes identical cuts —
  * no RNG state to ship. The mask tests `log2(divisor)` mid-high bits
  * (bits 32..): each is an ~unbiased mix of the trailing ~32 bytes, so
  * chunks are geometric with mean ≈ `divisor` bytes.
  *
  * Unicode: the hash advances per BYTE (that is what makes it fast) but
  * positions are only recorded at code-point boundaries and counted in
  * CHARS, so downstream `substr` slicing can never split a multi-byte
  * character. On ASCII corpora char and byte positions coincide.
  */
object CdcGear {
  private val gear: Array[Long] =
    Array.tabulate(256)(b => Hash60.hash(s"gear:$b".getBytes("UTF-8")))

  def cuts(s: UTF8String, divisor: Int): ArrayData = {
    val mask: Long = (divisor - 1).toLong << 32
    val bytes = s.getBytes
    val out = new java.util.ArrayList[Any]()
    var h = 0L
    var i = 0
    var charPos = 0
    while (i < bytes.length) {
      // code-point length from the lead byte (UTF-8)
      val b0 = bytes(i) & 0xff
      val step =
        if (b0 < 0x80) 1
        else if (b0 < 0xe0) 2
        else if (b0 < 0xf0) 3
        else 4
      val end = math.min(i + step, bytes.length)
      while (i < end) {
        h = (h << 1) + gear(bytes(i) & 0xff)
        i += 1
      }
      charPos += 1
      if ((h & mask) == 0L) out.add(charPos)
    }
    new GenericArrayData(out)
  }
}

/** Runtime for [[CdcMd5CutsExpr]]: the byte-CDC family's ORACLE-mode cut
  * rule — `hash60(last `window` chars) % divisor == 0` evaluated at
  * every char position from `window` to the end — as one JVM loop per
  * row. Bit-identical to the composed SQL form
  * `filter(sequence(window, length(t)), i ->
  *   pmod(graft_hash60(substr(t, i-window+1, window)), divisor) = 0)`
  * (the DuckDB-replayable rule every `d_byte_*` oracle recomputes), but
  * hashing each window as an (offset, len) BYTE RANGE off one
  * `getBytes` + one char-offset pass — the winnowing kernel's lesson:
  * the per-position `substr` UTF8String allocation, not the digest,
  * dominated the lambda form.
  */
object CdcMd5 {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def cuts(s: UTF8String, window: Int, divisor: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = Winnow.charStarts(bytes)
    val n = offs.length - 1
    if (n < window) return Empty
    val out = new java.util.ArrayList[Any]()
    var i = window
    while (i <= n) {
      val from = offs(i - window)
      // hash60 is non-negative (top 60 md5 bits), so % == pmod here
      if (Hash60.hash(bytes, from, offs(i) - from) % divisor == 0L)
        out.add(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native md5-window CDC cut positions — the oracle-mode sibling of
  * [[CdcGearCutsExpr]] with the same `array<int>` contract (1-based
  * char positions that close a chunk). */
case class CdcMd5CutsExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
  require(window >= 1 && divisor >= 1,
    s"window and divisor must be positive, got ($window, $divisor)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_md5_cuts expects a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_md5_cuts"

  override protected def nullSafeEval(s: Any): Any =
    CdcMd5.cuts(s.asInstanceOf[UTF8String], window, divisor)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.CdcMd5.cuts($c, $window, $divisor)")

  override protected def withNewChildInternal(
      newChild: Expression): CdcMd5CutsExpr = copy(child = newChild)
}

/** Native gear-CDC cut positions of a string column — case (b) of the
  * build rules: a per-byte rolling loop has no declarative equivalent
  * (a higher-order-function formulation would evaluate an interpreted
  * lambda per character), so it is one static JVM call that lives inside
  * whole-stage codegen, like [[Hash60Expr]]. Returns `array<int>` of
  * 1-based char positions that close a chunk. `divisor` must be a power
  * of two (mask construction); mean chunk length ≈ divisor bytes.
  */
case class CdcGearCutsExpr(child: Expression, divisor: Int)
    extends UnaryExpression {
  require(divisor > 1 && (divisor & (divisor - 1)) == 0,
    s"gear divisor must be a power of two, got $divisor")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_gear_cuts expects a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_gear_cuts"

  override protected def nullSafeEval(s: Any): Any =
    CdcGear.cuts(s.asInstanceOf[UTF8String], divisor)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CdcGear.cuts($c, $divisor)")

  override protected def withNewChildInternal(
      newChild: Expression): CdcGearCutsExpr = copy(child = newChild)
}
