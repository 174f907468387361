package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[Hash60Expr]]: first 60 bits of MD5, as a non-negative
  * long. Bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` — the
  * 15 leading hex chars are the 15 leading nibbles of the digest, i.e.
  * the big-endian first 8 bytes shifted right one nibble — but computed
  * straight from the digest bytes, skipping the 32-char hex encode, the
  * substring copy, and conv's radix parse the composed form pays per
  * call.
  */
object Hash60 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash(bytes: Array[Byte]): Long = hash(bytes, 0, bytes.length)

  /** Range form: digest `len` bytes from `off` without slicing a copy
    * (the winnowing kernel hashes every k-char window of a row). */
  def hash(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, off, len)
    val dig = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Native 60-bit MD5 hash of a string column (the dedup family's shared
  * hash primitive — minhash shingle bases, CDC cut rule, leakage-split
  * group router). Case (b) of the build rules: the composed
  * `conv(substring(md5(...)))` is semantically right but materializes a
  * hex string and re-parses it for every shingle/word — this emits one
  * static call that lives inside whole-stage codegen. The md5-derived
  * value (not xxhash64) is load-bearing: the DuckDB oracle replays it
  * bit-exactly (`('0x' || substring(md5(s), 1, 15))::BIGINT`).
  */
case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 expects a string argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(s: Any): Any =
    Hash60.hash(s.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash60.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}
