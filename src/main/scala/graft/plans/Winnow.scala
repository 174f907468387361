package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03 §3): hash every k-char shingle of the text with the
  * engine's shared 60-bit MD5 ([[Hash60]] — bit-identical to the DuckDB
  * oracle's `('0x' || substring(md5(s), 1, 15))::BIGINT`), slide a
  * w-hash window over the sequence, and emit each window's MINIMUM
  * hash, distinct in first-occurrence order.
  *
  * Why native (the [[SimHash60]] case): the portable SQL form nests
  * higher-order functions — `transform(sequence(...), i -> conv(
  * substring(md5(substring(t, i, k)))))` then a second transform of
  * `array_min(slice(...))` — and higher-order lambdas evaluate
  * INTERPRETED per element, with a 32-char hex encode + conv radix
  * re-parse per shingle on top. This expression runs one primitive JVM
  * loop per row straight off the digest bytes and stays inside
  * whole-stage codegen. Semantics are pinned bit-identical to the
  * lambda form (`Dedup.winnowFingerprintsLambda`) by spec, including
  * the short-text clamps: texts shorter than k hash their whole self
  * once; hash sequences shorter than w take one minimum over what
  * exists.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int,
                      prod: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if k >= 2 && w >= 2 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects a string argument and k >= 2, w >= 2, " +
        s"got ($t, k=$k, w=$w)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(s: Any): Any =
    if (prod) Winnow.fingerprintsProd(s.asInstanceOf[UTF8String], k, w)
    else Winnow.fingerprints(s.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (prod) "fingerprintsProd" else "fingerprints"
    defineCodeGen(ctx, ev, c => s"graft.plans.Winnow.$fn($c, $k, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object Winnow {

  /** Static kernel shared by eval and codegen. Character (code-point)
    * shingle boundaries — the same semantics as Spark's `substring` in
    * the lambda form and DuckDB's oracle — but hashed straight over the
    * row's byte array: one `getBytes` + one UTF-8 lead-byte offset pass
    * per ROW, zero per-position substring allocations (the allocation,
    * not the digest, dominated the first cut — measured in SCALE.md).
    * Oracle hash family: 60-bit MD5 ([[Hash60]]). */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = charStarts(bytes)
    val nChars = offs.length - 1
    // texts shorter than k (incl. empty) hash their whole self once —
    // the range clamps, matching sequence(1, greatest(len-k+1, 1))
    val m = math.max(nChars - (k - 1), 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val from = offs(i)
      val until = offs(math.min(i + k, nChars))
      hs(i) = Hash60.hash(bytes, from, until - from)
      i += 1
    }
    select(hs, w)
  }

  /** Production hash family: Spark's own xxhash64 (seed 42 — identical
    * to the `xxhash64` SQL function over the same substring) instead of
    * MD5. The selection (window minima + distinct) is byte-identical to
    * the oracle kernel; only the hash family changes — the
    * [[graft.operators.Dedup.hashOf]] mode discipline at char grain. */
  def fingerprintsProd(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = charStarts(bytes)
    val nChars = offs.length - 1
    val m = math.max(nChars - (k - 1), 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val from = offs(i)
      val until = offs(math.min(i + k, nChars))
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, 42L)
      i += 1
    }
    select(hs, w)
  }

  /** Byte offset of each code point's first byte, plus an end sentinel:
    * UTF-8 continuation bytes match (b & 0xC0) == 0x80. Shared with the
    * byte-CDC md5-window kernel ([[CdcMd5]]). */
  private[plans] def charStarts(bytes: Array[Byte]): Array[Int] = {
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) n += 1
      i += 1
    }
    val offs = new Array[Int](n + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(n) = bytes.length
    offs
  }

  /** Sliding window-min + first-occurrence distinct (array_distinct
    * parity with the lambda reference form). */
  private def select(hs: Array[Long], w: Int): ArrayData = {
    val m = hs.length
    val nWin = math.max(m - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWin) {
      var mn = hs(j)
      var t = j + 1
      val end = math.min(j + w, m)
      while (t < end) { if (hs(t) < mn) mn = hs(t); t += 1 }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
