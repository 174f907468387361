package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two vector columns (each `array<float>` or
  * `array<double>`, mixed allowed — e.g. a float embedding against
  * constant-folded double hyperplane literals), accumulated in double
  * strictly left-to-right (bit-compatible with `aggregate(zip_with(...))`
  * and the DuckDB oracle's `list_reduce`).
  *
  * Why a custom Expression (SURVEY.md §2.10 said "none required" — true for
  * the reference's own surface, but not for the added vector operators):
  * Spark's higher-order functions evaluate their lambda *interpreted*, per
  * element, boxing as they go — measured ~20× slower than generated code on
  * the 64-dim corpus. This is case (b) of the build rules: a scalar the
  * built-ins cannot express efficiently. `doGenCode` emits a tight primitive
  * loop that lives inside whole-stage codegen, so a brute-force ANN scan
  * stays one fused stage.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two array<float>/array<double> args, " +
          s"got (${left.dataType}, ${right.dataType})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, float: Boolean) =
        if (float) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, isFloat(left))} * ${get(b, isFloat(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native functions — both paths:
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build, or
  * imperative [[GraftFunctions.register]] on an existing session (used by
  * the query entries so they work under any driver-created session).
  */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash60(children.head)),
    (FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "graft_hash60"),
      (children: Seq[Expression]) => Hash60Expr(children.head)),
    // order arrives as a foldable integral literal: graft_hilbert(x, y, 16)
    // (or 16L — SQL integer literals can parse as BIGINT). The builder
    // validates arity and foldability up front so misuse is an analysis
    // error, not a ClassCastException/NPE at eval (r10 ADVICE).
    (FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndexExpr].getName, "graft_hilbert"),
      (children: Seq[Expression]) => {
        def bad(msg: String) = new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_3100", Map("message" -> msg))
        if (children.length != 3) throw bad(
          s"graft_hilbert expects 3 arguments (x, y, order), got ${children.length}")
        val ord = children(2)
        if (!ord.foldable) throw bad(
          "graft_hilbert: the order argument must be a foldable integer literal")
        val n: Long = ord.eval() match {
          case i: Int  => i.toLong
          case l: Long => l
          case other   => throw bad(
            s"graft_hilbert: order must be an integral literal, got $other")
        }
        // validate on the LONG value: a bare toInt would silently
        // truncate an out-of-range BIGINT (4294967312L -> 16) past the
        // expression's own [1, 31] check, defeating fail-at-analysis
        if (n < 1L || n > 31L) throw bad(
          s"graft_hilbert: order must be in [1, 31], got $n")
        HilbertIndexExpr(children(0), children(1), n.toInt)
      }),
    // winnowing fingerprints: k and w arrive as foldable integral
    // literals, validated at analysis like graft_hilbert
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowExpr].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        def bad(msg: String) = new org.apache.spark.sql.AnalysisException(
          "_LEGACY_ERROR_TEMP_3100", Map("message" -> msg))
        if (children.length != 3) throw bad(
          s"graft_winnow expects 3 arguments (text, k, w), got ${children.length}")
        def intLit(e: Expression, name: String): Int = {
          if (!e.foldable) throw bad(
            s"graft_winnow: $name must be a foldable integer literal")
          val v: Long = e.eval() match {
            case i: Int  => i.toLong
            case l: Long => l
            case other   => throw bad(
              s"graft_winnow: $name must be an integral literal, got $other")
          }
          if (v < 2L || v > 65536L) throw bad(
            s"graft_winnow: $name must be in [2, 65536], got $v")
          v.toInt
        }
        WinnowExpr(children(0), intLit(children(1), "k"),
          intLit(children(2), "w"))
      }),
    // Spark's own runtime-filter machinery, exposed as callable functions:
    // the distributed bloom build (partial sketches merged at the
    // aggregator, never a driver-side item collect) and the codegen'd
    // probe. Both operate on xxhash64(value) longs. Used by
    // `Dedup.bloomDecontaminationFlags` for the benchmark-too-big-to-
    // broadcast decontamination path.
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))

  def register(spark: SparkSession): Unit = all.foreach {
    case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
