package graft

import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {

  /** Independent inverse walk (d→xy), the standard companion loop —
    * implemented HERE, not in main, so the roundtrip is a genuine
    * two-sided check of the shipped xy→d. */
  private def d2xy(order: Int, d0: Long): (Long, Long) = {
    var t = d0
    var x = 0L; var y = 0L
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  private def mortonXy(d: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < 16) {
      x |= ((d >> (2 * i)) & 1L) << i
      y |= ((d >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  test("xy2d inverts d2xy over the full order-5 grid") {
    val order = 5
    for (d <- 0L until (1L << (2 * order))) {
      val (x, y) = d2xy(order, d)
      assert(graft.plans.Hilbert.xy2d(order, x, y) == d,
        s"d=$d -> ($x,$y) -> ${graft.plans.Hilbert.xy2d(order, x, y)}")
    }
  }

  test("consecutive Hilbert cells are grid-adjacent; Morton provably jumps") {
    val order = 5
    var prev = d2xy(order, 0L)
    for (d <- 1L until (1L << (2 * order))) {
      val cur = d2xy(order, d)
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan == 1L, s"jump at d=$d: $prev -> $cur")
      prev = cur
    }
    // the locality claim's other half: Z-order's worst consecutive jump
    // over the same 32×32 grid is large (the power-of-two seam)
    val worstMorton = (1L until (1L << (2 * order))).map { d =>
      val (ax, ay) = mortonXy(d - 1); val (bx, by) = mortonXy(d)
      math.abs(bx - ax) + math.abs(by - ay)
    }.max
    assert(worstMorton > 16L, s"morton worst jump $worstMorton")
  }

  test("graft_hilbert expression: codegen path matches the runtime, masks and nulls") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val rows = Seq((0L, 0L), (1L, 2L), (65535L, 65535L),
      (70000L, 3L) /* masked into the grid */)
    val got = rows.toDF("x", "y")
      .select(call_function("graft_hilbert", col("x"), col("y"),
        lit(16)).as("d"))
      .collect().map(_.getLong(0))
    val expect = rows.map { case (x, y) => graft.plans.Hilbert.xy2d(16, x, y) }
    assert(got.toSeq == expect, s"${got.toSeq} vs $expect")
    assert(graft.plans.Hilbert.xy2d(16, 70000L, 3L) ==
      graft.plans.Hilbert.xy2d(16, 70000L & 65535L, 3L))
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(call_function("graft_hilbert", col("x"), col("y"), lit(16)))
      .collect()
    assert(withNull(0).isNullAt(0))
  }

  test("graft_hilbert builder: BIGINT order literal works; misuse is an analysis error") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // SQL integer literals can parse as BIGINT — 16L must behave as 16
    val viaLong = spark.sql("SELECT graft_hilbert(1L, 2L, CAST(16 AS BIGINT)) AS d")
      .collect()(0).getLong(0)
    assert(viaLong == graft.plans.Hilbert.xy2d(16, 1L, 2L))
    // wrong arity and a non-foldable order are analysis errors with the
    // function's own message, not ClassCastException/NPE at eval
    val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbert(1L, 2L)").collect()
    }
    assert(wrongArity.getMessage.contains("graft_hilbert"), wrongArity.getMessage)
    val notFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, 2L, 16)).toDF("x", "y", "o")
        .selectExpr("graft_hilbert(x, y, o)").collect()
    }
    assert(notFoldable.getMessage.contains("foldable"), notFoldable.getMessage)
    val notIntegral = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbert(1L, 2L, 'wat')").collect()
    }
    assert(notIntegral.getMessage.contains("integral"), notIntegral.getMessage)
    // an out-of-range BIGINT order must be REJECTED at analysis, not
    // silently truncated by toInt (4294967312L -> 16 would pass the
    // expression's own [1, 31] check with the wrong curve order)
    for (badOrder <- Seq("4294967312", "0", "32", "-1")) {
      val outOfRange = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT graft_hilbert(1L, 2L, CAST($badOrder AS BIGINT))")
          .collect()
      }
      assert(outOfRange.getMessage.contains("[1, 31]"),
        s"order=$badOrder: ${outOfRange.getMessage}")
    }
  }
}
