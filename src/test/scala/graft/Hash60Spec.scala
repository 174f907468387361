package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class Hash60Spec extends SparkSpec {

  test("graft_hash60 is bit-identical to the conv(substring(md5)) form") {
    // real corpus text plus the awkward cases: empty string, single char,
    // non-ASCII multibyte (md5 runs over UTF-8 bytes in both forms),
    // leading-zero digests are covered statistically by volume
    import spark.implicits._
    val edge = Seq("", "a", "é", "züricher straße", "你好",
      " leading", "trailing ", "a b c").toDF("s")
    val corpus = Tables.documents(spark, testDataDir)
      .select(explode(split(col("text"), " ")).as("s")).limit(5000)
      .unionByName(edge)
    val both = corpus.select(
      Dedup.hash60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
        .as("composed"))
    assert(both.filter(col("native") =!= col("composed")).isEmpty)
    // 60-bit range: never negative, never above 2^60
    assert(both.filter(col("native") < 0 ||
      col("native") >= (1L << 60)).isEmpty)
  }

  test("graft_hash60 null/type behavior matches a scalar function") {
    import spark.implicits._
    val r = Seq(Some("x"), None).toDF("s")
      .select(Dedup.hash60(col("s")).as("h")).collect()
    assert(r.count(_.isNullAt(0)) == 1 && r.count(!_.isNullAt(0)) == 1)
    graft.plans.GraftFunctions.register(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(call_function("graft_hash60", col("id"))).collect()
    }
    // registered SQL path returns the same value as the Column path
    val viaSql = spark.sql("SELECT graft_hash60('abc')").head().getLong(0)
    val viaCol = Seq("abc").toDF("s")
      .select(Dedup.hash60(col("s"))).head().getLong(0)
    assert(viaSql == viaCol)
  }

  test("graft_winnow SQL registration: parity with the operator, misuse fails at analysis") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // SQL path ≡ operator path on a real doc (same expr underneath)
    val doc = Tables.documents(spark, testDataDir)
      .select(col("text")).limit(1).head().getString(0)
    val viaSql = Seq(doc).toDF("t")
      .selectExpr("explode(graft_winnow(t, 8, 4)) AS fp")
      .collect().map(_.getLong(0)).toSeq
    val viaOp = Dedup.winnowFingerprints(
        Seq((1L, doc)).toDF("doc_id", "text"), col("doc_id"), col("text"),
        k = 8, w = 4)
      .collect().map(_.getLong(1)).toSeq
    assert(viaSql == viaOp)
    // builder misuse is an analysis error, never an eval-time crash
    val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_winnow('x', 8)").collect()
    }
    assert(wrongArity.getMessage.contains("graft_winnow"), wrongArity.getMessage)
    val notFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", 8)).toDF("t", "k")
        .selectExpr("graft_winnow(t, k, 4)").collect()
    }
    assert(notFoldable.getMessage.contains("foldable"), notFoldable.getMessage)
    for (bad <- Seq("graft_winnow('x', 1, 4)", "graft_winnow('x', 8, 99999)")) {
      val outOfRange = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $bad").collect()
      }
      assert(outOfRange.getMessage.contains("[2, 65536]"),
        s"$bad: ${outOfRange.getMessage}")
    }
  }
}
