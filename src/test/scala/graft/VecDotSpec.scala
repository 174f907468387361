package graft

import graft.operators.Vectors
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {

  test("graft_simhash is bit-identical to the HOF form on the corpus") {
    graft.plans.GraftFunctions.register(spark)
    val toks = Tables.documents(spark, testDataDir).limit(300)
      .withColumn("toks", split(col("text"), " "))
    val native = toks.select(col("doc_id"),
      call_function("graft_simhash", col("toks")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = toks.select(col("doc_id"),
      graft.operators.Dedup.simhashExpr("toks").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof)
    // type check fails loudly on wrong input
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(call_function("graft_simhash", col("id"))).collect()
    }
  }

  test("vec_dot resolves via spark.sql.extensions injection") {
    // SparkSpec's session sets spark.sql.extensions=graft.plans.GraftExtensions
    val r = spark.sql("SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("native dot is bit-identical to the higher-order-function dot") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, testDataDir).limit(200)
    val pairs = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        Vectors.dot(col("a.embedding"), col("b.embedding")).as("hof"),
        Vectors.dotNative(col("a.embedding"), col("b.embedding")).as("native"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    // bit-exact, not approximate: same fold order, same double accumulation
    assert(pairs.forall { case (h, n) => h == n })
  }

  test("vec_dot participates in whole-stage codegen") {
    graft.plans.GraftFunctions.register(spark)
    val plan = Tables.embeddings(spark, testDataDir)
      .select(Vectors.dotNative(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.toString.contains("*(1) Project [vec_dot"))
  }

  test("vec_dot rejects non-float-array inputs at analysis") {
    graft.plans.GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1, 2), array(3, 4))").collect()
    }
  }
}
