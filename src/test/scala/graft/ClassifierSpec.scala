package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {

  // independent reimplementation of the scoring chain (java MD5, not
  // Spark's expressions) — a shared-constant slip can't hide
  private def milli(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    (h % 512L) * 2654435761L % 2001L - 1000L
  }

  private def expected(text: String): (Long, Double) = {
    val w = text.split(" ", -1)
    val uni = w.map(milli)
    val bi = w.sliding(2).filter(_.length == 2).map(p => milli(p.mkString(" "))).toSeq
    val n = uni.length + bi.length
    (n.toLong, (uni.sum + bi.sum).toDouble / (n * 1000L))
  }

  test("score matches an independent reimplementation") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "single", "a b", "x y z x y")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Classifier.score(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (n, s) = expected(t)
      val (gn, gs, gk) = got(i.toLong)
      assert(gn == n, s"n_features for '$t'")
      assert(math.abs(gs - s) < 1e-12, s"score for '$t': got $gs want $s")
      assert(gk == (s > 0))
    }
  }

  test("single-token doc has no bigram features") {
    import spark.implicits._
    val df = Seq((1L, "lonely")).toDF("doc_id", "text")
    val r = Classifier.score(df, col("doc_id"), col("text")).head()
    assert(r.getLong(1) == 1L)
  }

  test("scoring is a pure projection — no exchange in the plan") {
    val scored = Classifier.score(
      Tables.documents(spark, testDataDir), col("doc_id"), col("text"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("keep-rate is a real split on the corpus") {
    val scored = Classifier.score(
      Tables.documents(spark, testDataDir), col("doc_id"), col("text"))
    val n = scored.count()
    val kept = scored.filter(col("keep")).count()
    assert(kept > 0 && kept < n, s"degenerate split: $kept/$n")
  }
}
