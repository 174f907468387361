package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: decompose the segmented ExactSubstr cost — rebuilds the
  * d_exact_substr_segmented corpus (documents ∪ planted ∪ giant) and
  * times each pipeline prefix with a noop-style action, so the ~9.5 s
  * isolated entry cost can be attributed (tokenize/explode vs rank
  * stages vs final classes vs trim tail). */
object ProfileSubstrSeg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // same corpus as the segmented entries (replicated from DedupQueries)
    val planted = docs.filter(col("doc_id") % 97 === 0)
      .withColumn("o", (col("doc_id") % 7 + 1).cast("int"))
      .withColumn("len", expr(
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 25 WHEN 1 THEN 50 " +
          "ELSE 200 END"))
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= col("o") + col("len") - 1)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat_ws(" ", expr("slice(w, o, len)")).as("text"))
    val giant = docs.filter(col("doc_id") === 0)
      .withColumn("w", split(col("text"), " "))
      .select(lit(2000000000L).as("doc_id"),
        concat_ws(" ", flatten(array_repeat(col("w"),
          (lit(1048576) / size(col("w"))).cast("int") + 1)))
          .as("text"))
    val corpus = docs.unionByName(planted).unionByName(giant)

    def time(label: String)(act: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      // warm once, then median of 3
      act
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); act; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label%-40s ${ts.sorted.apply(1)}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // A. corpus materialization alone
    time("A corpus (union+planted+giant)")(noop(corpus))
    // B. segmented coverage end-to-end (the graded entry)
    time("B exactSubstrCoverageSegmented")(
      noop(graft.operators.Dedup.exactSubstrCoverageSegmented(
        corpus, col("doc_id"), col("text"), minLen = 25)))
    // C. trim variant
    time("C exactSubstrTrimSegmented")(
      noop(graft.operators.Dedup.exactSubstrTrimSegmented(
        corpus, col("doc_id"), col("text"), minLen = 25)))
    // D. keep-first variant
    time("D exactSubstrTrimKeepFirstSegmented")(
      noop(graft.operators.Dedup.exactSubstrTrimKeepFirstSegmented(
        corpus, col("doc_id"), col("text"), minLen = 25)))
    // E. plain coverage over the same corpus (giant quarantined)
    time("E exactSubstrCoverage (giant quarantined)")(
      noop(graft.operators.Dedup.exactSubstrCoverage(
        corpus, col("doc_id"), col("text"), minLen = 25)))
    spark.stop()
  }
}
