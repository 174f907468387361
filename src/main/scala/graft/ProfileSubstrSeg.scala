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

    // ---- fine-grained decomposition of the segmented rank build ----
    val minLen = 25
    val S = (1L << 20) - minLen
    val segLen = (1L << 20) - 1
    val toks = corpus
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        size(col("w")).cast("long").as("n_tokens"))
    val direct = toks.filter(col("n_tokens") < lit(1L << 20))
      .select(col("doc_id"), col("w"))
    val segments = toks.filter(col("n_tokens") >= lit(1L << 20))
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(0L, (n_tokens - $minLen) div $S)")).as("k"))
      .select((lit(1L << 42) + col("doc_id") * lit(1L << 10) + col("k"))
          .as("doc_id"),
        expr(s"slice(w, cast(k * $S + 1 AS int), $segLen)").as("w"))
    val segs = direct.unionByName(segments)
    val positions = segs
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("tok"))
    time("T1 toks (split+size)")(noop(toks.select(col("doc_id"), col("n_tokens"))))
    time("T2 segments (slice)")(noop(segs.select(col("doc_id"), size(col("w")))))
    time("T3 positions (posexplode)")(noop(positions))
    val repr = col("doc_id") * (1L << 20) + col("pos")
    def rank1() = positions.join(
      positions.groupBy("tok").agg(min(repr).as("rank")), "tok")
      .select(col("doc_id"), col("pos"), col("rank"))
    time("T4 rank_1 (groupBy+join)")(noop(rank1()))
    time("T5 rank_1 cp + widen j=5 sliced") {
      val r1 = rank1().localCheckpoint()
      noop(graft.operators.Dedup.widenStage(r1, 1L, 5, sliced = true))
      graft.operators.Joins.unpersistLocalCheckpoint(r1)
    }
    time("T5b rank_1 cp + widen j=5 UNsliced") {
      val r1 = rank1().localCheckpoint()
      noop(graft.operators.Dedup.widenStage(r1, 1L, 5, sliced = false))
      graft.operators.Joins.unpersistLocalCheckpoint(r1)
    }
    time("T6 widen cp + final multiShift+classes") {
      val r1 = rank1().localCheckpoint()
      val r5 = graft.operators.Dedup.widenStage(r1, 1L, 5, sliced = true)
        .localCheckpoint()
      graft.operators.Joins.unpersistLocalCheckpoint(r1)
      val keys = graft.operators.Dedup
        .multiShiftedRank(r5, Seq(5, 10, 15, 20), sliced = true)
      val keyCols = Seq("r1", "r2", "r3", "r4", "r5")
      val dup = keys.groupBy(keyCols.head, keyCols.tail: _*)
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      noop(keys.join(dup.select(keyCols.map(col): _*), keyCols)
        .select(col("doc_id"), col("pos")))
      graft.operators.Joins.unpersistLocalCheckpoint(r5)
    }
    // T7/T8: the serve tail — guard filter + classes + decode + fold,
    // replicating rankPerDoc's final stage including the decode
    def finalMarks(): org.apache.spark.sql.DataFrame = {
      val r1 = rank1().localCheckpoint()
      val r5 = graft.operators.Dedup.widenStage(r1, 1L, 5, sliced = true)
        .localCheckpoint()
      graft.operators.Joins.unpersistLocalCheckpoint(r1)
      val keys = graft.operators.Dedup
        .multiShiftedRank(r5, Seq(5, 10, 15, 20, 24), sliced = true)
        .filter(col("r6").isNotNull)
      val keyCols = Seq("r1", "r2", "r3", "r4", "r5")
      val repr2 = col("doc_id") * (1L << 20) + col("pos")
      val dup = keys.groupBy(keyCols.head, keyCols.tail: _*)
        .agg(count(lit(1)).as("n"), min(repr2).as("mn"))
        .filter(col("n") >= 2)
      val isSeg = col("doc_id") >= lit(1L << 42)
      val odoc = when(isSeg, shiftright(col("doc_id") - lit(1L << 42), 10))
        .otherwise(col("doc_id"))
      val opos = col("pos") + when(isSeg,
        (col("doc_id") - lit(1L << 42)).bitwiseAND(lit(1023L)) * S)
        .otherwise(lit(0L))
      keys.join(dup.select(keyCols.map(col): _*), keyCols)
        .select(odoc.as("doc_id"), opos.as("pos"))
    }
    time("T7 T6+guard+decode marks")(noop(finalMarks()))
    time("T8 T7+window fold perDoc") {
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      noop(finalMarks()
        .withColumn("adds", greatest(lit(0L),
          col("pos") + minLen - greatest(
            coalesce(max(col("pos") + minLen).over(byDoc), lit(0L)),
            col("pos"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_starts"), sum(col("adds")).as("covered")))
    }
    println("=== final-stage executed plan (marks) ===")
    val fm = finalMarks()
    fm.write.format("noop").mode("overwrite").save()
    println(fm.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
