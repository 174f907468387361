package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 evidence dumper (VERDICT r16 #8 — build-side wins need
  * checkable plans): the ExactSubstr rank BUILD executes eagerly inside
  * query construction (the per-doc frame is checkpointed), so a serve
  * plan dump cannot show the fold/positions changes. This main dumps
  * the executed plans of the changed BUILD stages directly:
  *
  *  - fold_coverage_{plain,sliced}: the per-doc coverage fold over a
  *    giant-shaped mark set — the sliced form must show two slice-grain
  *    Window passes and NO single-partition collect;
  *  - fold_chain_{plain,sliced}: the trim chain merge — the sliced form
  *    must contain NO sort_array(collect_list(pos)) over mark rows
  *    (only the chain-grain struct collect);
  *  - utf8_positions_{old,new}: the byte-grain position source — old
  *    materializes the hex-pair token array (regexp_replace + split +
  *    posexplode), new explodes a position sequence and reads bytes off
  *    the binary (no regexp_replace anywhere in the plan).
  *
  * Usage: runMain graft.DumpBuildPlansR17 <outDir>
  */
object DumpBuildPlansR17 {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r17"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = df.queryExecution.executedPlan.toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        (s"== $name ==\n\n$formatted\n\n== executed plan (AQE final) ==\n\n" +
          executed + "\n").getBytes("UTF-8"))
      println(s"[plans] $name -> $outDir/$name.txt")
    }

    // giant-shaped mark set: one ~1M-mark doc + many small docs
    import spark.implicits._
    val marks = (spark.range(1048576L)
      .select(lit(0L).as("doc_id"), (col("id") + 1).as("pos")))
      .unionByName(spark.range(50000L)
        .select((col("id") % 500L + 1L).as("doc_id"),
          expr("id div 500 * 30 + 1").as("pos")))
      .localCheckpoint()
    dump("fold_coverage_plain",
      graft.operators.Dedup.coverageFold(marks, 25, sliced = false))
    dump("fold_coverage_sliced",
      graft.operators.Dedup.coverageFold(marks, 25, sliced = true))
    dump("fold_chain_plain",
      graft.operators.Dedup.chainFold(marks, 25, sliced = false))
    dump("fold_chain_sliced",
      graft.operators.Dedup.chainFold(marks, 25, sliced = true))

    // byte-grain position source, old vs new formulation (the corpus is
    // d_exact_substr_utf8's translated documents table)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), translate(col("text"), "ae", "äé").as("text"))
    val toksB = docs
      .select(col("doc_id"), encode(col("text").cast("string"), "UTF-8").as("b"))
      .select(col("doc_id"), col("b"), length(col("b")).cast("long").as("n_tokens"))
    val oldPos = toksB
      .select(col("doc_id"),
        expr("""slice(split(regexp_replace(hex(b), '(..)', '$1,'),
              |  ','), 1, length(b))""".stripMargin).as("w"))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        conv(col("tok"), 16, 10).cast("long").as("rank"))
    val newPos = toksB
      .filter(col("n_tokens") >= 1)
      .select(col("doc_id"), col("b"),
        explode(expr("sequence(1L, n_tokens)")).as("pos"))
      .select(col("doc_id"), col("pos"),
        conv(hex(expr("substring(b, cast(pos AS int), 1)")), 16, 10)
          .cast("long").as("rank"))
    dump("utf8_positions_old", oldPos.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("rank")).as("s")))
    dump("utf8_positions_new", newPos.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("rank")).as("s")))
    // parity: identical (doc, count, rank-sum) under both formulations
    val a = oldPos.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("rank")).as("s"))
    val b = newPos.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("rank")).as("s"))
    val diff = a.except(b).union(b.except(a)).count()
    println(s"[plans] utf8 position parity diff rows = $diff")
    require(diff == 0, "old/new byte position formulations disagree")

    // ONE pageRank round in the huge regime, replicated from
    // pageRankFrom's loop body over a pre-partitioned pre-sorted edge
    // checkpoint: the evidence is the EDGE side of the round SMJ — it
    // must read the checkpoint with NO exchange and NO sort (the
    // checkpoint's LogicalRDD carries partitioning + ordering), while
    // only the carry side exchanges/sorts per round.
    // at-scale join regime: the rank carry is node-count-sized and can
    // never auto-broadcast at 100 TB — pin the regime like PlanSpec does
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val edges = spark.range(200000L)
      .select((col("id") % 5000L).as("src"), ((col("id") * 7L) % 5000L).as("dst"))
      .filter(col("src") =!= col("dst"))
    val eJ = edges
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("outd")), "src")
    val eHuge = org.apache.spark.sql.GraftShims
      .localCheckpointPartitioned(eJ, "src")
    val sp0 = eHuge.select(col("dst").as("node"), lit(1000000L).as("pr"))
      .groupBy(col("node")).agg(max(col("pr")).as("pr"))
      .localCheckpoint()
    val round = eHuge.join(sp0, eHuge("src") === sp0("node"), "left")
      .withColumn("pr", coalesce(col("pr"), lit(150000L)))
      .select(col("dst"), expr("pr div outd").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      .select(col("dst").as("node"),
        (lit(150000L) + expr("(850 * s) div 1000")).as("pr"))
    dump("pagerank_round_huge", round)

    // ONE star-contraction round (connectedComponents loop body) under
    // both regimes: the fused (small-graph) round must LOSE the
    // intermediate large-star distinct's exchange+agg — dup (v, m) rows
    // ride through to the round's final distinct — while the deduped
    // (at-scale) round keeps it.
    val ccE = spark.range(2000L)
      .select((col("id") % 700L).as("a"), ((col("id") * 13L) % 700L).as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    def ccRound(dedupLargeStar: Boolean) = {
      val both = ccE.select(col("a").as("u"), col("b").as("v"))
        .union(ccE.select(col("b").as("u"), col("a").as("v")))
      val lsMin = both.groupBy(col("u")).agg(min(col("v")).as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
      val lsRaw = both.join(lsMin, "u").filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
        .filter(col("a") =!= col("b"))
      val ls = if (dedupLargeStar) lsRaw.distinct() else lsRaw
      val smaller = ls.select(col("b").as("u"), col("a").as("v"))
      val ssMin = smaller.groupBy(col("u")).agg(min(col("v")).as("m"))
      smaller.join(ssMin, "u")
        .select(least(col("v"), col("m")).as("a"),
          greatest(col("v"), col("m")).as("b"))
        .union(ssMin.select(col("m").as("a"), col("u").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    dump("cc_round_deduped", ccRound(dedupLargeStar = true))
    dump("cc_round_fused", ccRound(dedupLargeStar = false))
    spark.stop()
  }
}
