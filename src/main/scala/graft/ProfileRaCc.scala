package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev A/B profiler for r17: j_ra_linkpred wedge-pipeline variants and a
  * fused-probe connectedComponents variant. Times are wall-clock per
  * variant on identical inputs; results are cross-checked for equality
  * before any variant is considered. Not part of any query. */
object ProfileRaCc {
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
    Tables.lineitem(spark, sfDir).count() // warm

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-52s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def edges = {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .withColumn("dst", lead(col("l_partkey"), 1).over(w))
        .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
        .select(col("l_partkey").as("src"), col("dst"))
    }

    def undOf(e: DataFrame) = e.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()

    // variant A: current shape (collect_list + posexplode/slice generate)
    def variantA(und: DataFrame): DataFrame = {
      val adj = und.select(col("a").as("w"), col("b").as("x"))
        .unionAll(und.select(col("b").as("w"), col("a").as("x")))
      val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("deg"))
      val okAdj = adj.join(deg.filter(col("deg") <= 64L), "w")
      val centers = okAdj.groupBy(col("w"))
        .agg(min(col("deg")).as("deg"), collect_list(col("x")).as("xs"))
      centers
        .select(expr("1000000L div deg").as("c"), array_sort(col("xs")).as("xs"))
        .select(col("xs"), col("c"), posexplode(col("xs")).as(Seq("i", "a")))
        .select(col("a"),
          explode(expr("slice(xs, i + 2, size(xs) - i - 1)")).as("b"),
          col("c"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("c")).as("score_micro"), count(lit(1)).as("n_common"))
        .join(und, Seq("a", "b"), "left_anti")
        .orderBy(col("score_micro").desc, col("a"), col("b")).limit(100)
    }

    // variant C: SMJ/SHJ self-join wedge generation (no arrays)
    def variantC(und: DataFrame): DataFrame = {
      val adj = und.select(col("a").as("w"), col("b").as("x"))
        .unionAll(und.select(col("b").as("w"), col("a").as("x")))
      val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("deg"))
      val okAdj = adj.join(deg.filter(col("deg") <= 64L), "w")
        .select(col("w"), col("x"), expr("1000000L div deg").as("c"))
      val l = okAdj.select(col("w"), col("x").as("a"), col("c"))
      val r = okAdj.select(col("w").as("w2"), col("x").as("b"))
      l.join(r, col("w") === col("w2") && col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("c")).as("score_micro"), count(lit(1)).as("n_common"))
        .join(und, Seq("a", "b"), "left_anti")
        .orderBy(col("score_micro").desc, col("a"), col("b")).limit(100)
    }

    (1 to 2).foreach { iter =>
      println(s"--- iteration $iter ---")
      // stats once
      if (iter == 1) {
        val und = undOf(edges).localCheckpoint()
        println(s"[profile]   und edges: ${und.count()}")
        val adj = und.select(col("a").as("w"), col("b").as("x"))
          .unionAll(und.select(col("b").as("w"), col("a").as("x")))
        val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("deg"))
        val okAdj = adj.join(deg.filter(col("deg") <= 64L), "w")
        println(s"[profile]   okAdj rows: ${okAdj.count()}")
        val wedges = okAdj.groupBy(col("w"))
          .agg(min(col("deg")).as("deg"), collect_list(col("x")).as("xs"))
          .select(expr("1000000L div deg").as("c"), array_sort(col("xs")).as("xs"))
          .select(col("xs"), col("c"), posexplode(col("xs")).as(Seq("i", "a")))
          .select(col("a"),
            explode(expr("slice(xs, i + 2, size(xs) - i - 1)")).as("b"),
            col("c"))
        val surv = wedges.join(und, Seq("a", "b"), "left_anti")
        println(s"[profile]   wedge rows surviving anti: ${surv.count()}")
        println(s"[profile]   distinct scored pairs: " +
          s"${surv.select(col("a"), col("b")).distinct().count()}")
      }

      time("RA A current (fresh und subtree)")(noop(variantA(undOf(edges))))
      time("RA A current + und lazy cp") {
        noop(variantA(undOf(edges).localCheckpoint(false)))
      }
      time("RA C selfjoin (fresh und subtree)")(noop(variantC(undOf(edges))))
      time("RA C selfjoin + und lazy cp") {
        noop(variantC(undOf(edges).localCheckpoint(false)))
      }
      // result equality check (once)
      if (iter == 1) {
        val ra = variantA(undOf(edges)).collect().toSeq
        val rc = variantC(undOf(edges)).collect().toSeq
        println(s"[profile]   A == C results: ${ra == rc} (${ra.size} rows)")
      }
    }
    spark.stop()
  }
}
