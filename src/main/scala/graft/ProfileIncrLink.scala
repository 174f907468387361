package graft

import graft.operators.{Dedup, Joins}
import graft.queries.Scratch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev profiler for the r17 remaining targets: phase decomposition of
  * d_byte_incremental (chunk → probe → incremental fold, with per-round
  * connectedComponents timing) and j_ra_linkpred (edge derivation → und →
  * degrees → centers → wedge agg → anti+topK). Not part of any query. */
object ProfileIncrLink {
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
    Tables.documents(spark, sfDir).count() // warm
    Tables.lineitem(spark, sfDir).count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-48s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { iter =>
      println(s"--- iteration $iter ---")

      // ===== d_byte_incremental decomposition =====
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val noSp = translate(col("text"), " ", "")
      def clones(off: Long, pfx: String, lo: Long, hi: Long) =
        Tables.documents(spark, sfDir)
          .filter(col("doc_id") >= lo && col("doc_id") < hi)
          .select((col("doc_id") + off).as("doc_id"),
            concat(lit(pfx), noSp).as("text"))
      val oldDocs = docs.unionAll(clones(200000L, "Za", 0L, 40L))
      val newDocs = clones(300000L, "Qxxb", 0L, 40L)
        .unionAll(clones(400000L, "Mmm", 40L, 60L))
        .unionAll(clones(500000L, "Kzz", 40L, 60L))
      val base = Scratch.dir("byte_incr", sfDir)
      Scratch.buildOnce(base) {
        Dedup.byteCdcRegistry(
          Dedup.byteCdcChunks(oldDocs, col("doc_id"), col("text"),
            divisor = 64), minChunkLen = 16)
          .write.mode("overwrite").parquet(s"$base/registry")
        Dedup.byteCdcComponents(oldDocs, col("doc_id"), col("text"),
          divisor = 64)
          .write.mode("overwrite").parquet(s"$base/prev_labels")
      }
      val prevLabels = spark.read.parquet(s"$base/prev_labels")
      val prevRegistry = spark.read.parquet(s"$base/registry")

      time("BI total (full entry)") {
        val (labels, _) = Dedup.byteCdcIncremental(prevLabels, prevRegistry,
          Dedup.byteCdcChunks(newDocs, col("doc_id"), col("text"), divisor = 64))
        noop(labels.select(col("node").as("doc_id"), col("component")))
      }

      // phase decomposition
      val ncRaw = Dedup.byteCdcChunks(newDocs, col("doc_id"), col("text"),
        divisor = 64)
      time("BI p1 chunk newDocs (noop)")(noop(ncRaw))
      val nc = ncRaw.filter(length(col("chunk")) >= 16)
        .select(col("doc_id"), col("chunk")).distinct()
        .localCheckpoint(false)
      val newReg = nc.groupBy(col("chunk")).agg(min(col("doc_id")).as("nrep"))
        .localCheckpoint(false)
      val oldHits = nc.join(prevRegistry, Seq("chunk"))
        .select(col("doc_id").as("i"), col("rep").as("j"))
      val newHub = nc.join(newReg, Seq("chunk"))
        .select(col("doc_id").as("i"), col("nrep").as("j"))
      val delta = oldHits.union(newHub)
        .filter(col("i") =!= col("j")).distinct()
      val deltaM = time("BI p2 delta pairs materialize")(delta.localCheckpoint())
      println(s"[profile]   delta pairs: ${deltaM.count()}")
      time("BI p3 incrementalComponents(delta) noop") {
        noop(Dedup.incrementalComponents(prevLabels, deltaM))
      }

      // per-round connectedComponents timing on the contracted graph
      val prev = prevLabels.select(col("node"), col("component"))
        .localCheckpoint(false)
      val mapI = prev.select(col("node").as("__ni"), col("component").as("__ci"))
      val mapJ = prev.select(col("node").as("__nj"), col("component").as("__cj"))
      val contracted = deltaM
        .join(mapI, deltaM("i") === col("__ni"), "left")
        .join(mapJ, deltaM("j") === col("__nj"), "left")
        .select(coalesce(col("__ci"), deltaM("i")).as("i"),
          coalesce(col("__cj"), deltaM("j")).as("j"))
        .filter(col("i") =!= col("j"))
      val baseE = time("CC base distinct+checkpoint") {
        contracted.filter(col("i").isNotNull && col("j").isNotNull)
          .select(least(col("i"), col("j")).as("a"),
            greatest(col("i"), col("j")).as("b"))
          .distinct()
          .localCheckpoint()
      }
      var e = baseE.filter(col("a") =!= col("b"))
      var eCount = time("CC e count")(e.count())
      println(s"[profile]   contracted edges: $eCount")
      var converged = false
      var round = 0
      while (!converged && round < 16) {
        val next = time(s"CC round $round compute+checkpoint") {
          val both = e.select(col("a").as("u"), col("b").as("v"))
            .union(e.select(col("b").as("u"), col("a").as("v")))
          val lsMin = both.groupBy(col("u")).agg(min(col("v")).as("nmin"))
            .select(col("u"), least(col("u"), col("nmin")).as("m"))
          val ls = both.join(lsMin, "u").filter(col("v") > col("u"))
            .select(least(col("v"), col("m")).as("a"),
              greatest(col("v"), col("m")).as("b"))
            .filter(col("a") =!= col("b")).distinct()
          val smaller = ls.select(col("b").as("u"), col("a").as("v"))
          val ssMin = smaller.groupBy(col("u")).agg(min(col("v")).as("m"))
          smaller.join(ssMin, "u")
            .select(least(col("v"), col("m")).as("a"),
              greatest(col("v"), col("m")).as("b"))
            .union(ssMin.select(col("m").as("a"), col("u").as("b")))
            .filter(col("a") =!= col("b")).distinct()
            .localCheckpoint()
        }
        val nextCount = time(s"CC round $round count")(next.count())
        converged = nextCount == eCount &&
          time(s"CC round $round exceptAll.isEmpty")(next.exceptAll(e).isEmpty)
        e = next
        eCount = nextCount
        round += 1
      }
      println(s"[profile]   converged after $round rounds, edges $eCount")

      // ===== j_ra_linkpred decomposition =====
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val edges = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .withColumn("dst", lead(col("l_partkey"), 1).over(w))
        .filter(col("dst").isNotNull && col("dst") =!= col("l_partkey"))
        .select(col("l_partkey").as("src"), col("dst"))

      time("RA total (full entry, noop)") {
        noop(Joins.resourceAllocationPairs(edges, maxWedgeDegree = 64L,
          topK = 100))
      }
      time("RA p1 edges derivation (noop)")(noop(edges))
      val und = edges.select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull &&
          col("a") =!= col("b"))
        .distinct()
      time("RA p2 und distinct (noop)")(noop(und))
      val adj = und.select(col("a").as("w"), col("b").as("x"))
        .unionAll(und.select(col("b").as("w"), col("a").as("x")))
      val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("deg"))
      val okAdj = adj.join(deg.filter(col("deg") <= 64L), "w")
      time("RA p3 okAdj (noop)")(noop(okAdj))
      val centers = okAdj.groupBy(col("w"))
        .agg(min(col("deg")).as("deg"), collect_list(col("x")).as("xs"))
      time("RA p4 centers collect_list (noop)")(noop(centers))
      val wedges = centers
        .select(expr("1000000L div deg").as("c"),
          array_sort(col("xs")).as("xs"))
        .select(col("xs"), col("c"), posexplode(col("xs")).as(Seq("i", "a")))
        .select(col("a"),
          explode(expr("slice(xs, i + 2, size(xs) - i - 1)")).as("b"),
          col("c"))
      println(s"[profile]   wedge rows: ${wedges.count()}")
      val scored = wedges.groupBy(col("a"), col("b"))
        .agg(sum(col("c")).as("score_micro"), count(lit(1)).as("n_common"))
      time("RA p5 wedge agg (noop)")(noop(scored))
      val anti = scored.join(und, Seq("a", "b"), "left_anti")
      time("RA p6 anti-join (noop)")(noop(anti))
      time("RA p7 topK") {
        anti.orderBy(col("score_micro").desc, col("a"), col("b"))
          .limit(100).count()
      }
    }
    spark.stop()
  }
}
