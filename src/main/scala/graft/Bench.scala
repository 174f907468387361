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
    "j2_chain_rollup",     // iterative pointer jumping (materialized dim)
    "j4_broadcast_lookup", // broadcast dim join
    "d_exact_dedup",       // content-hash dedup
    "d_minhash_lsh",       // minhash + LSH near-dup
    "v_ann_topk",          // brute-force ANN (native vec_dot)
    "t_token_count",       // text scoring pass
    "api_landing_page",    // end-to-end request interpreter
    "api_dataset_family",  // family expansion via identifier dim semi-join
    "api_portal_query",    // portal membership dim + collection filter
    "r_sushi_reports",     // sessionize → COUNTER → JSON report assembly
    "s2_bronze_slice",     // bronze write + partition-pruned slice read
    "d_chunk_dedup",       // chunk-grain substring dedup (window + regroup)
    "d_cdc_chunk_dedup",   // content-defined chunking (alignment-free cuts)
    "d_cdc_prod_hash",     // same CDC pipeline, xxhash64 cut rule (prices the oracle hash)
    "d_byte_cdc_dedup",    // char-grain CDC, md5-window cut rule (oracle mode)
    "d_byte_cdc_gear",     // char-grain CDC, native gear rolling hash (prices the window)
    "t_repetition",        // within-row repetition battery (shuffle-free)
    "a_hll_partial_merge", // re-aggregable HLL sketch rollup
    "q3_shipping_priority",// selective-dim fact join + global top-k
    "t_top_ngrams",        // bigram explosion with map-side combine
    "v_int8_quant",        // shuffle-free quantization projection
    "v_ivfpq_topk",        // serve from materialized IVF-PQ index (build amortized once)
    "j3_closure_pairs",    // iterative BFS/path-doubling closure (multi-job)
    "j_pagerank",          // iterative integer PageRank (10-round fixpoint)
    "t_bpe_pairs",         // BPE pair-count round (distinct-word table)
    "j1_equi_normalized",  // normalized-ID equi-join (J1 scale path)
    "t_bpe_tokenize",      // per-partition rank-priority BPE apply (mapPartitions)
    "v_semantic_dedup",    // cluster-scoped semantic near-dup (SemDeDup shape)
    "t_bpe_train",         // driver-local 256-round BPE training (scale path)
    "w_stream_sessions",   // streaming sessionization (state-store path)
    "v_semantic_dedup_split", // hot-cluster sub-split dedup (skewed corpus)
    "t_budget_select",     // token-budget selection (distributed prefix sum)
    "t_shard_shuffle",     // deterministic epoch shuffle (per-shard windows)
    "t_bigram_logprob",    // bigram LM score (corpus-wide dictionary join)
    "t_rag_chunks",        // sliding-window RAG chunking (scan-speed explode)
    "j_scd2_dimension",    // SCD2 build (two window passes, one exchange)
    "j_merge_apply",       // MERGE apply (co-partitioned full-outer fold)
    "t_significant_terms",// keyness agg (explode absorbed map-side + heap)
    "q8_market_share",     // 7-table join-order stress (Q8 shape)
    "j_pagerank_incremental", // warm-start re-converge, 3 rounds (prev ranks amortized once)
    "d_incremental_components", // daily dedup-group fold (contracted star contraction)
    "a_exact_quantiles",   // exact order statistics, no global sort (histogram quickselect)
    "a_kmv_cohort_overlap", // KMV sketch build + cohort union/intersect estimates
    "d_byte_incremental",  // incremental byte-grain near-dup fold (registry probe)
    "a_kmv_sliding_uniques", // rolling-window uniques from stored daily sketches
    "a_hist_quantile_rollup", // mergeable histogram quantile gold (summary-sized merge)
    "a_kmv_weighted_overlap", // weighted pair-sketch cohort intersection (tuple-sketch shape)
    "a_topk_sliding",      // rolling-window top-k from stored daily summaries
    "a_hist_sliding_quantiles", // rolling-window quantile bounds from stored histograms
    "j_triangle_count",    // degree-oriented triangle counting (wedge join bounded on hubs)
    "j_label_propagation", // 4-round synchronous LPA communities (join + 2 partial aggs/round)
    "j_ra_linkpred",       // resource-allocation link prediction (capped wedge join + top-k)
    "j_pagerank_personalized", // seed-teleport PPR, 6 rounds (sparse seed-vector carry)
    "v_mmr_rerank",        // MMR re-rank (m rounds × candidates join, corpus pass amortized)
    "v_kcenter_select",    // greedy k-center (k driver barriers, O(1) cached frames)
    "p_pipeline_e2e",      // composed clean→dedup→decontaminate→mix→pack chain
    "j_hits_scores",       // 2-round integer HITS (2 join+agg pairs per round)
    "d_dup_span_fraction", // ExactSubstr trim signal (gram explode + count shuffle)
    "t_kn_bigram_score",   // Kneser-Ney bigram scoring (dictionary join + type aggs)
    "a_seasonal_residuals",// weekday-seasonal baseline + MAD outlier windows
    "t_winnow_fingerprints", // winnowing fingerprints (native within-row expr)
    "d_dup_span_trim",     // ExactSubstr span removal (union fold + within-row rebuild)
    "w_stream_cdc_gold",   // streaming chunk-registry fold (read path after buildOnce)
    "d_winnow_pairs",      // MOSS candidate pairs (capped fingerprint self-join)
    "t_winnow_prod_hash",  // same pipeline, xxhash64 family (prices the md5 oracle hash)
    "w_stream_sessions_tws") // transformWithState tagging (RocksDB state path)

  /** Timed executions per query; the reported value is the MEDIAN, so a
    * single GC pause or compaction hiccup can't masquerade as a
    * regression (sub-second queries were at the edge of n=1 noise). */
  def timedRuns: Int =
    sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)

  /** Untimed executions before the timed runs. One is NOT enough: the
    * heaviest queries (q5's 5-way join) still trip C2 compilation in
    * timed run 1-2, and a median-of-3 then lands on a still-warming run —
    * measured as a phantom 0.99→1.30 s "regression" in round 5 (the
    * steady-state median over 15 runs was 0.978 s, identical to round 4).
    * Two warmups + median-of-5 pins the steady state the resident engine
    * actually serves. */
  def warmupRuns: Int =
    sys.env.get("SPARK_GRAFT_BENCH_WARMUPS").map(_.toInt).getOrElse(2)
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // dev-only subset filter for isolating one query's cost from the set
    // (regression attribution); the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(headline)(s => headline.filter(s))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same pinned timezone as Verify/tests: the NTZ→TIMESTAMP cast in
      // Tables.events and the sessionize/watermark arithmetic must compute
      // identical values regardless of the host machine's timezone
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen/parquet-footer paths so per-query numbers are
    // attributable to the query, not to whichever ran first. A broken
    // loader here must NOT kill the whole run (round 7: one stale events
    // loader turned 35 per-query numbers into rc=1 with no artifact) —
    // the per-query harness below already degrades failures to -1.
    Tables.all.foreach { t =>
      try {
        if (t == "events") Tables.events(spark, sfDir).count()
        else Tables.table(spark, sfDir, t).count()
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] warmup of table $t FAILED: ${e.getMessage}")
      }
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val results = selected.map { name =>
      val fn = SparkEntry.queries(name)
      // Untimed executions first: Catalyst analysis+optimization,
      // whole-stage-codegen compilation, C2 JIT, and materialized-
      // dimension builds happen before the clock starts; the measured
      // runs are the steady-state latency a resident engine serves (the
      // reference amortizes the same way — long-lived gunicorn workers +
      // daily-warmed response cache and sync-job dimensions,
      // `metricscachehandler.py:64-237`).
      (1 to warmupRuns).foreach { _ =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      }
      // a failing query must surface as -1, never as a spuriously fast
      // time-to-exception that corrupts round-over-round comparisons
      val times = (1 to timedRuns).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      val median =
        if (times.size < timedRuns) -1.0 // any failed run poisons the query
        else times.sorted.apply(times.size / 2)
      name -> median
    }.toMap
    // 4 decimals (0.1 ms) keeps the per-query map line short enough to
    // survive the driver's bounded tail capture (r11: the full-precision
    // map grew past the window and truncated the line mid-token ->
    // BENCH_r11.json parsed null)
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // total covers successful queries only; failed ones carry -1 per query
    val total = results.values.filter(_ >= 0).sum
    spark.stop()
    // Robust-tail output contract (r11 VERDICT #3): per-query lines first,
    // then the full contract line, then a SHORT total-only line as the
    // final stdout line — any tail window that keeps even one complete
    // trailing line always contains a parseable {"metric":"total"...}.
    results.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"""{"metric":"$k","value":${fmt(v)},"unit":"sec","sf":"$sfDir"}""")
    }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir"}""")
  }
}
