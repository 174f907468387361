package graft.queries

import graft.Tables
import graft.operators.{Dedup, Packing, Sampling}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end LLM training-data pipeline composition — the data-pipeline
  * analogue of `api_landing_page`: every stage below is individually
  * graded elsewhere (`t_clean_pipeline`, `d_exact_dedup`, `d_minhash_lsh`,
  * `d_decontaminate`, `t_mixture_sample`, `t_pack_sequences`), but only a
  * composed run grades the COLUMN CONTRACTS between stages — the places
  * where a real pipeline actually breaks (a stage dropping a column the
  * next one needs, a filter applied to the wrong side of a dedup, a
  * benchmark slice leaking into its own decontamination corpus).
  *
  * Chain (the standard pre-training corpus order — cheapest gates first,
  * so each stage's cost falls on fewer rows):
  *   1. quality clean (C4-style gates)          — pure projection+filter
  *   2. exact dedup, min-id survivor            — 1 hash shuffle
  *   3. MinHash-LSH near-dup removal, keep-first — band-join candidates
  *   4. benchmark decontamination (8-grams)     — broadcast semi-join
  *   5. mixture resample to language targets    — hash-gated projection
  *   6. sequence packing into token bins        — per-shard window
  *
  * Scale: no stage is all-pairs (LSH bands bound stage 3; the 8-gram
  * probe is an inverted-index join in stage 4), and stages 1/5 are
  * shuffle-free maps, so the composition inherits each stage's own
  * SCALE.md budget — the chain adds NO new shuffle beyond the per-stage
  * ones plus the keep-set semi-joins (hash equi-joins on doc_id).
  *
  * Determinism: every stage's survivor rule is id-deterministic (min-id,
  * keep-first toward the smaller id, md5 hash gates), so the composed
  * output is bit-stable under retries and both engines replay it exactly.
  */
object PipelineQueries {

  /** Benchmark split: doc_id ≡ 0 (mod 61) — the same slice
    * `d_decontaminate` grades, so the hit path is known-exercised. */
  private val BenchMod = 61

  private def cleanGate(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nToks = size(toks)
    val stopRatio = size(filter(toks, t => t.isin(TextQueries.StopEn: _*)))
      .cast("double") / nToks.cast("double")
    val avgLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
      .cast("double") / nToks.cast("double")
    docs
      .withColumn("n_tokens", nToks.cast("long"))
      .withColumn("avg_tok_len", avgLen)
      .withColumn("stop_ratio", stopRatio)
      .filter(col("n_tokens") >= 5 && col("n_tokens") <= 5000 &&
        col("avg_tok_len") >= 2 && col("avg_tok_len") <= 12 &&
        col("stop_ratio") >= 0.01)
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
  }

  /** One materialized stage chain per corpus dir: [[stagesBuild]] lazily
    * checkpoints its two reused frontiers, and a checkpoint pins its RDD
    * blocks for the frame's lifetime — rebuilding the chain per
    * invocation (bench's 5 timed reps × 2 queries) would strand ~20
    * corpus-sized frames in executor storage (r11 ADVICE). Latching the
    * chain per (dir) caps the pinned set at the two frontiers, exactly
    * like the other build-once artifacts (IVF index, bronze layout).
    *
    * Keyed by (session, dir), not dir alone: the cached frames (and
    * their pinned localCheckpoint RDDs) are bound to the SparkSession
    * that built them — a second session in the same JVM querying the
    * same dir must build its own chain, not receive frames belonging to
    * a possibly-stopped session (r12 ADVICE). */
  private val stageCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Seq[DataFrame]]()

  private def stages(s: SparkSession, dir: String): Seq[DataFrame] =
    stageCache.computeIfAbsent((s, dir), _ => stagesBuild(s, dir))

  /** Runs stages 1–5, returning each stage's survivor frame (index 0 =
    * cleaned, 4 = mixed). Shared by the e2e and audit queries. */
  private def stagesBuild(s: SparkSession, dir: String): Seq[DataFrame] = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val bench = docs.filter(col("doc_id") % BenchMod === 0)
    val corpus = docs.filter(col("doc_id") % BenchMod =!= 0)
    val cleaned = cleanGate(corpus)
    val keepIds = Dedup.exactDedup(cleaned, col("doc_id"), col("text"))
      .select(col("keep_id").as("doc_id"))
    // Materialize the two reused stage frontiers: the chain is a DAG —
    // `deduped` feeds the LSH pair build AND the anti-join left side,
    // `decon` feeds the mixture-rate count AND the final semi-join — and
    // without a cut Spark replays the whole prefix per consumer (measured
    // 6.8 s -> the prefix ran ~2-6x per action). A production chain
    // materializes every stage to the lake (bronze/silver/gold); the
    // lazy localCheckpoint is the in-query equivalent, paid once.
    val deduped = cleaned.join(keepIds, Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    // keep-first near-dup rule: any doc that is the LARGER member of a
    // verified pair is dropped — deterministic, order-free, and exactly
    // replayable in SQL (full transitive components are graded
    // separately in d_dedup_groups; a production chain picks one)
    val dropJ = Dedup.minhashLshPairs(deduped, col("doc_id"), col("text"),
        shingleSize = 3, numHashes = 8, bands = 4, threshold = 0.5)
      .select(col("j").as("doc_id")).distinct()
    val neared = deduped.join(dropJ, Seq("doc_id"), "left_anti")
    val contaminated = Dedup.decontaminationFlags(
        corpus = neared, benchmark = bench,
        col("doc_id"), col("text"), n = 8)
      .filter(col("contaminated")).select(col("doc_id"))
    val decon = neared.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    val (sampledIds, _) = Sampling.mixToProportions(
      decon.select(col("doc_id"), col("lang")), col("doc_id"), col("lang"),
      Map("en" -> 0.5, "es" -> 0.3, "de" -> 0.2))
    val mixed = decon.join(sampledIds.select("doc_id"),
      Seq("doc_id"), "left_semi")
    Seq(cleaned, deduped, neared, decon, mixed)
  }

  /** Oracle CTE chain mirroring [[stages]]: ends with `mx` = the stage-5
    * survivor set carrying (doc_id, lang, n_tokens). */
  private lazy val stagesCte: String = {
    val gram8 = (0 until 8).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""docs0 AS (SELECT doc_id, lang, text FROM documents
       |          WHERE doc_id % $BenchMod <> 0),
       |tok AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
       |        FROM docs0),
       |qg AS (SELECT doc_id, lang, text,
       |         length(toks)::BIGINT AS n_tokens,
       |         list_reduce(list_transform(toks, t -> length(t)::BIGINT),
       |           (a, b) -> a + b)::DOUBLE / length(toks) AS avg_tok_len,
       |         length(list_filter(toks,
       |           t -> t IN (${TextQueries.sqlList(TextQueries.StopEn)})))::DOUBLE
       |           / length(toks) AS stop_ratio
       |       FROM tok),
       |clean AS (SELECT doc_id, lang, text, n_tokens FROM qg
       |          WHERE n_tokens >= 5 AND n_tokens <= 5000
       |            AND avg_tok_len >= 2 AND avg_tok_len <= 12
       |            AND stop_ratio >= 0.01),
       |keepex AS (SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)),
       |dd AS (SELECT c.* FROM clean c JOIN keepex USING (doc_id)),
       |${DedupQueries.minhashBandsCte(
            "SELECT doc_id, string_split(text, ' ') AS w FROM dd")},
       |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |         FROM bk a JOIN bk b ON a.band_key = b.band_key
       |                            AND a.doc_id < b.doc_id),
       |ver AS (SELECT i, j,
       |          length(list_intersect(si.sh, sj.sh))::DOUBLE /
       |            length(list_distinct(si.sh || sj.sh)) AS jac
       |        FROM cand JOIN s si ON si.doc_id = cand.i
       |                  JOIN s sj ON sj.doc_id = cand.j),
       |dropj AS (SELECT DISTINCT j AS doc_id FROM ver WHERE jac >= 0.5),
       |nd AS (SELECT * FROM dd
       |       WHERE doc_id NOT IN (SELECT doc_id FROM dropj)),
       |w8 AS (SELECT doc_id, string_split(text, ' ') AS w FROM nd),
       |sh8 AS (SELECT doc_id, unnest(list_distinct(CASE WHEN length(w) >= 8
       |          THEN list_transform(generate_series(1, length(w) - 7),
       |                 i -> $gram8)
       |          ELSE [] END)) AS g
       |        FROM w8),
       |bw8 AS (SELECT string_split(text, ' ') AS w FROM documents
       |        WHERE doc_id % $BenchMod = 0),
       |bsh AS (SELECT DISTINCT g FROM (
       |          SELECT unnest(CASE WHEN length(w) >= 8
       |            THEN list_transform(generate_series(1, length(w) - 7),
       |                   i -> $gram8)
       |            ELSE [] END) AS g
       |          FROM bw8)),
       |cont AS (SELECT DISTINCT sh8.doc_id FROM sh8 JOIN bsh USING (g)),
       |dc AS (SELECT * FROM nd
       |       WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
       |cnt AS (SELECT lang, count(*) AS n FROM dc
       |        WHERE lang IN ('en', 'es', 'de') GROUP BY 1),
       |bud AS (SELECT min(n::DOUBLE / (CASE lang WHEN 'en' THEN 0.5
       |                                          WHEN 'es' THEN 0.3
       |                                          WHEN 'de' THEN 0.2 END)::DOUBLE)
       |          AS t FROM cnt),
       |rt AS (SELECT lang,
       |         (CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3
       |                    WHEN 'de' THEN 0.2 END)::DOUBLE * t / n::DOUBLE
       |           AS rate
       |       FROM cnt, bud),
       |mx AS (SELECT dc.doc_id, dc.lang, dc.n_tokens FROM dc JOIN rt USING (lang)
       |       WHERE ('0x' || substring(md5(dc.doc_id::VARCHAR), 1, 15))::BIGINT
       |               / 1152921504606846976.0 < rate)""".stripMargin
  }

  val entries: Seq[GraftQuery] = Seq(

    // The composed pipeline's final artifact: packed fixed-length token
    // bins over the clean→dedup→near-dedup→decontaminate→mix survivors.
    // Row-exact means every stage's survivor SET and the packing's
    // window arithmetic all agreed with the oracle simultaneously.
    GraftQuery("p_pipeline_e2e",
      (s, dir) => {
        val mixed = stages(s, dir).last
        Packing.packSequences(mixed, col("doc_id"),
          col("n_tokens").cast("long"), shards = 16, capacity = 2048L)
      },
      Some(s"""WITH $stagesCte
              |SELECT doc_id, n_tokens, (doc_id % 16)::INT AS shard,
              |       (sum(n_tokens) OVER
              |          (PARTITION BY doc_id % 16 ORDER BY doc_id))::BIGINT
              |         AS cum_tokens,
              |       ((sum(n_tokens) OVER
              |           (PARTITION BY doc_id % 16 ORDER BY doc_id)
              |         - n_tokens) // 2048)::BIGINT AS bin,
              |       (sum(n_tokens) OVER
              |          (PARTITION BY doc_id % 16 ORDER BY doc_id)
              |        - n_tokens
              |        - ((sum(n_tokens) OVER
              |              (PARTITION BY doc_id % 16 ORDER BY doc_id)
              |            - n_tokens) // 2048) * 2048)::BIGINT AS bin_offset
              |FROM mx""".stripMargin)),

    // Stage-level audit of the same chain: survivor count and token sum
    // after every stage — the funnel a pipeline owner actually watches,
    // and a localized diagnosis when p_pipeline_e2e drifts (the first
    // stage whose row disagrees is the broken one).
    GraftQuery("p_pipeline_audit",
      (s, dir) => {
        val names = Seq("1_clean", "2_exact_dedup", "3_near_dedup",
          "4_decontaminate", "5_mixture")
        stages(s, dir).zip(names).map { case (df, n) =>
          df.agg(count(lit(1)).as("n_docs"),
              coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"))
            .select(lit(n).as("stage"), col("n_docs"), col("total_tokens"))
        }.reduce(_ unionAll _)
      },
      Some(s"""WITH $stagesCte
              |SELECT '1_clean' AS stage, count(*) AS n_docs,
              |       coalesce(sum(n_tokens), 0)::BIGINT AS total_tokens FROM clean
              |UNION ALL
              |SELECT '2_exact_dedup', count(*),
              |       coalesce(sum(n_tokens), 0)::BIGINT FROM dd
              |UNION ALL
              |SELECT '3_near_dedup', count(*),
              |       coalesce(sum(n_tokens), 0)::BIGINT FROM nd
              |UNION ALL
              |SELECT '4_decontaminate', count(*),
              |       coalesce(sum(n_tokens), 0)::BIGINT FROM dc
              |UNION ALL
              |SELECT '5_mixture', count(*),
              |       coalesce(sum(n_tokens), 0)::BIGINT FROM mx""".stripMargin)))
}
