package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines. (The
  * reference has no sampling; its nearest analogue is the first-100 DOI
  * truncation per report, `metricsreporter.py:632`.)
  *
  * Decisions are hash-gated, not `rand()`-gated: whether a row is kept is a
  * pure function of its id, so samples are reproducible across runs,
  * stable under retries/speculative tasks, and consistent between pipeline
  * stages that sample independently — properties `df.sample` cannot give.
  * Everything here is a pure projection-filter: no shuffle, no state; at
  * 100 TB the gate runs inside the scan's whole-stage-codegen.
  */
object Sampling {

  /** Uniform-ish value in [0, 1) derived from the id via md5 (60-bit) —
    * reproducible in ANSI SQL for the oracle; swap for xxhash64-based in
    * production (same plan shape, ~10× cheaper). */
  def hashUnit(id: Column): Column =
    Dedup.hash60(id.cast("string")) / lit(1152921504606846976.0) // 2^60

  /** Keep ~`fraction` of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, id: Column, fraction: Double): DataFrame =
    df.filter(hashUnit(id) < fraction)

  /** Exactly-k-per-group deterministic sample: rank each group's rows by
    * the id hash and keep the k smallest — a reproducible reservoir with a
    * FIXED size per stratum (rate-based gates give binomial sizes). One
    * group-key shuffle; the row_number window runs as WindowGroupLimit, so
    * each partition pre-prunes to its local top-k before the exchange. */
  def fixedSizePerGroup(df: DataFrame, id: Column, group: Column,
                        k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(hashUnit(id).asc, id.asc)
    df.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k).drop("_rank")
  }

  /** Weighted Bernoulli sampling: keep probability = weight/weightScale,
    * clamped to 1 — length- or quality-proportional corpus selection as a
    * shuffle-free deterministic gate (the linear-arithmetic form; rank
    * tricks like A-ExpJ need log/pow whose libm ULPs an SQL oracle can't
    * reproduce bit-for-bit). */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      weightScale: Double): DataFrame =
    df.filter(hashUnit(id) < least(weight / weightScale, lit(1.0)))

  /** Per-stratum sampling rates with a default — e.g. downsample dominant
    * languages, keep the tail at full rate. The (small) rate map
    * constant-folds into one when/otherwise chain: no join, no shuffle. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(hashUnit(id) < rate)
  }

  /** Resample a multi-source corpus to target mixture proportions (the
    * data-mixing step of a training pipeline): the achievable corpus size
    * is set by the most UNDER-represented source (budget = min over
    * sources of count/target), then every source is hash-downsampled to
    * its share of that budget — no source is oversampled, no duplication.
    * Sources absent from `targets` are dropped.
    *
    * The per-source counts are one small aggregation collected to the
    * driver — the source domain (languages, datasets, crawls) is tiny even
    * at 100 TB; the rates then constant-fold into the same shuffle-free
    * gate as [[stratifiedSample]]. Returns (sampled df, rates used). */
  def mixToProportions(df: DataFrame, id: Column, source: Column,
                       targets: Map[String, Double]): (DataFrame, Map[String, Double]) = {
    // String.valueOf: the source column may be any type (matched against
    // the string target keys); null sources can never match a target and
    // are therefore dropped, like any other untargeted source
    val counts = df.groupBy(source.as("src")).agg(count(lit(1)).as("n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val present = targets.filter { case (k, _) => counts.contains(k) }
    require(present.nonEmpty, "no target source present in the data")
    val budget = present.map { case (k, t) => counts(k).toDouble / t }.min
    val rates = present.map { case (k, t) =>
      k -> t * budget / counts(k).toDouble
    }
    val sampled = stratifiedSample(
      df.filter(source.isin(present.keys.toSeq: _*)), id, source,
      rates, defaultRate = 0.0)
    (sampled, rates)
  }
}
