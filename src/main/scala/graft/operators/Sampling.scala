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

  /** Square-root temperature resampling (τ = 2, i.e. target share
    * p_s ∝ n_s^0.5 — the standard multilingual-LLM rebalance that
    * upweights tail languages without the low-resource overfitting a
    * uniform mix causes). No source is oversampled: the smallest source
    * anchors the budget at full rate and every larger source keeps
    * `rate_s = sqrt(n_min)/sqrt(n_s)` — the closed form after the share
    * normalization constant cancels against the budget, which is the
    * load-bearing numerical choice: there is NO float sum over sources
    * (whose addition order an SQL oracle cannot replay bit-exactly) and
    * sqrt is IEEE-correctly-rounded in both engines, unlike the libm
    * pow() a general-τ implementation would need. Same driver-side tiny
    * count agg + constant-folded shuffle-free hash gate as
    * [[mixToProportions]]; null sources are dropped.
    *
    * Returns (sampled df, rates used). */
  def temperatureMixSqrt(df: DataFrame, id: Column,
                         source: Column): (DataFrame, Map[String, Double]) = {
    val present = df.filter(source.isNotNull)
    val counts = present.groupBy(source.as("src"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no non-null source present in the data")
    val minN = counts.values.min
    val rates = counts.map { case (k, n) =>
      k -> math.sqrt(minN.toDouble) / math.sqrt(n.toDouble)
    }
    (stratifiedSample(present, id, source, rates, defaultRate = 0.0), rates)
  }

  /** Token-budget corpus selection: rank documents by a quality score
    * (descending, id-tiebroken) and keep the best prefix whose cumulative
    * token count stays within `total × numer/denom` — the "pick the best
    * N-billion-token subset" step of a training-data pipeline.
    *
    * The naive form is a single global-order cumulative-sum window — one
    * partition holding the whole corpus. This is the distributed exact
    * prefix sum instead: rows bucket by coarse score range, per-bucket
    * token totals (a tiny aggregate — the bucket domain is score-range /
    * `bucketWidth`, independent of corpus size) turn into exclusive
    * bucket offsets via a window over that tiny frame, and each bucket
    * then cumulates internally IN PARALLEL (window partitioned by
    * bucket). `offset + within-bucket running sum` is exactly the global
    * running sum, because buckets partition the score range monotonically
    * and equal scores always land in the same bucket. All arithmetic is
    * integral (counts, `div`) so the oracle replays bit-exactly.
    *
    * Requires an integral score (vocabulary counts, length classes,
    * quantized quality) — float scores would need an order-safe
    * quantization first. */
  def budgetSelect(df: DataFrame, id: Column, score: Column, tokens: Column,
                   budgetNumer: Long, budgetDenom: Long,
                   bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetNumer >= 0 && budgetDenom > 0 && bucketWidth > 0,
      "budgetSelect: budget fraction and bucket width must be positive")
    val base = df.select(id.as("doc_id"), score.as("score"),
      tokens.cast("long").as("tok"))
    // one-row corpus total, cross-joined so the budget stays in-plan
    val total = base.agg(sum(col("tok")).as("total_tok"))
    val bucketed = base.withColumn("bucket",
      floor(col("score") / bucketWidth).cast("long"))
    // exclusive prefix over DESC buckets = tokens in strictly-better
    // buckets; the frame is bucket-domain-sized, so the unpartitioned
    // window is a driver-bounded constant, not a corpus-sized sort
    val offW = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("tok")).as("btok"))
      .withColumn("boffset", coalesce(sum(col("btok")).over(offW), lit(0L)))
      .select(col("bucket"), col("boffset"))
    val inW = Window.partitionBy(col("bucket"))
      .orderBy(col("score").desc, col("doc_id").asc)
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tok", col("boffset") + sum(col("tok")).over(inW))
      .crossJoin(broadcast(total))
      .filter(col("cum_tok") <=
        expr(s"total_tok * ${budgetNumer}L div ${budgetDenom}L"))
      .select(col("doc_id"), col("score"), col("tok"), col("cum_tok"))
  }

  /** Deterministic epoch shuffle: the global training-order randomization
    * pass. Each row gets a pseudo-random 60-bit key from (id, epoch seed),
    * a shard = key mod `numShards`, and a position within its shard —
    * together a reproducible random permutation of the corpus, different
    * per epoch, stable under retries. One hash-partition shuffle on the
    * shard key; every shard orders independently in parallel (row_number
    * partitioned by shard) — there is NO global sort, which is what makes
    * the permutation feasible at 100 TB (a true global order would
    * funnel the corpus through one partition's sort). Readers stream
    * shards in (shard, pos) order; cross-shard interleave is the reader's
    * round-robin, as in real training loaders. */
  def epochShuffle(df: DataFrame, id: Column, epochSeed: String,
                   numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, "epochShuffle: numShards must be positive")
    val key = Dedup.hash60(concat(id.cast("string"), lit(":" + epochSeed)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key").asc, col("doc_id").asc)
    df.select(id.as("doc_id"), key.as("shuffle_key"))
      .withColumn("shard", col("shuffle_key") % numShards.toLong)
      .withColumn("pos", row_number().over(w))
  }
}
