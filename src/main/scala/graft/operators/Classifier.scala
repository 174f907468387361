package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier — the fastText-shaped model
  * behind production quality filters (CCNet/RefinedWeb-style "keep if the
  * classifier says wiki-like"). The reference has no model-based scoring
  * (its quality signals are the heuristic ratios in `t_quality`); this is
  * the LLM-pipeline extension: score = mean weight of hashed unigram +
  * bigram features, keep when the margin is positive.
  *
  * Scale shape: scoring is a PURE PROJECTION — hash, bucket, weight, and
  * left-to-right fold all happen inside one narrow stage per document, so
  * a 100 TB corpus scores with zero shuffles and the filter composes with
  * any downstream pipeline for free. No vocabulary join: feature hashing
  * (Weinberger et al., ICML'09) replaces the dictionary lookup exactly so
  * the model broadcasts as arithmetic, not data.
  *
  * Determinism: weights are integer "milliweights" summed as LONG (one
  * float division at the end), so partial order can never move the score
  * — the same exact-arithmetic discipline as `t_unigram_logprob`. The
  * weight table here is a deterministic hash of the bucket id (a fixed
  * stand-in the DuckDB oracle replays); production swaps in learned
  * weights via a `Map[Int, Int]` literal — same plan, same contract.
  */
object Classifier {

  /** Feature-hash buckets. */
  val NumBuckets = 512

  /** md5-derived 60-bit hash (oracle-reproducible; prod: xxhash64) —
    * shared native expression, bit-parity-tested in Hash60Spec. */
  private def hash60(c: Column): Column = graft.operators.Dedup.hash60(c)

  /** Integer weight in [-1000, 1000] for the feature bucket of `c`:
    * bucket = hash60 % 512, then a Knuth multiplicative scramble stands
    * in for the learned weight table. */
  private def milliWeight(c: Column): Column =
    (hash60(c) % NumBuckets) * lit(2654435761L) % 2001L - 1000L

  /** Score `df`: (idCol, n_features, quality_score, keep) — mean
    * milliweight of hashed unigrams + adjacent bigrams over the
    * whitespace tokenization of `text`, as a fraction of 1.0. */
  def score(df: DataFrame, id: Column, text: Column): DataFrame = {
    val ws = split(text, " ")
    // sequence(1,0) counts DOWN in Spark — guard the bigram range
    val biGrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => milliWeight(concat(element_at(ws, i), lit(" "),
          element_at(ws, i + 1)))))
      .otherwise(array().cast("array<long>"))
    val uniSum = aggregate(transform(ws, milliWeight(_)), lit(0L), _ + _)
    val biSum = aggregate(biGrams, lit(0L), _ + _)
    val nFeat = (size(ws) + size(biGrams)).cast("long")
    df.select(id.as("doc_id"), nFeat.as("n_features"),
        ((uniSum + biSum).cast("double") /
          (nFeat * 1000L).cast("double")).as("quality_score"))
      .withColumn("keep", col("quality_score") > 0.0)
  }
}
