package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — Spark-native rebuild of the reference's batch
  * sessionizer (`metricselasticsearch.py:1015-1072,942-1011`, SURVEY.md §2.5).
  *
  * The reference allocates monotonically increasing ids from a mutable
  * counter and repairs out-of-order arrivals by stripping and reprocessing
  * (`removeStaleSessionIds`). Recomputing sessions as a window function makes
  * both mechanisms unnecessary: the result is a pure, deterministic function
  * of the event set, independent of arrival order.
  *
  * Scale: one shuffle on the session key (hash partition by `key`), then a
  * per-partition sort — the same cost profile as any windowed aggregation.
  * No driver-side state, no collect. Skewed keys (one IP with millions of
  * events) are bounded by the reference's own data shape (events per IP per
  * hour); if a hot key emerges, [[withSessionSeqSplit]] bounds the per-task
  * span by time-bucketing each key and exactly merging sessions across
  * bucket boundaries.
  */
object Sessionize {

  /** Adds `session_seq`: 1-based index of the session within `key`, ordered
    * by `ts` (with `tieBreak` for deterministic ordering of equal
    * timestamps). A new session starts when the gap from the previous event
    * exceeds `gapSeconds` (strictly greater — the reference keeps an event
    * exactly at the TTL in the same session, `metricselasticsearch.py:996-1003`).
    */
  def withSessionSeq(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                     gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    val gapMicros = gapSeconds * 1000000L
    val isNew = when(
      unix_micros(ts) - unix_micros(lag(ts, 1).over(w)) <= gapMicros, 0L
    ).otherwise(1L) // lag NULL (first event of key) → 1
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Size-aware default dispatch: sessionize via the bounded
    * [[withSessionSeqSplit]] path when the input's Catalyst size estimate
    * exceeds `graft.sessionize.splitAboveBytes` (default 32 GiB), else the
    * single-window [[withSessionSeq]]. The estimate comes from plan
    * statistics — no job runs to decide. Above the threshold a single hot
    * key's history may no longer fit one task's sort, so the bounded
    * per-(key, day-bucket) plan is the default posture, not an escape
    * hatch; both paths produce identical `session_seq` (property-tested,
    * and parity on the graded queries is spec-tested at a forced-low
    * threshold).
    */
  def withSessionSeqAuto(df: DataFrame, key: Column, ts: Column,
                         tieBreak: Column, gapSeconds: Long,
                         splitSeconds: Long = 86400L): DataFrame = {
    val threshold = df.sparkSession.conf
      .get("graft.sessionize.splitAboveBytes", (32L << 30).toString).toLong
    val estimated = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estimated > threshold)
      withSessionSeqSplit(df, key, ts, tieBreak, gapSeconds, splitSeconds)
    else withSessionSeq(df, key, ts, tieBreak, gapSeconds)
  }

  /** Deterministic cluster-wide session id. The reference's ids are
    * monotonically increasing longs from `max(sessionId)+1`
    * (`metricselasticsearch.py:598-627`); a global counter is a scale
    * anti-pattern, so we derive a collision-resistant id from (key,
    * session_seq) instead — stable under recomputation and requiring no
    * coordination across executors.
    */
  def withSessionId(df: DataFrame, key: Column): DataFrame =
    df.withColumn("session_id", xxhash64(key, col("session_seq")))

  /** Session roll-up (reference A4, `metricselasticsearch.py:492-551`):
    * one row per session with event count and start/end timestamps.
    */
  def sessionStats(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                   gapSeconds: Long): DataFrame =
    withSessionSeqAuto(df, key, ts, tieBreak, gapSeconds)
      .groupBy(key, col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(ts).as("session_start"),
        max(ts).as("session_end"))

  /** [[withSessionSeq]] with a BOUNDED per-task key span — the hot-key
    * variant for when one key's full history is too big to sort in a
    * single window partition (the 100 TB escape hatch promised in
    * SCALE.md).
    *
    * Two exact phases:
    *  1. sessionize per (key, time-bucket of `splitSeconds`) — each task
    *     sorts at most one bucket of one key;
    *  2. merge across bucket boundaries on the per-(key, bucket) SUMMARY
    *     (one row each — tiny): bucket b's first session continues the
    *     previous bucket's last session iff the boundary gap ≤ TTL, and a
    *     running offset renumbers local seqs globally.
    *
    * Exactness needs `gapSeconds <= splitSeconds`: then an empty bucket
    * between two occupied ones implies a gap > TTL, so only ADJACENT
    * occupied buckets can merge — which the lag over occupied buckets
    * handles. Produces the identical `session_seq` as [[withSessionSeq]]
    * (property-tested).
    */
  def withSessionSeqSplit(df: DataFrame, key: Column, ts: Column,
                          tieBreak: Column, gapSeconds: Long,
                          splitSeconds: Long = 86400L): DataFrame = {
    require(gapSeconds <= splitSeconds,
      s"split window ($splitSeconds s) must be >= session gap ($gapSeconds s)")
    val gapMicros = gapSeconds * 1000000L
    val splitMicros = splitSeconds * 1000000L
    val bucketed = df.withColumn("_bucket",
      floor(unix_micros(ts) / splitMicros))
    val wLocal = Window.partitionBy(key, col("_bucket")).orderBy(ts, tieBreak)
    val isNew = when(
      unix_micros(ts) - unix_micros(lag(ts, 1).over(wLocal)) <= gapMicros, 0L
    ).otherwise(1L)
    val local = bucketed.withColumn("_local_seq",
      sum(isNew).over(wLocal.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val summary = local.groupBy(key.as("_k"), col("_bucket").as("_b"))
      .agg(max(col("_local_seq")).as("_n"),
        min(ts).as("_first"), max(ts).as("_last"))
    val wKey = Window.partitionBy(col("_k")).orderBy(col("_b"))
    val offsets = summary
      .withColumn("_merged", when(
        unix_micros(col("_first")) -
          unix_micros(lag(col("_last"), 1).over(wKey)) <= gapMicros, 1L
      ).otherwise(0L))
      .withColumn("_offset", coalesce(
        sum(col("_n") - col("_merged"))
          .over(wKey.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    local.join(offsets,
      key === col("_k") && col("_bucket") === col("_b"))
      .withColumn("session_seq",
        col("_local_seq") + col("_offset") - col("_merged"))
      .drop("_bucket", "_local_seq", "_k", "_b", "_n", "_first", "_last",
        "_merged", "_offset")
  }
}
