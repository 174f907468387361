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
  * hour); if a hot key emerges, pre-split by day before sessionizing —
  * sessions never span a 60-min gap, so day boundaries with 1h overlap are
  * safe split points.
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
    withSessionSeq(df, key, ts, tieBreak, gapSeconds)
      .groupBy(key, col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(ts).as("session_start"),
        max(ts).as("session_end"))
}
