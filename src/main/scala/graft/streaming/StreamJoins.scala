package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream joins — the §2.9 shape the batch interval join
  * (`Enrich.intervalJoin`) takes when both sides are unbounded.
  *
  * Reference analogue: the repair loop re-joins late events to their
  * session context (`eventprocessor.py:244-367`); declaratively that is a
  * watermarked interval join — Spark buffers each side's state only until
  * the watermark proves no matching row can still arrive, then evicts.
  */
object StreamJoins {

  /** Interval join of two event streams on `user_id`, keeping right
    * rows within `[left.ts - windowSeconds, left.ts]` — the streaming
    * attribution shape ("purchase joined to the clicks that preceded it").
    *
    * Both sides MUST carry the event-time range condition so Spark can
    * bound join state: each side's buffer holds at most
    * `watermarkDelay + windowSeconds` of data per user key — O(window),
    * not O(stream). Columns: left keeps its names; every right column
    * except the `user_id` join key is prefixed `r_`, so same-named
    * payload columns (event_type, value, …) never become ambiguous.
    *
    * `joinType` "inner" (default) emits matches in the micro-batch where
    * both rows are present; "left_outer" additionally emits unmatched
    * left rows with null `r_` columns — but only once the watermark
    * proves no matching right row can still arrive (state eviction), so
    * outer results trail the watermark by design.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, windowSeconds: Long,
                   watermarkDelay: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
    val r = right.columns.filter(_ != "user_id")
      .foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
      .withWatermark("r_ts", watermarkDelay)
    l.join(r,
      l("user_id") === r("user_id") &&
        col("r_ts") >= col("ts") - expr(s"interval $windowSeconds seconds") &&
        col("r_ts") <= col("ts"),
      joinType)
      .drop(r("user_id"))
  }

  /** End-to-end streaming interval join: two JSONL event feeds joined with
    * [[intervalJoin]], matched pairs appended to a parquet sink,
    * AvailableNow trigger — the graded-gate harness shape shared with
    * `StreamingSessionize`. Inner-join matches emit in the micro-batch
    * where both rows are present (the watermark only bounds join STATE,
    * it never delays inner-join output), so no sentinel row is needed. */
  def streamIntervalJoinToParquet(spark: SparkSession, leftDir: String,
                                  rightDir: String, schemaSource: DataFrame,
                                  outPath: String, checkpoint: String,
                                  windowSeconds: Long, watermarkDelay: String,
                                  readOptions: Map[String, String] = Map.empty,
                                  joinType: String = "inner"): Unit = {
    def feed(dir: String) = spark.readStream
      .schema(schemaSource.schema)
      .options(readOptions)
      .json(dir)
    val joined = intervalJoin(feed(leftDir), feed(rightDir),
      windowSeconds, watermarkDelay, joinType)
    joined.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
  }

  /** Stream-STATIC join to a parquet sink: each micro-batch of the JSONL
    * feed joins a batch dimension frame — Structured Streaming's
    * stateless enrichment join (no watermark, no state store; the static
    * side is re-planned per micro-batch, which is also how dimension
    * REFRESHES propagate mid-stream in production). The dim is expected
    * to be broadcast-sized (the F15/J4 regime); a too-big dim shifts to
    * a per-batch shuffle join with no API change. */
  def streamStaticJoinToParquet(spark: SparkSession, srcDir: String,
                                schemaSource: DataFrame, staticDim: DataFrame,
                                outPath: String, checkpoint: String,
                                joined: (DataFrame, DataFrame) => DataFrame,
                                readOptions: Map[String, String] = Map.empty): Unit = {
    val feed = spark.readStream
      .schema(schemaSource.schema)
      .options(readOptions)
      .json(srcDir)
    joined(feed, staticDim).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
  }
}
