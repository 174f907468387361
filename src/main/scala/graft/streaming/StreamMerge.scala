package graft.streaming

import graft.operators.Joins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental MERGE materialization: a change feed folded into
  * a persistent gold snapshot one micro-batch at a time via `foreachBatch`
  * — the production pattern behind every "streaming upsert into a
  * lakehouse table" job (Delta's `MERGE` inside `foreachBatch`), and the
  * streaming twin of [[graft.operators.Joins.mergeApply]]. The reference's
  * ES bulk-mutate sync (S12) is this exact shape: periodic batches of
  * changed documents folded into the serving index.
  *
  * Batch-local dedup (latest change per key inside the batch) runs
  * through `mergeApply`'s window before the fold, so a key changed five
  * times in one batch costs one gold row write, and the full-outer fold
  * is co-partitioned on the key — no broadcast assumption on either side.
  *
  * Persistence protocol: copy-on-write version directories
  * (`<goldDir>/v<batchId>`), each batch reading the previous version and
  * writing the next — never reading and overwriting the same files (a
  * self-overwrite would truncate the input mid-scan). `foreachBatch`
  * executes sequentially on the driver, so the `current` pointer needs no
  * synchronization. At 100 TB the per-version rewrite becomes a
  * partition-scoped overwrite (GoldTables' incremental protocol) or a
  * Delta/Iceberg MERGE — the fold plan is identical.
  *
  * CONTRACT: the feed must be key-progress-ordered across batches (each
  * key's changes arrive in `seqCol` order, the property every CDC
  * log/offset feed provides); within a batch, order is free. A
  * version-guard variant (only apply `seq > gold.seq`) would lift the
  * cross-batch requirement at the cost of carrying `seq` in gold.
  */
object StreamMerge {

  /** Stream `srcDir` JSONL through per-batch MERGE folds; returns the
    * final gold snapshot path (`<goldDir>/v<lastBatch>`). `changesOf`
    * maps a raw micro-batch to change rows carrying `key`, `seqCol`,
    * `opCol`, and the gold payload columns. */
  def streamMergeGold(spark: SparkSession, srcDir: String,
                      schemaSource: DataFrame, goldDir: String,
                      checkpoint: String, key: String, seqCol: String,
                      opCol: String, changesOf: DataFrame => DataFrame,
                      readOptions: Map[String, String] = Map.empty): String = {
    val stream = spark.readStream
      .schema(schemaSource.schema)
      .option("mode", "DROPMALFORMED")
      .option("maxFilesPerTrigger", "1")
      .options(readOptions)
      .json(srcDir)
    var current: Option[String] = None
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val changes = changesOf(batch)
        val goldSchema = changes.drop(seqCol, opCol)
        val prev = current match {
          case Some(p) => spark.read.parquet(p)
          case None    => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            goldSchema.schema)
        }
        val next = s"$goldDir/v$batchId"
        Joins.mergeApply(prev, changes, key, seqCol, opCol)
          .write.mode("overwrite").parquet(next)
        current = Some(next)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    current.getOrElse(
      throw new IllegalStateException("stream produced no batches"))
  }
}
