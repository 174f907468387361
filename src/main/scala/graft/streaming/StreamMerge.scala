package graft.streaming

import graft.operators.Joins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental MERGE materialization: a change feed folded into
  * a persistent gold snapshot one micro-batch at a time via `foreachBatch`
  * — the production pattern behind every "streaming upsert into a
  * lakehouse table" job (Delta's `MERGE` inside `foreachBatch`), and the
  * streaming twin of [[graft.operators.Joins.mergeApplyVersioned]]. The
  * reference's ES bulk-mutate sync (S12) is this exact shape: periodic
  * batches of changed documents folded into the serving index.
  *
  * Batch-local dedup (latest change per key inside the batch) runs
  * through the merge window before the fold, so a key changed five
  * times in one batch costs one gold row write, and the full-outer fold
  * is co-partitioned on the key — no broadcast assumption on either side.
  *
  * Ordering: gold carries `seqCol` and each fold is VERSION-GUARDED
  * (`mergeApplyVersioned` — a change applies only when its seq exceeds
  * the gold row's), so the feed needs no cross-batch ordering at all:
  * micro-batches, and the sibling part files of one multi-partition
  * extract, may arrive in any order. Per-key seq uniqueness (the CDC
  * log's LSN/offset) is the whole contract.
  *
  * Persistence protocol: copy-on-write version directories
  * (`<goldDir>/v<batchId>`), each batch reading the previous version and
  * writing the next — never reading and overwriting the same files (a
  * self-overwrite would truncate the input mid-scan). `foreachBatch`
  * executes sequentially on the driver, so the `current` pointer needs no
  * synchronization — and on start it RECOVERS from the newest complete
  * version dir under `goldDir`: if the streaming checkpoint survives a
  * process restart (committed batches get skipped), folding into an
  * empty base would silently discard all prior gold state. At 100 TB the
  * per-version rewrite becomes a partition-scoped overwrite (GoldTables'
  * incremental protocol) or a Delta/Iceberg MERGE — the fold plan is
  * identical.
  */
object StreamMerge {

  /** Stream `srcDir` JSONL through per-batch version-guarded MERGE folds;
    * returns the final gold snapshot path (`<goldDir>/v<lastBatch>`).
    * `changesOf` maps a raw micro-batch to change rows carrying `key`,
    * `seqCol` (per-key-unique, non-null), `opCol`, and the gold payload
    * columns. The returned snapshot schema is the change schema minus
    * `opCol` — `seqCol` stays in gold (it is the guard's state). */
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
    val goldPath = new org.apache.hadoop.fs.Path(goldDir)
    val fs = goldPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recover the pointer from the newest COMPLETE (_SUCCESS-marked)
    // version — a half-written crash victim must not become the base
    var current: Option[String] =
      if (!fs.exists(goldPath)) None
      else fs.listStatus(goldPath).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.matches("v\\d+") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .sortBy(_.getPath.getName.drop(1).toLong)
        // rebuild in the caller's path style (Path.toString would
        // prepend the fs scheme)
        .lastOption.map(st => s"$goldDir/${st.getPath.getName}")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val changes = changesOf(batch)
        val goldSchema = changes.drop(opCol)
        val prev = current match {
          case Some(p) => spark.read.parquet(p)
          case None    => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            goldSchema.schema)
        }
        val next = s"$goldDir/v$batchId"
        Joins.mergeApplyVersioned(prev, changes, key, seqCol, opCol)
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
