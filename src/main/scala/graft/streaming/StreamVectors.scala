package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance for the IVF-PQ serving index — the last
  * incremental artifact in the repo gaining a streaming twin (the chunk
  * registry, gold snapshots, and sketch tables already have theirs).
  *
  * Each micro-batch of new embeddings is coded under the FROZEN model
  * (coarse centroids + codebooks — retraining is the drift gate's job,
  * `v_ivfpq_drift`) and written as its own cluster-partitioned index
  * GENERATION `<indexDir>/gen=<batchId>`. Nothing existing is ever
  * rewritten: a batch touches only its own directory, and because the
  * generation directory is named as a PARTITION (`gen=<batchId>`), one
  * plain read of `indexDir` discovers every generation as a partition
  * column — serving needs no directory listing and cluster pruning
  * still applies beneath each generation
  * ([[graft.operators.Vectors.ivfPqTopKFromIndex]] just works).
  *
  * Exactly-once: `foreachBatch` is at-least-once, and a replayed parquet
  * APPEND would duplicate index rows (a duplicated neighbor then occupies
  * two ranks of a served top-k — not a benign dup). The batchId names the
  * generation directory, so replay detection is a `_SUCCESS` probe: a
  * complete generation is adopted as-is, an incomplete one is
  * OVERWRITTEN whole — the same copy-on-write discipline as
  * [[StreamSketch.streamFoldGold]]'s version directories.
  *
  * At 100 TB: the per-batch work is one map-only coding pass over the
  * delta (no shuffle — [[graft.operators.Vectors.ivfPqAppendToIndex]]'s
  * cost model), generations accumulate at one directory per batch, and a
  * nightly compaction can fold old generations together without pausing
  * either ingestion or serving (writers never touch completed
  * generations; readers list them at plan time).
  */
object StreamVectors {

  /** Fold a JSONL embedding feed into per-batch index generations under
    * `indexDir`; returns the generation paths present when the run
    * drains (sorted by batch id). Serve with one
    * [[graft.operators.Vectors.ivfPqTopKFromIndex]] read of `indexDir`
    * (a bulk-built base belongs beside the stream's generations as
    * `gen=base`). */
  def streamIvfPqGold(spark: SparkSession, srcDir: String,
                      schemaSource: DataFrame, indexDir: String,
                      checkpoint: String,
                      coarse: Array[Array[Float]],
                      books: Array[Array[Array[Float]]], dim: Int,
                      readOptions: Map[String, String] = Map.empty)
      : Seq[String] = {
    graft.plans.GraftFunctions.register(spark)
    val stream = spark.readStream
      .schema(schemaSource.schema)
      .option("mode", "DROPMALFORMED")
      .option("maxFilesPerTrigger", "1")
      .options(readOptions)
      .json(srcDir)
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dest = s"$indexDir/gen=$batchId"
        // adopt a complete replayed generation; (over)write otherwise —
        // ivfPqWriteIndex is mode("overwrite"), so a partial first
        // attempt can never leak duplicate rows into the retry
        if (!fs.exists(new org.apache.hadoop.fs.Path(dest, "_SUCCESS"))) {
          graft.operators.Vectors.ivfPqWriteIndex(
            batch, dest, coarse, books, dim)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.matches("gen=\\d+") &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .sortBy(_.getPath.getName.drop(4).toLong)
      .map(st => s"$indexDir/${st.getPath.getName}")
  }
}
