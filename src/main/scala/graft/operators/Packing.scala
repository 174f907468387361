package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-capacity token bins ("concat then split" packing), the step that
  * turns a cleaned corpus into uniform-length training examples.
  *
  * Packing is deterministic and shard-local: docs are routed to a shard by
  * id MODULO (cheap and uniform for sequential ids; hash the id upstream
  * first if the id space is structured — e.g. snowflake ids with low flag
  * bits would skew raw modulo), ordered within the shard, and binned by
  * running token count —
  * one window per shard, so the corpus never needs a global sort. At
  * 100 TB the shard count bounds per-task state and the window's shuffle
  * is the only data movement; real packers (concat-and-chunk) use exactly
  * this per-shard greedy order, trading a little padding efficiency for
  * linear scalability.
  */
object Packing {

  /** Assign each doc a (shard, bin, bin_offset): bins are `capacity`-token
    * chunks of the shard's id-ordered token stream. A doc longer than
    * `capacity` still gets one assignment (its bin is where it starts —
    * splitting across bins is the tokenizer's job downstream). */
  def packSequences(df: DataFrame, id: Column, tokens: Column,
                    shards: Int, capacity: Long): DataFrame = {
    val shard = pmod(id, lit(shards)).cast("int").as("shard")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    df.select(id.as("doc_id"), tokens.as("n_tokens"), shard)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / capacity))
      .withColumn("bin_offset",
        col("cum_tokens") - col("n_tokens") - col("bin") * capacity)
  }
}
