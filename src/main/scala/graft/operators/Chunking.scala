package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval/embedding prep pass
  * of a training-data pipeline (every RAG corpus and every long-context
  * packing stage starts by windowing documents into model-sized pieces).
  *
  * Distinct from [[Dedup.chunkDedup]]'s non-overlapping windows: here
  * consecutive chunks OVERLAP (`window` tokens every `stride` tokens,
  * stride < window) so no retrieval query can fall into a boundary gap.
  *
  * Scale shape: a pure per-row projection + explode — no shuffle at all;
  * each document expands into ceil(n/stride) rows regardless of corpus
  * size, so the operator is embarrassingly parallel and survives 100 TB
  * at scan speed. The window arithmetic stays inside whole-stage codegen
  * (`sequence`/`slice`/`array_join`, no UDFs).
  */
object Chunking {

  /** Explode each document into overlapping `window`-token chunks, one
    * every `stride` tokens, stopping at the first chunk that reaches the
    * end of the document (a later start would emit a tail chunk fully
    * contained in its predecessor — wasted index rows). The covering
    * chunk may be partial: chunk_tokens = min(window, n - start).
    *
    * Output: (doc_id, chunk_idx, chunk_tokens, chunk_text).
    */
  def slidingChunks(df: DataFrame, id: Column, text: Column,
      window: Int, stride: Int): DataFrame = {
    require(0 < stride && stride <= window,
      s"stride must be in (0, window]: stride=$stride window=$window")
    val ws = split(text, " ")
    val n = size(ws)
    // chunk starts 0, stride, 2*stride, … < n; split("") yields [""] so
    // n >= 1 always and the sequence is never descending. A start is kept
    // while the PREVIOUS chunk fell short of the end (or it is the first),
    // so the kept starts are a contiguous prefix and chunk_idx has no gaps.
    val starts = filter(sequence(lit(0), n - 1, lit(stride)), start =>
      (start === 0) || (start + (window - stride) < n))
    val chunks = transform(starts, start =>
      struct(
        (start / stride).cast("long").as("chunk_idx"),
        least(lit(window), n - start).cast("long").as("chunk_tokens"),
        array_join(slice(ws, start + 1, lit(window)), " ").as("chunk_text")))
    df.select(id.as("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_tokens"),
        col("c.chunk_text"))
  }
}
