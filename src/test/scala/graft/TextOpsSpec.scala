package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._

/** Specs for the LLM-pipeline text operators added in round 7: sliding
  * RAG chunking, bigram LM scoring, and frequency-tercile bucketing. */
class TextOpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{Row, types => T}

  /** One doc of n tokens "0 1 2 … n-1", so chunk contents are checkable
    * by arithmetic on the token values. */
  private def numberedDocs(sizes: Seq[Int]) =
    spark.createDataFrame(
      sizes.zipWithIndex.map { case (n, i) =>
        Row(i.toLong, (0 until n).mkString(" "))
      }.asJava,
      T.StructType(Seq(T.StructField("doc_id", T.LongType),
        T.StructField("text", T.StringType))))

  test("slidingChunks covers every token exactly and stops at the tail") {
    val window = 32
    val stride = 24
    val sizes = Seq(1, 8, 24, 30, 32, 33, 78, 100, 200)
    val rows = Chunking.slidingChunks(numberedDocs(sizes),
        col("doc_id"), col("text"), window, stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    for ((docId, n) <- sizes.indices.map(i => i.toLong -> sizes(i))) {
      val chunks = rows(docId).sortBy(_._2)
      // chunk_idx contiguous from 0
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong),
        s"doc $docId: non-contiguous chunk ids")
      for ((_, idx, nTok, text) <- chunks) {
        val start = idx.toInt * stride
        val toks = text.split(" ").map(_.toInt)
        assert(nTok == math.min(window, n - start), s"doc $docId chunk $idx")
        assert(toks.length == nTok, s"doc $docId chunk $idx length")
        // the window really starts at idx*stride and is consecutive
        assert(toks.head == start && toks.last == start + nTok - 1,
          s"doc $docId chunk $idx content")
      }
      // last chunk reaches the end of the doc; no chunk after coverage
      val (_, lastIdx, lastTok, _) = chunks.last
      assert(lastIdx.toInt * stride + lastTok == n,
        s"doc $docId: tail not covered")
      assert(chunks.size == 1 ||
        (lastIdx.toInt - 1) * stride + window < n,
        s"doc $docId: redundant tail chunk emitted")
    }
  }

  test("slidingChunks rejects a stride wider than the window") {
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(numberedDocs(Seq(4)),
        col("doc_id"), col("text"), window = 8, stride = 9)
    }
  }

  test("t_bigram_logprob scores docs by smoothed corpus transitions") {
    // every doc has exactly n_tokens - 1 bigrams and a negative mean
    // logprob (add-1 smoothing keeps every probability strictly < 1)
    val got = SparkEntry.queries("t_bigram_logprob")(spark, testDataDir)
    val lens = Tables.documents(spark, testDataDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val joined = got.join(lens, "doc_id")
      .select(col("doc_id"), col("n_bigrams"), col("n"), col("mean_logprob"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getInt(2) - 1L, s"doc ${r.getLong(0)} count")
      assert(r.getDouble(3) < 0.0, s"doc ${r.getLong(0)} sign")
    }
  }

  test("t_freq_bucket terciles are balanced within each language") {
    val got = SparkEntry.queries("t_freq_bucket")(spark, testDataDir)
    val total = Tables.documents(spark, testDataDir).count()
    assert(got.count() == total) // every doc is bucketed
    val sizes = got.groupBy(col("lang"), col("bucket")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val langs = sizes.keys.map(_._1).toSet
    for (l <- langs) {
      val counts = Seq("head", "middle", "tail").map(b =>
        sizes.getOrElse((l, b), 0L))
      assert(counts.max - counts.min <= 1, s"lang $l unbalanced: $counts")
      // ntile fills earlier buckets first
      assert(counts(0) >= counts(1) && counts(1) >= counts(2), s"lang $l")
    }
  }
}
