package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media record: opaque payload + metadata. At 100 TB the `bytes`
  * column dominates storage — keep it in its own parquet column (never a
  * struct field mixed with hot metadata) so metadata-only scans prune it. */
case class MediaRecord(
    media_id: Long,
    mime: String,
    bytes: Array[Byte],
    width: Int,
    height: Int,
    duration_ms: Long)

/** Extracted per-media features (decode step stubbed — see [[Multimodal]]). */
case class MediaFeatures(
    media_id: Long,
    mime: String,
    n_bytes: Long,
    byte_histogram: Array[Long],
    frames_sampled: Int)

/** Multimodal-column plumbing: images/audio/video as opaque binary columns
  * with typed metadata, and a distributed feature-extraction pass.
  *
  * The actual codec work (JPEG decode, resample, frame extraction) is
  * STUBBED — no image/audio libraries ship in this environment — behind
  * [[decodeStub]], which produces a deterministic fake (a 16-bin byte
  * histogram). Everything around it is the real production shape: typed
  * `Dataset[MediaRecord]`, per-partition batched processing via
  * `mapPartitions` (one decoder init per partition, the same shape a
  * vectorized/Arrow UDF would have), and a narrow no-shuffle plan.
  */
object Multimodal {

  /** Deterministic stand-in for a real decoder: 16-bin byte histogram.
    * Swap for the real codec call; the pipeline shape is unchanged. */
  def decodeStub(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    hist
  }

  /** Feature extraction over a typed media dataset. `mapPartitions` so a
    * real implementation amortizes decoder initialization per partition;
    * rows stream through without materializing the partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val decoder = Codec.open(...) — once per partition
      it.map { m =>
        val hist = decodeStub(m.bytes)
        val frames =
          if (m.mime.startsWith("video/")) (m.duration_ms / 1000L).toInt.max(1)
          else 1
        MediaFeatures(m.media_id, m.mime, m.bytes.length.toLong, hist, frames)
      }
    }
  }

  /** Build a synthetic media table from the documents corpus (text bytes as
    * the opaque payload) — exercises the binary-column path end-to-end with
    * driver-provided data only. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image/jpeg")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      col("text").cast("binary").as("bytes"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      (col("n_chars") * 100).as("duration_ms"))
      .as[MediaRecord]
  }

  /** Rows-only query entry: features rolled up by mime type. */
  def featureSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(spark, docs))
    feats.groupBy(col("mime"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("frames_sampled")).as("total_frames"),
        sum(element_at(col("byte_histogram"), 8)).as("hist_bin7_sum"))
  }
}
