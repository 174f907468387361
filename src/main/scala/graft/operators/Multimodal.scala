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
    frames_sampled: Int,
    out_width: Int,
    out_height: Int)

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

  /** Aspect-preserving fit of (w, h) into a target box — the resize
    * geometry is real; only the pixel resampling would be the codec's job. */
  def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    val scale = math.min(maxW.toDouble / w, maxH.toDouble / h).min(1.0)
    (math.max(1, math.round(w * scale).toInt),
      math.max(1, math.round(h * scale).toInt))
  }

  /** Feature extraction over a typed media dataset. `mapPartitions` so a
    * real implementation amortizes decoder initialization per partition;
    * rows stream through without materializing the partition. Covers the
    * decode(stub) / feature / resize-geometry / frame-sample steps. */
  def extractFeatures(media: Dataset[MediaRecord],
                      maxW: Int = 224, maxH: Int = 224): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val decoder = Codec.open(...) — once per partition
      it.map { m =>
        // null payload (e.g. null source text cast to binary) is an empty
        // media object, not an executor-killing NPE
        val bytes = if (m.bytes == null) Array.emptyByteArray else m.bytes
        val hist = decodeStub(bytes)
        val frames =
          if (m.mime.startsWith("video/")) (m.duration_ms / 1000L).toInt.max(1)
          else 1
        val (ow, oh) = fitBox(m.width, m.height, maxW, maxH)
        MediaFeatures(m.media_id, m.mime, bytes.length.toLong, hist, frames,
          ow, oh)
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

  /** Query entry (oracle-checked): features rolled up by mime type. */
  def featureSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(spark, docs))
    feats.groupBy(col("mime"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("frames_sampled")).as("total_frames"),
        sum(element_at(col("byte_histogram"), 8)).as("hist_bin7_sum"))
  }
}
