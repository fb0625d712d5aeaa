package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, batch-shaped decode/feature-extraction over partitions.
  *
  * The decode step is a clearly-marked deterministic STUB (the container has
  * no image/audio codecs); everything around it — binary column handling,
  * the typed row schema, per-partition batch iteration, partition-parallel
  * execution — is the real 100 TB shape: a scan of (id, blob, meta) parquet
  * partitions, map-only feature extraction, no shuffle until the consumer
  * aggregates.
  */
object Multimodal {

  /** Typed media row: the binary payload plus source metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], source: String)

  /** Fake decoded features — stands in for image decode (width/height/...)
    * so the pipeline shape is testable without codecs. */
  final case class MediaFeatures(doc_id: Long, source: String, n_bytes: Long,
      fake_width: Int, fake_height: Int, byte_sum: Long)

  /** Documents → media table: text bytes as the stand-in blob, typed
    * metadata alongside. Real pipelines read (id, binary, meta) parquet the
    * same way. */
  def asMediaTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      col("source"))

  /** STUB DECODE — deterministic fake in place of a codec call.
    * A real deployment swaps the body for e.g. JPEG decode; the signature
    * (bytes → features) and the batch shape stay identical. */
  private def stubDecode(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaFeatures(
      doc_id = row.doc_id,
      source = row.source,
      n_bytes = bytes.length.toLong,
      fake_width = (bytes.length % 640) + 1,
      fake_height = ((bytes.length * 7) % 480) + 1,
      byte_sum = sum)
  }

  /** Batch feature extraction: typed Dataset, mapPartitions so a real codec
    * could amortize per-batch init (model load, decoder context) across the
    * partition — the Scala analogue of mapInPandas batch processing. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      // per-partition init would go here (decoder handles, model weights)
      batch.map(stubDecode)
    }
  }

  /** SQL-expressible metadata path (oracle-checkable): blob length + digest.
    * Used for the correctness gate; extractFeatures covers the batch path. */
  def binaryMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("source"),
      length(col("payload")).cast("bigint").as("n_bytes"),
      md5(col("payload")).as("payload_md5"))

  /** Resize plan: fit (width, height) into a `target`-px box preserving
    * aspect ratio. Pure INTEGER arithmetic (`a * target div max(a, b)`) so
    * the plan is deterministic and engine-exact — the actual pixel resample
    * would run inside the batch decode; this computes the target geometry
    * every image-prep pipeline needs first. Map-only, scan speed. */
  def resizePlan(features: DataFrame, target: Int = 224): DataFrame =
    features.select(
      col("doc_id"),
      col("fake_width"), col("fake_height"),
      expr(s"(fake_width * $target) div greatest(fake_width, fake_height)")
        .cast("int").as("out_width"),
      expr(s"(fake_height * $target) div greatest(fake_width, fake_height)")
        .cast("int").as("out_height"))

  /** Frame-sampling plan for video-shaped media: the blob's byte length
    * stands in for duration (ms), `fps` frames per second, sampled every
    * `n_frames div maxFrames` frames (≥ 1). Emits one row per sampled
    * frame with its timestamp — the (id, frame_idx) fan-out a real
    * frame-extract job feeds to the decoder. The sequence is guarded:
    * Spark's sequence(0, -1) steps BACKWARD, so zero-frame media must
    * yield an empty array, matching the oracle's empty generate_series. */
  def sampleFrames(media: DataFrame, fps: Int = 25, maxFrames: Int = 8): DataFrame =
    media
      .withColumn("n_frames",
        expr(s"(length(payload) * $fps) div 1000").cast("long"))
      .withColumn("step", greatest(lit(1L), expr(s"n_frames div $maxFrames")))
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
            expr("sequence(0L, n_frames - 1, step)"))
          .otherwise(array().cast("array<long>"))))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"(frame_idx * 1000) div $fps").as("ts_ms"))
}
