package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, batch-shaped decode/feature-extraction over partitions.
  *
  * The decode step is a REAL header parser for the self-describing BMP and
  * PNM (PPM/PGM) formats — magic, width, height, channels read from actual
  * bytes per the public file-format specs (Windows BITMAPINFOHEADER layout;
  * netpbm header grammar). Everything around it — binary column handling,
  * the typed row schema, per-partition batch iteration, partition-parallel
  * execution — is the 100 TB shape: a scan of (id, blob, meta) parquet
  * partitions, map-only feature extraction, no shuffle until the consumer
  * aggregates. Formats needing an external codec (JPEG/PNG/audio) would
  * slot into the same `decodeMeta` dispatch with a per-partition decoder
  * handle; the container ships no codecs, so those report `raw`.
  */
object Multimodal {

  /** Typed media row: the binary payload plus source metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], source: String)

  /** Decoded media features: real header-parsed geometry. `format` is
    * "bmp" / "ppm" / "pgm" for recognized payloads, "raw" (with zero
    * geometry) for anything the codec table doesn't know. */
  final case class MediaFeatures(doc_id: Long, source: String, n_bytes: Long,
      format: String, width: Int, height: Int, channels: Int)

  /** Documents → media table: text bytes as the stand-in blob, typed
    * metadata alongside. Real pipelines read (id, binary, meta) parquet the
    * same way. */
  def asMediaTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      col("source"))

  // ---------------------------------------------------------------------
  // Synthetic image corpus: REAL file bytes, deterministic geometry
  // ---------------------------------------------------------------------

  /** Planted geometry for the synthetic image of `id` — the ground truth
    * the oracle recomputes in SQL while Spark must recover it by parsing
    * the binary header. */
  private[graft] def plantedDims(id: Long): (Int, Int, Int) =
    ((id % 61 + 4).toInt, (id % 47 + 4).toInt, (id % 3).toInt)

  /** Builds a complete, valid image file for `id`: 24-bit bottom-up BMP
    * (54-byte header + 4-byte-aligned rows), binary PPM (P6), or binary
    * PGM (P5), round-robined by id. Pixel bytes are a constant
    * `id % 251` so payloads are deterministic without mattering to the
    * header parse. */
  private[graft] def makeImage(id: Long): Array[Byte] = {
    val (w, h, f) = plantedDims(id)
    val v = (id % 251).toByte
    f match {
      case 0 => // BMP, BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp
        val rowSize = ((3 * w + 3) / 4) * 4
        val imageSize = rowSize * h
        val fileSize = 54 + imageSize
        val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
        buf.put('B'.toByte).put('M'.toByte)
        buf.putInt(fileSize)
        buf.putShort(0).putShort(0)
        buf.putInt(54)          // pixel data offset
        buf.putInt(40)          // BITMAPINFOHEADER size
        buf.putInt(w)
        buf.putInt(h)           // positive: bottom-up
        buf.putShort(1)         // planes
        buf.putShort(24)        // bits per pixel
        buf.putInt(0)           // BI_RGB
        buf.putInt(imageSize)
        buf.putInt(2835).putInt(2835) // 72 dpi in px/metre
        buf.putInt(0).putInt(0)
        var row = 0
        while (row < h) {
          var i = 0
          while (i < 3 * w) { buf.put(v); i += 1 }
          while (i < rowSize) { buf.put(0.toByte); i += 1 }
          row += 1
        }
        buf.array()
      case 1 => // PPM P6: ASCII header, binary RGB triplets
        val header = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
        header ++ Array.fill(3 * w * h)(v)
      case _ => // PGM P5: ASCII header, binary grayscale
        val header = s"P5\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
        header ++ Array.fill(w * h)(v)
    }
  }

  /** Documents → synthetic image table: one REAL image file per doc (BMP /
    * PPM / PGM round-robin, planted geometry). Exercises the decode path on
    * actual binary headers while keeping an exact SQL oracle (the planting
    * formula). */
  def syntheticImageTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) => MediaRow(id, makeImage(id), src) }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // Decoder: real header parsing
  // ---------------------------------------------------------------------

  /** Parses `n` ASCII unsigned ints from a netpbm header starting at
    * `from`, skipping whitespace and `#`-to-newline comments (the netpbm
    * grammar). Returns null on malformed input. */
  private def pnmInts(bytes: Array[Byte], from: Int, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var i = from
    var k = 0
    while (k < n) {
      if (i >= bytes.length) return null
      val c = bytes(i) & 0xff
      if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
      else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
      else if (c >= '0' && c <= '9') {
        var v = 0
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = v * 10 + (bytes(i) - '0'); i += 1
        }
        out(k) = v; k += 1
      } else return null
    }
    out
  }

  /** Real metadata decode: BMP (BITMAPINFOHEADER: width int32-LE @18,
    * height int32-LE @22 — negative means top-down, bits-per-pixel
    * uint16-LE @28) and binary netpbm (P6 RGB / P5 gray: magic then
    * whitespace/comment-separated width, height, maxval). Unrecognized
    * payloads come back as ("raw", 0, 0, 0) rather than erroring — at
    * 100 TB a poison blob must not kill the job. */
  private[graft] def decodeMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(18)
      val hRaw = bb.getInt(22)
      val bits = bb.getShort(28) & 0xffff
      if (w <= 0 || hRaw == 0 || bits % 8 != 0 || bits == 0) ("raw", 0, 0, 0)
      else ("bmp", w, math.abs(hRaw), bits / 8)
    } else if (bytes.length >= 2 && bytes(0) == 'P' &&
        (bytes(1) == '5' || bytes(1) == '6')) {
      val dims = pnmInts(bytes, 2, 3) // width, height, maxval
      if (dims == null || dims(0) <= 0 || dims(1) <= 0) ("raw", 0, 0, 0)
      else if (bytes(1) == '6') ("ppm", dims(0), dims(1), 3)
      else ("pgm", dims(0), dims(1), 1)
    } else ("raw", 0, 0, 0)
  }

  private def decodeRow(row: MediaRow): MediaFeatures = {
    val (fmt, w, h, ch) = decodeMeta(row.payload)
    MediaFeatures(row.doc_id, row.source, row.payload.length.toLong,
      fmt, w, h, ch)
  }

  /** Batch feature extraction: typed Dataset, mapPartitions so a heavier
    * codec could amortize per-batch init (decoder context, model weights)
    * across the partition — the Scala analogue of mapInPandas batch
    * processing. The header parse itself is allocation-free per row. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      // per-partition init would go here (decoder handles, model weights)
      batch.map(decodeRow)
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
      col("width"), col("height"),
      expr(s"(width * $target) div greatest(width, height)")
        .cast("int").as("out_width"),
      expr(s"(height * $target) div greatest(width, height)")
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
