package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, batch-shaped decode/feature-extraction over partitions.
  *
  * The decode step is a REAL header parser for the self-describing BMP,
  * PNM (PPM/PGM), PNG, and JPEG formats — magic, width, height, channels
  * read from actual bytes per the public file-format specs (Windows
  * BITMAPINFOHEADER layout; netpbm header grammar; PNG IHDR chunk; JPEG
  * marker-segment scan to SOFn). Everything around it — binary column
  * handling, the typed row schema, per-partition batch iteration,
  * partition-parallel execution — is the 100 TB shape: a scan of
  * (id, blob, meta) parquet partitions, map-only feature extraction, no
  * shuffle until the consumer aggregates. Audio/video containers get the
  * same treatment ([[decodeAvMeta]]: WAV via the RIFF chunk walk, MP4 via
  * the ISO BMFF box walk to mvhd). Full sample decode for the
  * entropy-coded formats would slot into the same dispatch with a
  * per-partition codec handle; the container ships no codecs, so
  * geometry/timing comes from the headers and unknown payloads report
  * `raw`.
  */
object Multimodal {

  /** Typed media row: the binary payload plus source metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], source: String)

  /** Decoded media features: real header-parsed geometry. `format` is
    * "bmp" / "ppm" / "pgm" / "png" / "jpeg" for recognized payloads, "raw"
    * (with zero geometry) for anything the codec table doesn't know. */
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
    * the binary header. Format selector f in [0, 5): bmp/ppm/pgm/png/jpeg. */
  private[graft] def plantedDims(id: Long): (Int, Int, Int) =
    ((id % 61 + 4).toInt, (id % 47 + 4).toInt, (id % 5).toInt)

  /** Builds a complete, valid image file for `id`: 24-bit bottom-up BMP
    * (54-byte header + 4-byte-aligned rows), binary PPM (P6), binary PGM
    * (P5), 8-bit RGB PNG (spec-valid chunks, stored-block zlib IDAT so the
    * byte count is formula-exact: 68 + h·(3w+1)), or a JPEG header stream
    * (SOI + JFIF APP0 + SOF0 + EOI, fixed 41 bytes — geometry real,
    * entropy data absent), round-robined by id. Pixel bytes are a constant
    * `id % 251` so payloads are deterministic without mattering to the
    * header parse. */
  private[graft] def makeImage(id: Long): Array[Byte] = {
    val (w, h, f) = plantedDims(id)
    val v = (id % 251).toByte
    buildImage(w, h, f, (_, _) => v)
  }

  /** Shared file builder: encodes the pixel function `pix(x, y)` (x left→
    * right, y top→bottom) into a complete, valid file of format `f`
    * (0 bmp / 1 ppm / 2 pgm / 3 png / else jpeg-header-only). Color
    * formats write the gray value into every channel (achromatic planted
    * pixels — a real pipeline would apply a luma transform on decode). */
  private def buildImage(w: Int, h: Int, f: Int,
      pix: (Int, Int) => Byte): Array[Byte] = {
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
          val y = h - 1 - row // bottom-up: file row 0 is the image bottom
          var x = 0
          while (x < w) {
            val g = pix(x, y)
            buf.put(g).put(g).put(g) // B, G, R
            x += 1
          }
          var i = 3 * w
          while (i < rowSize) { buf.put(0.toByte); i += 1 }
          row += 1
        }
        buf.array()
      case 1 => // PPM P6: ASCII header, binary RGB triplets
        val header = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
        val px = new Array[Byte](3 * w * h)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = pix(x, y)
            px(i) = g; px(i + 1) = g; px(i + 2) = g
            i += 3; x += 1
          }
          y += 1
        }
        header ++ px
      case 2 => // PGM P5: ASCII header, binary grayscale
        val header = s"P5\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
        val px = new Array[Byte](w * h)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(i) = pix(x, y); i += 1; x += 1 }
          y += 1
        }
        header ++ px
      case 3 => // PNG: signature + IHDR + stored-block zlib IDAT + IEND
        // raw scanlines: filter byte 0 then RGB per row
        val raw = new Array[Byte](h * (1 + 3 * w))
        var idx = 0
        var row = 0
        while (row < h) {
          raw(idx) = 0; idx += 1
          var x = 0
          while (x < w) {
            val g = pix(x, row)
            raw(idx) = g; raw(idx + 1) = g; raw(idx + 2) = g
            idx += 3; x += 1
          }
          row += 1
        }
        // zlib stream written by hand as ONE final stored block (raw fits
        // well under the 65535-byte block cap) so the total byte count is
        // formula-exact: 2 (zlib hdr) + 5 (block hdr) + n + 4 (adler)
        val n = raw.length
        val zlib = ByteBuffer.allocate(n + 11)
        zlib.put(0x78.toByte).put(0x01.toByte)
        zlib.put(0x01.toByte) // BFINAL=1, BTYPE=00 (stored)
        zlib.put((n & 0xff).toByte).put(((n >> 8) & 0xff).toByte)
        zlib.put(((~n) & 0xff).toByte).put((((~n) >> 8) & 0xff).toByte)
        zlib.put(raw)
        val adler = new java.util.zip.Adler32
        adler.update(raw)
        zlib.putInt(adler.getValue.toInt) // Adler-32 is big-endian
        def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
          val t = typ.getBytes(StandardCharsets.US_ASCII)
          val bb = ByteBuffer.allocate(12 + data.length) // BE per PNG spec
          bb.putInt(data.length).put(t).put(data)
          val crc = new java.util.zip.CRC32
          crc.update(t); crc.update(data)
          bb.putInt(crc.getValue.toInt)
          bb.array()
        }
        val ihdr = ByteBuffer.allocate(13)
        ihdr.putInt(w).putInt(h)
          .put(8.toByte)  // bit depth
          .put(2.toByte)  // color type: truecolor RGB
          .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
        pngSignature ++ chunk("IHDR", ihdr.array()) ++
          chunk("IDAT", zlib.array()) ++ chunk("IEND", Array.emptyByteArray)
      case 5 => // GIF87a: GCT grayscale palette + one full-canvas frame.
        // The LZW stream emits CLEAR before every pixel code (dictionary
        // never grows) — maximally naive but spec-valid, so any conforming
        // decoder (including ours) must read it; 9-bit codes, LSB-first.
        val out = new java.io.ByteArrayOutputStream()
        out.write("GIF87a".getBytes(StandardCharsets.US_ASCII))
        out.write(w & 0xff); out.write((w >> 8) & 0xff)
        out.write(h & 0xff); out.write((h >> 8) & 0xff)
        out.write(0xf7) // GCT present, 256 entries
        out.write(0)    // background index
        out.write(0)    // aspect
        var ci = 0
        while (ci < 256) { out.write(ci); out.write(ci); out.write(ci); ci += 1 }
        out.write(0x2c) // image descriptor: full canvas, no LCT/interlace
        out.write(0); out.write(0); out.write(0); out.write(0)
        out.write(w & 0xff); out.write((w >> 8) & 0xff)
        out.write(h & 0xff); out.write((h >> 8) & 0xff)
        out.write(0)
        out.write(8)    // LZW minimum code size
        val codes = new java.io.ByteArrayOutputStream()
        var acc = 0L
        var nbits = 0
        def putCode(c: Int): Unit = {
          acc |= c.toLong << nbits
          nbits += 9
          while (nbits >= 8) {
            codes.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8
          }
        }
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { putCode(256); putCode(pix(x, y) & 0xff); x += 1 }
          y += 1
        }
        putCode(257)
        if (nbits > 0) codes.write((acc & 0xff).toInt)
        val cs = codes.toByteArray
        var p = 0
        while (p < cs.length) { // data sub-blocks, <=255 bytes each
          val len = math.min(255, cs.length - p)
          out.write(len); out.write(cs, p, len); p += len
        }
        out.write(0)    // block terminator
        out.write(0x3b) // trailer
        out.toByteArray
      case 6 => // WebP VP8L (lossless) per the public WebP lossless
        // bitstream spec: RIFF/VP8L container, LSB-first bitstream,
        // subtract-green transform, no color cache, no meta-prefix, one
        // prefix-code group. The green/length alphabet carries all 256
        // literal gray values as a NORMAL canonical code (256 lengths of
        // 8 written through the code-length code {8→0b0, 18→0b1}, the
        // trailing 24 length-code zeros as one "18" repeat) so the
        // canonical code over 256 equal lengths is the identity mapping;
        // after subtract-green the red/blue residuals are all zero and
        // alpha is constant 255, so those three ride 1-symbol simple
        // codes (0 bits/pixel). Spec-valid, decodable by any conforming
        // VP8L decoder; 8 bits/pixel, byte count formula-exact:
        // 67 + w·h + (1 if w·h even else 0).
        val bits = new java.io.ByteArrayOutputStream()
        var acc = 0L
        var nb = 0
        def put(v: Int, n: Int): Unit = {
          acc |= (v.toLong & ((1L << n) - 1)) << nb
          nb += n
          while (nb >= 8) {
            bits.write((acc & 0xff).toInt); acc >>= 8; nb -= 8
          }
        }
        // canonical prefix-code bits enter the stream root-first (MSB of
        // the code first), while put() emits LSB-first — reverse the code
        def rev8(v: Int): Int = Integer.reverse(v) >>> 24
        put(0x2f, 8)            // VP8L signature
        put(w - 1, 14); put(h - 1, 14)
        put(0, 1)               // alpha-is-used hint: no
        put(0, 3)               // version 0
        put(1, 1); put(2, 2)    // one transform: subtract-green
        put(0, 1)               // no further transforms
        put(0, 1)               // no color cache
        put(0, 1)               // no meta prefix codes
        // green+length code (alphabet 280), normal form
        put(0, 1)               // not simple
        put(8, 4)               // num_code_lengths = 4 + 8 = 12
        // kCodeLengthCodeOrder prefix [17,18,0,1,2,3,4,5,16,6,7,8]:
        // symbol 18 (index 1) and symbol 8 (index 11) get length 1
        Seq(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1).foreach(l => put(l, 3))
        put(0, 1)               // no max_symbol cap
        var cl = 0
        while (cl < 256) { put(0, 1); cl += 1 } // 256 × "length 8"
        put(1, 1); put(13, 7)   // "18": 11 + 13 = 24 zero length-codes
        put(1, 1); put(0, 1); put(0, 1); put(0, 1)   // red: simple, sym 0
        put(1, 1); put(0, 1); put(0, 1); put(0, 1)   // blue: simple, sym 0
        put(1, 1); put(0, 1); put(1, 1); put(255, 8) // alpha: simple, 255
        put(1, 1); put(0, 1); put(0, 1); put(0, 1)   // distance: sym 0
        var wy = 0
        while (wy < h) {
          var wx = 0
          while (wx < w) {
            // identity canonical code: code(g) = g, 8 bits, MSB-first
            put(rev8(pix(wx, wy) & 0xff), 8)
            wx += 1
          }
          wy += 1
        }
        if (nb > 0) bits.write((acc & 0xff).toInt)
        val payload = bits.toByteArray
        val padded = payload.length + (payload.length & 1) // RIFF even pad
        val file = ByteBuffer.allocate(20 + padded)
          .order(ByteOrder.LITTLE_ENDIAN)
        file.put("RIFF".getBytes(StandardCharsets.US_ASCII))
        file.putInt(12 + padded)
        file.put("WEBP".getBytes(StandardCharsets.US_ASCII))
        file.put("VP8L".getBytes(StandardCharsets.US_ASCII))
        file.putInt(payload.length)
        file.put(payload)
        file.array()
      case _ => // JPEG: SOI + JFIF APP0 + SOF0 (real geometry) + EOI
        val bb = ByteBuffer.allocate(41) // BE, as JPEG requires
        bb.putShort(0xffd8.toShort)                      // SOI
        bb.putShort(0xffe0.toShort).putShort(16.toShort) // APP0, len 16
        bb.put("JFIF".getBytes(StandardCharsets.US_ASCII)).put(0.toByte)
        bb.put(1.toByte).put(1.toByte)                   // version 1.1
        bb.put(0.toByte)                                 // density units
        bb.putShort(1.toShort).putShort(1.toShort)       // x/y density
        bb.put(0.toByte).put(0.toByte)                   // no thumbnail
        bb.putShort(0xffc0.toShort).putShort(17.toShort) // SOF0, len 8+3*3
        bb.put(8.toByte)                                 // precision
        bb.putShort(h.toShort).putShort(w.toShort)       // lines, samples
        bb.put(3.toByte)                                 // 3 components
        bb.put(1.toByte).put(0x22.toByte).put(0.toByte)  // Y  2x2, qtbl 0
        bb.put(2.toByte).put(0x11.toByte).put(1.toByte)  // Cb 1x1, qtbl 1
        bb.put(3.toByte).put(0x11.toByte).put(1.toByte)  // Cr 1x1, qtbl 1
        bb.putShort(0xffd9.toShort)                      // EOI
        bb.array()
    }
  }

  private val pngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Documents → synthetic image table: one REAL image file per doc (BMP /
    * PPM / PGM / PNG / JPEG round-robin, planted geometry). Exercises the
    * decode path on actual binary headers while keeping an exact SQL
    * oracle (the planting formula). */
  def syntheticImageTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) => MediaRow(id, makeImage(id), src) }
      .toDF()
  }

  /** A header-only lossy-WebP file (RIFF/"VP8 " with the 0x9D 0x01 0x2A
    * start code and real 14-bit geometry, no coefficient data) — the
    * fixture for the header_only side of the codec-scope contract, the
    * lossy twin of the 41-byte synthetic JPEG. */
  /** Standalone VP8L (lossless WebP) fixture — [[buildImage]]'s f = 6
    * form with an Int-pixel signature, for the animation fixtures and
    * tests that embed lossless frames. */
  private[graft] def makeVp8l(w: Int, h: Int,
      pix: (Int, Int) => Int): Array[Byte] =
    buildImage(w, h, 6, (x, y) => (pix(x, y) & 0xff).toByte)

  private[graft] def makeWebpLossyHeader(w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(22)
    bb.put("WEBP".getBytes(StandardCharsets.US_ASCII))
    bb.put("VP8 ".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(10)
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // frame tag
    bb.put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte) // start code
    bb.putShort((w & 0x3fff).toShort)
    bb.putShort((h & 0x3fff).toShort)
    bb.array()
  }

  /** Format-level near-dup coverage — the codec-scope contract, DERIVED
    * from the decode dispatch so the column can never silently disagree
    * with what [[decodeGray]] actually covers:
    *   - `pixel`: full raster decode exists (bmp/ppm/pgm/png/gif, webp
    *     when the payload is VP8L — lossless — or a lossy "VP8 " key
    *     frame in [[Vp8]]'s documented subset, and since r14 baseline
    *     grayscale JPEG in [[Jpeg]]'s documented subset — the last
    *     header-only class in the fixture sweep);
    *   - `header_only`: geometry parses but the payload is entropy-coded
    *     past what a from-scratch decoder should claim (VP8X extended
    *     webp);
    *   - `opaque`: not a recognized container at all.
    * A crawl's per-format share of each scope belongs on the dataset
    * card: a corpus whose images are 60 % lossy webp gets NO pixel-level
    * near-dup treatment on that 60 %, and before this column existed
    * nothing downstream said so. The companion per-payload truth is
    * [[decodeGray]].isDefined (`neardup_covered` in the gate query): for
    * a VP8L stream using features outside the decode subset the static
    * scope says `pixel` while the payload column says false — that
    * discrepancy is itself the signal to extend the decoder. */
  private[graft] def codecScopeOf(bytes: Array[Byte]): String = {
    val (fmt, _, _, _) = decodeMeta(bytes)
    fmt match {
      case "bmp" | "ppm" | "pgm" | "png" | "gif" | "tiff" => "pixel"
      case "webp" =>
        // VP8L (lossless subset), lossy "VP8 " key frames (r12), and —
        // r14 — VP8X ANIMATIONS (ANMF compositing over those decoders)
        // are pixel-scoped; non-animated VP8X (still images behind the
        // extended container, e.g. with alpha) stays header-only. A
        // payload outside a subset still reads neardup_covered = false
        // — the per-payload truth column catching what the static
        // scope can't.
        if (bytes.length >= 16 && bytes(12) == 'V' && bytes(13) == 'P' &&
          bytes(14) == '8' &&
          (bytes(15) == 'L' || bytes(15) == ' ')) "pixel"
        else if (bytes.length >= 21 && bytes(12) == 'V' &&
          bytes(13) == 'P' && bytes(14) == '8' && bytes(15) == 'X' &&
          (bytes(20) & 0x02) != 0) "pixel"
        else "header_only"
      // r14: the jpeg subset decoder makes it a pixel class —
      // grayscale AND interleaved YCbCr (4:4:4/4:2:2/4:2:0, restart
      // intervals) AND, since the progressive work, SOF2 multi-scan
      // files; what remains past the subset (arithmetic, 12-bit,
      // hierarchical) reads neardup_covered = false per payload
      case "jpeg" => "pixel"
      case _ => "opaque"
    }
  }

  /** Codec-scope gate row: the sniffed container, its header geometry,
    * the static scope contract, and the per-payload decode truth —
    * including the decoded grayscale SUM (r12), so the driver gate is
    * sensitive to pixel VALUES, not just counts: every planted payload
    * is constant v per image, so gray_sum must equal v·w·h exactly for
    * every pixel-decoded format (a one-pixel drift in any decoder —
    * BMP row order, PNG filters, GIF LZW, VP8L prefix codes, VP8
    * quant/WHT/IDCT — lands on a different sum and hash-fails). */
  final case class CodecScopeRow(doc_id: Long, format: String, width: Int,
      height: Int, codec_scope: String, neardup_covered: Boolean,
      decoded_pixels: Long, gray_sum: Long)

  /** One synthesized container per doc spanning the full sniff surface —
    * the raster formats, GIF, VP8L webp, LOSSY VP8 webp (r12: a real
    * bool-coded key frame, pixel-decoded by [[Vp8]]), and since r14 a
    * REAL baseline JPEG ([[Jpeg.makeJpegConst]] — Huffman-coded scan,
    * decoded by the from-scratch baseline subset; previously the one
    * header-only class) — each sniffed, scoped, and pixel-decoded back
    * from its actual bytes. The oracle recomputes every column from the
    * planting formula, so a failed decode (neardup_covered false) or a
    * drifted header parse hash-fails the driver gate. */
  def codecScopeTable(docs: DataFrame)(implicit spark: SparkSession): Dataset[CodecScopeRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (id % 61 + 4).toInt
      val h = (id % 47 + 4).toInt
      val v = (id % 251).toByte
      val payload = (id % 9) match {
        case 6L => Vp8.makeWebpLossy(w, h, (_, _) => v & 0xff) // lossy webp
        case 7L => buildImage(w, h, 6, (_, _) => v) // webp vp8l
        case 8L => makeTiff(w, h, (_, _) => v & 0xff, // tiff (r14)
          little = id % 2 == 0, rgb = id % 3 == 0,
          rowsPerStrip = (id % 5 + 2).toInt, packBits = id % 2 == 1)
        case 5L => buildImage(w, h, 5, (_, _) => v) // gif
        case 4L => Jpeg.makeJpegConst(w, h, v & 0xff) // real baseline jpeg (r14)
        case f => buildImage(w, h, f.toInt, (_, _) => v) // bmp/ppm/pgm/png
      }
      val (fmt, pw, ph, _) = decodeMeta(payload)
      val px = decodeGray(payload)
      CodecScopeRow(id, fmt, pw, ph, codecScopeOf(payload), px.isDefined,
        px.map(_._3.length.toLong).getOrElse(-1L),
        px.map(_._3.foldLeft(0L)(_ + _)).getOrElse(-1L))
    }
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

  private val Raw = ("raw", 0, 0, 0)

  /** PNG geometry: 8-byte signature, then the IHDR chunk the spec requires
    * FIRST — length (int32-BE, must be 13) at offset 8, type "IHDR" at 12,
    * then width/height int32-BE, bit depth, color type. Channels follow
    * from the color type (0 gray, 2 RGB, 3 palette, 4 gray+alpha,
    * 6 RGBA). */
  private def pngMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
    if (bytes.length < 33) return Raw
    val bb = ByteBuffer.wrap(bytes) // big-endian per the PNG spec
    if (bb.getInt(8) != 13 || bytes(12) != 'I' || bytes(13) != 'H' ||
      bytes(14) != 'D' || bytes(15) != 'R') return Raw
    val w = bb.getInt(16)
    val h = bb.getInt(20)
    val depth = bytes(24) & 0xff
    val channels = (bytes(25) & 0xff) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => 0
    }
    val depthOk =
      depth == 1 || depth == 2 || depth == 4 || depth == 8 || depth == 16
    if (w <= 0 || h <= 0 || channels == 0 || !depthOk) Raw
    else ("png", w, h, channels)
  }

  /** JPEG geometry: after SOI, walk the length-prefixed marker segments to
    * the first SOFn (0xC0–0xCF minus the non-frame DHT 0xC4, JPG 0xC8,
    * DAC 0xCC), whose payload is precision, lines (uint16-BE), samples
    * (uint16-BE), component count. Standalone markers (RSTn, TEM) carry no
    * length; EOI or SOS before any SOF means no recoverable geometry. */
  private def jpegMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
    var i = 2
    while (i + 1 < bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return Raw
      var m = bytes(i + 1) & 0xff
      while (m == 0xff && i + 2 < bytes.length) { i += 1; m = bytes(i + 1) & 0xff }
      if (m == 0xd9 || m == 0xda) return Raw // EOI / SOS: no SOF seen
      else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone
      else {
        if (i + 3 >= bytes.length) return Raw
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        if (len < 2) return Raw
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 9 >= bytes.length) return Raw
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          val nComp = bytes(i + 9) & 0xff
          return if (w <= 0 || h <= 0 || nComp <= 0) Raw
          else ("jpeg", w, h, nComp)
        }
        i += 2 + len
      }
    }
    Raw
  }

  /** GIF geometry: "GIF87a"/"GIF89a" signature, then the Logical Screen
    * Descriptor's canvas width/height (uint16-LE at offsets 6/8) — the
    * header every GIF must carry before any block. Palette-indexed RGB →
    * 3 channels. */
  private def gifMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
    if (bytes.length < 13) return Raw
    val w = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
    val h = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    if (w <= 0 || h <= 0) Raw else ("gif", w, h, 3)
  }

  /** WebP geometry per the public container spec (RIFF("WEBP") + one
    * first chunk):
    *  - "VP8 " lossy: 3-byte frame tag, 0x9D 0x01 0x2A start code, then
    *    14-bit width/height (uint16-LE & 0x3fff);
    *  - "VP8L" lossless: 0x2F signature, then width-1 / height-1 as
    *    14-bit fields bit-packed little-endian, alpha at bit 28;
    *  - "VP8X" extended: flags byte (alpha = 0x10), then 24-bit LE
    *    canvas width-1 / height-1.
    * Anything else (truncated, bad start code, unknown fourcc) → raw. */
  private def webpMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
    if (bytes.length < 30) return Raw
    new String(bytes, 12, 4, StandardCharsets.US_ASCII) match {
      case "VP8 " =>
        if ((bytes(23) & 0xff) != 0x9d || (bytes(24) & 0xff) != 0x01 ||
          (bytes(25) & 0xff) != 0x2a) Raw
        else {
          val w = ((bytes(26) & 0xff) | ((bytes(27) & 0xff) << 8)) & 0x3fff
          val h = ((bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)) & 0x3fff
          if (w <= 0 || h <= 0) Raw else ("webp", w, h, 3)
        }
      case "VP8L" =>
        if ((bytes(20) & 0xff) != 0x2f) Raw
        else {
          val b1 = bytes(21) & 0xff; val b2 = bytes(22) & 0xff
          val b3 = bytes(23) & 0xff; val b4 = bytes(24) & 0xff
          val w = (b1 | ((b2 & 0x3f) << 8)) + 1
          val h = ((b2 >> 6) | (b3 << 2) | ((b4 & 0x0f) << 10)) + 1
          ("webp", w, h, if ((b4 & 0x10) != 0) 4 else 3)
        }
      case "VP8X" =>
        val flags = bytes(20) & 0xff
        val w = ((bytes(24) & 0xff) | ((bytes(25) & 0xff) << 8) |
          ((bytes(26) & 0xff) << 16)) + 1
        val h = ((bytes(27) & 0xff) | ((bytes(28) & 0xff) << 8) |
          ((bytes(29) & 0xff) << 16)) + 1
        ("webp", w, h, if ((flags & 0x10) != 0) 4 else 3)
      case _ => Raw
    }
  }

  /** Real metadata decode: BMP (BITMAPINFOHEADER: width int32-LE @18,
    * height int32-LE @22 — negative means top-down, bits-per-pixel
    * uint16-LE @28), binary netpbm (P6 RGB / P5 gray: magic, then
    * whitespace/comment-separated width, height, maxval — the magic MUST
    * be followed by whitespace or a comment per the netpbm grammar, so
    * "P6123..." is not a 123-wide PPM), PNG ([[pngMeta]]), JPEG
    * ([[jpegMeta]]), GIF ([[gifMeta]]), and WebP ([[webpMeta]] — the
    * VP8/VP8L/VP8X chunk variants a real crawl carries).
    * Unrecognized or malformed payloads come back as
    * ("raw", 0, 0, 0) rather than erroring — at 100 TB a poison blob must
    * not kill the job, and must not parse to confidently wrong geometry
    * either. */
  private[graft] def decodeMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(18)
      val hRaw = bb.getInt(22)
      val bits = bb.getShort(28) & 0xffff
      if (w <= 0 || hRaw == 0 || bits % 8 != 0 || bits == 0) Raw
      else ("bmp", w, math.abs(hRaw), bits / 8)
    } else if (bytes.length >= 3 && bytes(0) == 'P' &&
        (bytes(1) == '5' || bytes(1) == '6') && {
          val c = bytes(2) & 0xff
          c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '#'
        }) {
      val dims = pnmInts(bytes, 2, 3) // width, height, maxval
      if (dims == null || dims(0) <= 0 || dims(1) <= 0) Raw
      else if (bytes(1) == '6') ("ppm", dims(0), dims(1), 3)
      else ("pgm", dims(0), dims(1), 1)
    } else if (bytes.length >= 8 &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(bytes, 0, 8), pngSignature)) {
      pngMeta(bytes)
    } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) {
      jpegMeta(bytes)
    } else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      gifMeta(bytes)
    } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
        bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P') {
      webpMeta(bytes)
    } else if (bytes.length >= 8 &&
        ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 &&
          bytes(3) == 0) ||
         (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
          bytes(3) == 42))) {
      tiffMeta(bytes)
    } else Raw
  }

  /** TIFF geometry (r14): a light first-IFD walk for
    * ImageWidth/ImageLength/SamplesPerPixel — header-only, the same
    * cost class as the other meta parses. */
  private def tiffMeta(bytes: Array[Byte]): (String, Int, Int, Int) = {
    val little = bytes(0) == 'I'
    def u16(o: Int): Int =
      if (o + 2 > bytes.length) -1
      else if (little) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else if (little) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return Raw
    val nTags = u16(ifd.toInt)
    if (nTags <= 0 || ifd + 2 + 12L * nTags > bytes.length) return Raw
    var w = 0
    var h = 0
    var spp = 1
    var t = 0
    while (t < nTags) {
      val e = ifd.toInt + 2 + 12 * t
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      // only a count-1 SHORT/LONG stores its value inline; count>1 stores
      // an offset there, which would be misread as bogus geometry
      if ((typ == 3 || typ == 4) && cnt == 1L) {
        val v = if (typ == 3) u16(e + 8).toLong else u32(e + 8)
        tag match {
          case 256 => w = v.toInt
          case 257 => h = v.toInt
          case 277 => spp = v.toInt
          case _ => ()
        }
      }
      t += 1
    }
    if (w <= 0 || h <= 0 || spp <= 0) Raw else ("tiff", w, h, spp)
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
    frameFanout(media
        .withColumn("duration_ms", length(col("payload")).cast("long")),
      fps, maxFrames)

  /** The frame fan-out core over an explicit `duration_ms` column:
    * `fps` frames/sec, every (n_frames div maxFrames)-th frame (≥ 1), one
    * row per sampled frame with its timestamp. The sequence is guarded:
    * Spark's sequence(0, -1) steps BACKWARD, so zero-duration media must
    * yield an empty array, matching the oracle's empty generate_series.
    * [[sampleFrames]] feeds it the byte-length stand-in;
    * [[sampleFramesAv]] feeds it the REAL header-parsed duration. */
  def frameFanout(withDuration: DataFrame, fps: Int = 25,
      maxFrames: Int = 8): DataFrame =
    withDuration
      .withColumn("n_frames",
        expr(s"(duration_ms * $fps) div 1000").cast("long"))
      .withColumn("step", greatest(lit(1L), expr(s"n_frames div $maxFrames")))
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
            expr("sequence(0L, n_frames - 1, step)"))
          .otherwise(array().cast("array<long>"))))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"(frame_idx * 1000) div $fps").as("ts_ms"))

  /** Frame sampling from REAL container timing: the A/V header decode's
    * duration_ms (WAV data-chunk sample count / rate, MP4 mvhd
    * duration / timescale) drives the fan-out, so the frame grid a codec
    * would be handed matches the actual media clock, not a byte-length
    * proxy. Map-only before the explode; output is ≤ maxFrames rows per
    * doc. */
  def sampleFramesAv(avFeatures: DataFrame, fps: Int = 25,
      maxFrames: Int = 8): DataFrame =
    frameFanout(avFeatures.select(col("doc_id"), col("duration_ms")),
      fps, maxFrames)

  // ---------------------------------------------------------------------
  // Audio/video containers: REAL WAV (RIFF) and MP4 (ISO BMFF) headers
  // ---------------------------------------------------------------------

  /** Decoded A/V features: header-parsed container parameters. `format` is
    * "wav" / "mp4" for recognized payloads, "raw" (zero params) otherwise.
    * For WAV, `sample_rate`/`channels` come from the fmt chunk and
    * duration from the data chunk's sample count; for MP4, `sample_rate`
    * carries the mvhd movie timescale (units/sec — the container-level
    * clock; per-track audio rates live in stsd, out of header scope) and
    * channels is 0. */
  final case class AvFeatures(doc_id: Long, source: String, n_bytes: Long,
      format: String, channels: Int, sample_rate: Int, duration_ms: Long)

  /** Planted A/V parameters for `id` — the oracle's ground truth. Format
    * g = id%2 (wav/mp4); WAV: standard rate ladder, 1–2 channels,
    * id%1000+100 samples; MP4: standard movie-timescale ladder,
    * id%100000+1000 mvhd duration units, id%256-byte mdat payload. */
  private[graft] val wavRates = Array(8000, 16000, 22050, 44100, 48000)
  private[graft] val mp4Timescales = Array(600, 1000, 90000, 24000, 48000)

  /** Builds a complete, valid A/V container for `id`: a 16-bit PCM WAV
    * (RIFF + fmt + data chunks, spec-exact 44-byte header) or an MP4
    * (ftyp + moov/mvhd version-0 + mdat boxes per ISO/IEC 14496-12).
    * Payload bytes are zeros — geometry/timing is what a header decode
    * recovers; the entropy-coded samples would need a codec. */
  private[graft] def makeAv(id: Long): Array[Byte] = {
    if (id % 2 == 0) { // WAV: RIFF("WAVE") + fmt(16, PCM) + data
      val channels = ((id / 2) % 2 + 1).toInt
      val rate = wavRates((id % 5).toInt)
      val nSamples = (id % 1000 + 100).toInt
      val dataSize = nSamples * channels * 2
      val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(36 + dataSize)
      bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
      bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(16)                       // PCM fmt chunk size
      bb.putShort(1)                      // audio format: PCM
      bb.putShort(channels.toShort)
      bb.putInt(rate)
      bb.putInt(rate * channels * 2)      // byte rate
      bb.putShort((channels * 2).toShort) // block align
      bb.putShort(16)                     // bits per sample
      bb.put("data".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(dataSize)
      bb.array()
    } else { // MP4: ftyp + moov(mvhd v0) + mdat, all length-prefixed BE
      val timescale = mp4Timescales((id % 5).toInt)
      val duration = (id % 100000 + 1000).toInt
      val mdatPayload = (id % 256).toInt
      val bb = ByteBuffer.allocate(16 + 116 + 8 + mdatPayload) // big-endian
      bb.putInt(16)
      bb.put("ftyp".getBytes(StandardCharsets.US_ASCII))
      bb.put("isom".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(0)                        // minor version
      bb.putInt(116)
      bb.put("moov".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(108)
      bb.put("mvhd".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(0)                        // version 0 + flags
      bb.putInt(0)                        // creation time
      bb.putInt(0)                        // modification time
      bb.putInt(timescale)
      bb.putInt(duration)
      bb.putInt(0x00010000)               // rate 1.0
      bb.putShort(0x0100.toShort)         // volume 1.0
      bb.position(bb.position() + 10)     // reserved
      for (v <- Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000))
        bb.putInt(v)                      // identity matrix
      bb.position(bb.position() + 24)     // pre_defined
      bb.putInt(2)                        // next track id
      bb.putInt(8 + mdatPayload)
      bb.put("mdat".getBytes(StandardCharsets.US_ASCII))
      bb.array()
    }
  }

  /** Documents → synthetic A/V table (WAV / MP4 round-robin, planted
    * parameters) — the audio/video twin of [[syntheticImageTable]]. */
  def syntheticAvTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) => MediaRow(id, makeAv(id), src) }
      .toDF()
  }

  private val RawAv = ("raw", 0, 0, 0L)

  /** WAV metadata: "RIFF"+"WAVE" magic, then the chunk walk the RIFF
    * grammar defines — [id(4) size(4-LE) payload(size, word-aligned)].
    * Reads channels/rate/bits from "fmt ", sample count from "data"'s
    * size; either chunk missing or degenerate (zero rate/channels, odd
    * bits) degrades to raw. duration_ms floors (n·1000)/rate in integer
    * math — engine-exact. */
  private def wavMeta(bytes: Array[Byte]): (String, Int, Int, Long) = {
    if (bytes.length < 12 || bytes(8) != 'W' || bytes(9) != 'A' ||
      bytes(10) != 'V' || bytes(11) != 'E') return RawAv
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var channels = 0; var rate = 0; var bits = 0; var dataSize = -1L
    while (i + 8 <= bytes.length) {
      val size = bb.getInt(i + 4).toLong & 0xffffffffL
      val tag = new String(bytes, i, 4, StandardCharsets.US_ASCII)
      if (tag == "fmt " && size >= 16 && i + 24 <= bytes.length) {
        channels = bb.getShort(i + 10) & 0xffff
        rate = bb.getInt(i + 12)
        bits = bb.getShort(i + 22) & 0xffff
      } else if (tag == "data") dataSize = size
      if (size > Int.MaxValue - 16) return RawAv // toInt would go negative
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || bits % 8 != 0 ||
      dataSize < 0) RawAv
    else {
      val nSamples = dataSize / (channels * (bits / 8))
      ("wav", channels, rate, nSamples * 1000L / rate)
    }
  }

  /** MP4 metadata per ISO/IEC 14496-12: walk the top-level length-prefixed
    * boxes to moov, then moov's children to mvhd; version 0 puts the
    * movie timescale at byte 12 and duration at 16 of the box payload
    * (version 1 widens them to 64-bit at the same offsets). A box size
    * under 8 would loop forever — degrade to raw instead. */
  private def mp4Meta(bytes: Array[Byte]): (String, Int, Int, Long) = {
    val bb = ByteBuffer.wrap(bytes) // big-endian per ISO BMFF
    def findBox(from: Int, until: Int, typ: String): Int = {
      var i = from
      while (i + 8 <= until) {
        val size = bb.getInt(i)
        if (size < 8) return -1
        if (new String(bytes, i + 4, 4, StandardCharsets.US_ASCII) == typ)
          return i
        i += size
      }
      -1
    }
    val moov = findBox(0, bytes.length, "moov")
    if (moov < 0) return RawAv
    val moovEnd = math.min(moov + bb.getInt(moov), bytes.length)
    val mvhd = findBox(moov + 8, moovEnd, "mvhd")
    if (mvhd < 0) return RawAv
    val version = bytes(mvhd + 8) & 0xff
    if (version == 0 && mvhd + 28 <= bytes.length) {
      val timescale = bb.getInt(mvhd + 20)
      val duration = bb.getInt(mvhd + 24).toLong & 0xffffffffL
      if (timescale <= 0) RawAv
      else ("mp4", 0, timescale, duration * 1000L / timescale)
    } else if (version == 1 && mvhd + 40 <= bytes.length) {
      val timescale = bb.getInt(mvhd + 28)
      val duration = bb.getLong(mvhd + 32)
      if (timescale <= 0 || duration < 0) RawAv
      else ("mp4", 0, timescale, duration * 1000L / timescale)
    } else RawAv
  }

  // ---------------------------------------------------------------------
  // Audio stream census: MP3 frame walk + Ogg/Opus page walk (r14 — the
  // audio analog of the IVF key-frame census: per-payload header-only
  // scans that recover timing without entropy decode)
  // ---------------------------------------------------------------------

  // MPEG-1 Layer III tables (ISO 11172-3): bitrate kbps by 4-bit index
  // (0 = free, 15 = bad — both rejected), sample rate by 2-bit index
  private val Mp3Bitrates: Array[Int] = Array(-1, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3Rates: Array[Int] = Array(44100, 48000, 32000, -1)

  /** MP3 census: optional ID3v2 prefix (syncsafe size) skipped, then a
    * strict MPEG-1 Layer III frame walk — 11-bit sync, version/layer
    * pinned, bitrate/rate tables, padding bit, frame size
    * 144·bitrate/rate + padding — to EOF or an ID3v1 "TAG" trailer.
    * Every frame must parse and rates must agree (VBR bitrates may
    * vary); duration = frames · 1152 / rate. Anything else → raw. */
  private[graft] def mp3Meta(bytes: Array[Byte]): (String, Int, Int, Long) = {
    var i = 0
    // ID3v2: "ID3" + ver(2) + flags + 4-byte syncsafe size
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      i = 10 + sz
    }
    var nFrames = 0L
    var rate = -1
    var channels = 0
    while (i + 4 <= bytes.length) {
      // ID3v1 trailer ends the stream
      if (i + 3 <= bytes.length && bytes(i) == 'T' && bytes(i + 1) == 'A' &&
        bytes(i + 2) == 'G' && bytes.length - i == 128) {
        i = bytes.length
      } else {
        val h0 = bytes(i) & 0xff
        val h1 = bytes(i + 1) & 0xff
        val h2 = bytes(i + 2) & 0xff
        val h3 = bytes(i + 3) & 0xff
        // sync + MPEG-1 (version bits 11) + Layer III (01)
        if (h0 != 0xff || (h1 & 0xfe) != 0xfa) return RawAv
        val brIdx = h2 >> 4
        val srIdx = (h2 >> 2) & 3
        val padding = (h2 >> 1) & 1
        val mode = h3 >> 6
        val br = Mp3Bitrates(brIdx)
        val sr = Mp3Rates(srIdx)
        if (br < 0 || sr < 0) return RawAv
        if (rate < 0) rate = sr else if (rate != sr) return RawAv
        val ch = if (mode == 3) 1 else 2
        if (channels == 0) channels = ch else if (channels != ch) return RawAv
        val frameLen = 144 * br * 1000 / sr + padding
        if (frameLen < 4 || i + frameLen > bytes.length) return RawAv
        nFrames += 1
        i += frameLen
      }
    }
    if (nFrames == 0 || i != bytes.length) RawAv
    else ("mp3", channels, rate, nFrames * 1152L * 1000 / rate)
  }

  /** Ogg page CRC (poly 0x04c11db7, init 0, MSB-first, no reflection —
    * the Ogg spec's own variant) over a page with its CRC field zeroed. */
  private[graft] def oggCrc(bytes: Array[Byte], from: Int, until: Int,
      crcFieldAt: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      val b = if (i >= crcFieldAt && i < crcFieldAt + 4) 0 else bytes(i) & 0xff
      crc ^= b << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7
          else crc << 1
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Ogg/Opus census: the page walk ("OggS", version 0, CRC verified
    * per page, lacing table) plus the OpusHead identification packet
    * (channels, pre-skip, input rate); duration from the LAST page's
    * granule position minus pre-skip at the Opus-mandated 48 kHz clock.
    * Non-Opus Ogg streams report ("ogg", 0, 0, 0) — container
    * recognized, codec timing out of scope. */
  private[graft] def oggMeta(bytes: Array[Byte]): (String, Int, Int, Long) = {
    var i = 0
    var lastGranule = 0L
    var nPages = 0
    var opusCh = 0
    var opusRate = 0
    var preSkip = 0
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    while (i + 27 <= bytes.length) {
      if (bytes(i) != 'O' || bytes(i + 1) != 'g' || bytes(i + 2) != 'g' ||
        bytes(i + 3) != 'S' || bytes(i + 4) != 0) return RawAv
      var granule = 0L
      var k = 7
      while (k >= 0) { granule = (granule << 8) | (bytes(i + 6 + k) & 0xffL); k -= 1 }
      val nSegs = bytes(i + 26) & 0xff
      if (i + 27 + nSegs > bytes.length) return RawAv
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += bytes(i + 27 + s) & 0xff; s += 1 }
      val pageEnd = i + 27 + nSegs + bodyLen
      if (pageEnd > bytes.length) return RawAv
      if (u32(i + 22).toInt != oggCrc(bytes, i, pageEnd, i + 22))
        return RawAv
      if (nPages == 0 && bodyLen >= 19) {
        val b0 = i + 27 + nSegs
        if (new String(bytes, b0, 8, StandardCharsets.US_ASCII) == "OpusHead") {
          opusCh = bytes(b0 + 9) & 0xff
          preSkip = (bytes(b0 + 10) & 0xff) | ((bytes(b0 + 11) & 0xff) << 8)
          opusRate = u32(b0 + 12).toInt
        }
      }
      // granule −1 marks a page with no completed packets; skip it
      if (granule != -1L) lastGranule = granule
      nPages += 1
      i = pageEnd
    }
    if (nPages == 0 || i != bytes.length) RawAv
    else if (opusCh == 0) ("ogg", 0, 0, 0L)
    else ("opus", opusCh, opusRate,
      math.max(0L, lastGranule - preSkip) * 1000 / 48000)
  }

  /** MP3 fixture: `nFrames` spec-valid MPEG-1 Layer III frames (zeroed
    * payloads — timing is what a census recovers) with a per-frame
    * bitrate index (VBR when it varies) and padding on every third
    * frame, behind an optional ID3v2 prefix and before an optional
    * ID3v1 "TAG" trailer. */
  private[graft] def makeMp3(nFrames: Int, srIdx: Int,
      brIdxOf: Int => Int, mono: Boolean, id3v2Bytes: Int = 0,
      id3v1: Boolean = false): Array[Byte] = {
    require(nFrames > 0 && srIdx >= 0 && srIdx <= 2)
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0)
      out.write((id3v2Bytes >> 21) & 0x7f)
      out.write((id3v2Bytes >> 14) & 0x7f)
      out.write((id3v2Bytes >> 7) & 0x7f)
      out.write(id3v2Bytes & 0x7f)
      var k = 0
      while (k < id3v2Bytes) { out.write(0); k += 1 }
    }
    val sr = Mp3Rates(srIdx)
    var f = 0
    while (f < nFrames) {
      val brIdx = brIdxOf(f)
      val br = Mp3Bitrates(brIdx)
      require(br > 0, s"bad bitrate index $brIdx")
      val pad = if (f % 3 == 0) 1 else 0
      val len = 144 * br * 1000 / sr + pad
      out.write(0xff)
      out.write(0xfb) // MPEG-1, Layer III, no CRC
      out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      out.write(if (mono) 0xc0 else 0x00)
      var k = 4
      while (k < len) { out.write(0); k += 1 }
      f += 1
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      var k = 3
      while (k < 128) { out.write(0); k += 1 }
    }
    out.toByteArray
  }

  /** Ogg/Opus fixture: a BOS page carrying a spec-valid OpusHead
    * (version 1, channel count, pre-skip, input rate, zero gain,
    * mapping family 0), then one page per granule value (zeroed
    * single-segment packets, the last flagged EOS), every page CRC'd
    * with the Ogg polynomial. */
  private[graft] def makeOggOpus(channels: Int, preSkip: Int,
      inputRate: Int, pageGranules: Seq[Long]): Array[Byte] = {
    require(channels >= 1 && channels <= 8 && pageGranules.nonEmpty)
    val serial = 0x47524654 // arbitrary stream serial
    def page(seq: Int, granule: Long, headerType: Int,
        body: Array[Byte]): Array[Byte] = {
      require(body.length <= 255)
      val p = new Array[Byte](28 + body.length)
      p(0) = 'O'; p(1) = 'g'; p(2) = 'g'; p(3) = 'S'
      p(4) = 0
      p(5) = headerType.toByte
      var k = 0
      while (k < 8) { p(6 + k) = ((granule >> (8 * k)) & 0xff).toByte; k += 1 }
      k = 0
      while (k < 4) { p(14 + k) = ((serial >> (8 * k)) & 0xff).toByte; k += 1 }
      k = 0
      while (k < 4) { p(18 + k) = ((seq >> (8 * k)) & 0xff).toByte; k += 1 }
      p(26) = 1 // one lacing segment
      p(27) = body.length.toByte
      System.arraycopy(body, 0, p, 28, body.length)
      val crc = oggCrc(p, 0, p.length, 22)
      k = 0
      while (k < 4) { p(22 + k) = ((crc >> (8 * k)) & 0xff).toByte; k += 1 }
      p
    }
    val head = new Array[Byte](19)
    System.arraycopy("OpusHead".getBytes(StandardCharsets.US_ASCII), 0,
      head, 0, 8)
    head(8) = 1 // version
    head(9) = channels.toByte
    head(10) = (preSkip & 0xff).toByte
    head(11) = ((preSkip >> 8) & 0xff).toByte
    var k = 0
    while (k < 4) { head(12 + k) = ((inputRate >> (8 * k)) & 0xff).toByte; k += 1 }
    // gain (16) + mapping family already zero
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(0, 0L, 0x02, head)) // BOS
    pageGranules.zipWithIndex.foreach { case (g, idx) =>
      val eos = idx == pageGranules.length - 1
      out.write(page(idx + 1, g, if (eos) 0x04 else 0x00, new Array[Byte](8)))
    }
    out.toByteArray
  }

  /** Real A/V metadata decode: WAV via the RIFF chunk walk, MP4 via the
    * ISO BMFF box walk. Same poison-blob contract as [[decodeMeta]]:
    * unrecognized or malformed payloads are ("raw", 0, 0, 0), never a
    * crash or confidently wrong timing. */
  private[graft] def decodeAvMeta(bytes: Array[Byte]): (String, Int, Int, Long) = {
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F') wavMeta(bytes)
    else if (bytes.length >= 12 &&
      new String(bytes, 4, 4, StandardCharsets.US_ASCII) == "ftyp")
      mp4Meta(bytes)
    else if (bytes.length >= 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C') flacMeta(bytes)
    else if (bytes.length >= 27 && bytes(0) == 'O' && bytes(1) == 'g' &&
      bytes(2) == 'g' && bytes(3) == 'S') oggMeta(bytes)
    else if (bytes.length >= 4 && (((bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xfe) == 0xfa) ||
      (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')))
      mp3Meta(bytes)
    else RawAv
  }

  /** FLAC STREAMINFO metadata (r14, next to the [[graft.ops.Flac]]
    * sample decoder): the spec requires STREAMINFO as the first block,
    * so rate/channels/duration read from fixed offsets — header-only,
    * the same cost class as the WAV/MP4 walks. */
  private def flacMeta(bytes: Array[Byte]): (String, Int, Int, Long) = {
    val btype = bytes(4) & 0x7f
    val len = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) |
      (bytes(7) & 0xff)
    if (btype != 0 || len != 34 || bytes.length < 8 + 34) RawAv
    else {
      def b(i: Int): Int = bytes(8 + i) & 0xff
      val rate = (b(10) << 12) | (b(11) << 4) | (b(12) >> 4)
      val ch = ((b(12) >> 1) & 7) + 1
      val total = ((b(13) & 0x0f).toLong << 32) | (b(14).toLong << 24) |
        (b(15) << 16) | (b(16) << 8) | b(17)
      if (rate <= 0) RawAv else ("flac", ch, rate, total * 1000L / rate)
    }
  }

  /** Batch A/V feature extraction — the audio/video twin of
    * [[extractFeatures]]: typed Dataset, mapPartitions batch shape,
    * allocation-light header parse per row. */
  def extractAvFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[AvFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { row =>
        val (fmt, ch, rate, durMs) = decodeAvMeta(row.payload)
        AvFeatures(row.doc_id, row.source, row.payload.length.toLong,
          fmt, ch, rate, durMs)
      }
    }
  }

  // ---------------------------------------------------------------------
  // Perceptual hash (dHash) + Hamming-banded image near-dup
  // ---------------------------------------------------------------------

  /** Per-image 64-bit dHash as two non-negative 32-bit halves (the
    * SimHash sign-bit discipline: no shift ever touches bit 63 in either
    * engine). */
  final case class ImageHash(doc_id: Long, ph_lo: Long, ph_hi: Long)

  /** Planted geometry for the TEXTURED image of `id`: dims are a function
    * of the pattern class pid = id % 8 (same pid ⇒ same canvas), format
    * round-robins over the six pixel-carrying formats (bmp/ppm/pgm/png/
    * gif/webp-vp8l — no jpeg: the synthetic jpeg is header-only, nothing
    * to hash). The phash oracle depends only on the planted pixel
    * formula, so the format mix is pure decode coverage: a GIF LZW or
    * WebP VP8L decode that drifted by one pixel would hash differently
    * and hash-fail the driver gate. */
  private[graft] def texturedDims(id: Long): (Int, Int, Int) = {
    val pid = (id % 8).toInt
    (16 + pid * 7, 16 + pid * 5, (id % 6).toInt match {
      case 4 => 5 // gif
      case 5 => 6 // webp vp8l
      case other => other
    })
  }

  /** Planted gray value at (x, y) — the oracle's ground truth, recovered
    * by Spark from the encoded bytes. The quadratic base pattern depends
    * only on the pattern class (same pid ⇒ same texture; the mod-256
    * wraps make it non-monotonic so dHash bits are informative), while
    * the sparse id-dependent perturbation (~1/97 of pixels, +128 mod 256)
    * gives same-pid images SMALL nonzero Hamming distances and
    * different-pid images unrelated hashes — exactly the near-dup
    * geometry a perceptual hash exists to detect. */
  private[graft] def texturedGray(id: Long, x: Int, y: Int): Int = {
    val pid = (id % 8).toInt
    val base = (x * x * 3 + y * y * 5 + x * y * (pid + 1) + pid * 17) % 256
    if ((x + y * 9 + id) % 97 == 0) (base + 128) % 256 else base
  }

  private[graft] def makeTexturedImage(id: Long): Array[Byte] = {
    val (w, h, f) = texturedDims(id)
    buildImage(w, h, f, (x, y) => texturedGray(id, x, y).toByte)
  }

  /** Documents → textured image table: REAL encoded files with planted
    * per-pixel patterns (vs [[syntheticImageTable]]'s constant fill) —
    * the fixture corpus for the perceptual-hash dedup path. */
  def syntheticTexturedImageTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) => MediaRow(id, makeTexturedImage(id), src) }
      .toDF()
  }

  /** Returns the index just past the netpbm header (magic, width, height,
    * maxval, then EXACTLY one whitespace byte before the raster per the
    * spec), or -1 if malformed. */
  private def pnmRasterStart(bytes: Array[Byte]): Int = {
    var i = 2
    var k = 0
    while (k < 3) {
      if (i >= bytes.length) return -1
      val c = bytes(i) & 0xff
      if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
      else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
      else if (c >= '0' && c <= '9') {
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        k += 1
      } else return -1
    }
    if (i >= bytes.length) -1 else i + 1 // the single post-maxval whitespace
  }

  /** Full grayscale pixel decode for the formats that carry raster data:
    * BMP (24 bpp bottom-up), PPM/PGM (binary raster after the header),
    * PNG (8-bit RGB, any zlib IDAT stream via Inflater, filter-0 rows),
    * GIF ([[decodeGifGray]] — full LZW incl. interlace), lossless
    * WebP ([[decodeVp8lGray]] — the documented VP8L subset), lossy WebP
    * ([[Vp8]] — key-frame subset, r12), and baseline grayscale JPEG
    * ([[Jpeg]] — r14).
    * Achromatic contract: color formats take the first channel as gray
    * (planted pixels write equal channels; a real pipeline would slot a
    * luma transform here). Poison-blob contract as [[decodeMeta]]:
    * anything malformed, truncated, filtered, or out of the documented
    * subsets returns None, never a crash. */
  private[graft] def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val (fmt, w, h, _) = decodeMeta(bytes)
    fmt match {
      case "bmp" =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val off = bb.getInt(10)
        val hRaw = bb.getInt(22)
        val bits = bb.getShort(28) & 0xffff
        val rowSize = ((3 * w + 3) / 4) * 4
        if (bits != 24 || hRaw <= 0 || off < 54 ||
          off.toLong + rowSize.toLong * h > bytes.length) None
        else {
          val g = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            val base = off + (h - 1 - y) * rowSize
            var x = 0
            while (x < w) { g(y * w + x) = bytes(base + 3 * x) & 0xff; x += 1 }
            y += 1
          }
          Some((w, h, g))
        }
      case "ppm" | "pgm" =>
        val ch = if (fmt == "ppm") 3 else 1
        val start = pnmRasterStart(bytes)
        if (start < 0 || start.toLong + ch.toLong * w * h > bytes.length) None
        else {
          val g = new Array[Int](w * h)
          var i = 0
          while (i < w * h) { g(i) = bytes(start + ch * i) & 0xff; i += 1 }
          Some((w, h, g))
        }
      case "png" =>
        // IHDR: depth 8, color type 2 (RGB), interlace 0 (sequential)
        // or 1 (Adam7 — r14; previously an interlaced stream would
        // inflate to the wrong length or, worse, a coincidentally-sized
        // buffer misread as sequential rows)
        val interlace = bytes(28) & 0xff
        if ((bytes(24) & 0xff) != 8 || (bytes(25) & 0xff) != 2 ||
          interlace > 1) None
        else try {
          // concatenate IDAT chunk payloads, then inflate (handles any
          // zlib stream, stored or compressed)
          val bb = ByteBuffer.wrap(bytes)
          val idat = new java.io.ByteArrayOutputStream()
          var i = 8
          var ok = true
          while (ok && i + 8 <= bytes.length) {
            val len = bb.getInt(i)
            val typ = new String(bytes, i + 4, 4, StandardCharsets.US_ASCII)
            if (len < 0 || i + 12L + len > bytes.length) ok = false
            else {
              if (typ == "IDAT") idat.write(bytes, i + 8, len)
              if (typ == "IEND") ok = false
              i += 12 + len
            }
          }
          val rawLen =
            if (interlace == 0) h * (1 + 3 * w)
            else (0 until 7).map { p =>
              val pw = (w - A7X0(p) + A7DX(p) - 1) / A7DX(p)
              val ph = (h - A7Y0(p) + A7DY(p) - 1) / A7DY(p)
              if (pw <= 0 || ph <= 0) 0 else ph * (1 + 3 * pw)
            }.sum
          val inf = new java.util.zip.Inflater()
          inf.setInput(idat.toByteArray)
          val raw = new Array[Byte](rawLen)
          val n = inf.inflate(raw)
          val exhausted = inf.finished || inf.getRemaining == 0
          inf.end()
          if (n != raw.length || !exhausted) None
          else if (interlace == 0) {
            if (!pngUnfilter(raw, w, h)) None
            else {
              val g = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                val rowStart = y * (1 + 3 * w)
                var x = 0
                while (x < w) {
                  g(y * w + x) = raw(rowStart + 1 + 3 * x) & 0xff
                  x += 1
                }
                y += 1
              }
              Some((w, h, g))
            }
          } else {
            // Adam7: seven independently-filtered sub-images (each
            // pass's rows predict only from rows of the SAME pass),
            // scattered onto the 8×8 grid
            val g = new Array[Int](w * h)
            var off = 0
            var p = 0
            var bad = false
            while (!bad && p < 7) {
              val pw = (w - A7X0(p) + A7DX(p) - 1) / A7DX(p)
              val ph = (h - A7Y0(p) + A7DY(p) - 1) / A7DY(p)
              if (pw > 0 && ph > 0) {
                val passLen = ph * (1 + 3 * pw)
                val pass = java.util.Arrays.copyOfRange(raw, off,
                  off + passLen)
                if (!pngUnfilter(pass, pw, ph)) bad = true
                else {
                  var py = 0
                  while (py < ph) {
                    var px = 0
                    while (px < pw) {
                      g((A7Y0(p) + py * A7DY(p)) * w +
                        A7X0(p) + px * A7DX(p)) =
                        pass(py * (1 + 3 * pw) + 1 + 3 * px) & 0xff
                      px += 1
                    }
                    py += 1
                  }
                }
                off += passLen
              }
              p += 1
            }
            if (bad) None else Some((w, h, g))
          }
        } catch { case _: java.util.zip.DataFormatException => None }
      case "gif" => decodeGifGray(bytes, w, h)
      case "tiff" => decodeTiffGray(bytes)
      case "jpeg" =>
        // baseline subset (graft.ops.Jpeg, r14): grayscale directly,
        // color via its full-resolution luma plane (gray = Y, the same
        // achromatic contract as the other color formats); header-only
        // fixtures (no scan) and out-of-subset files return None
        Jpeg.decodeLumaGray(bytes)
      case "webp" =>
        // dispatch on the chunk fourcc: lossless → the VP8L subset
        // decoder; lossy "VP8 " → the key-frame luma subset decoder
        // (graft.ops.Vp8, r12); VP8X ANIMATIONS (r14) → first composited
        // frame, the same contract as GIF; still VP8X stays header-only
        if (bytes.length >= 16 && bytes(12) == 'V' && bytes(13) == 'P' &&
          bytes(14) == '8' && bytes(15) == 'L') decodeVp8lGray(bytes)
        else if (bytes.length >= 16 && bytes(12) == 'V' &&
          bytes(13) == 'P' && bytes(14) == '8' && bytes(15) == ' ')
          Vp8.decodeLumaGray(bytes)
        else if (bytes.length >= 21 && bytes(12) == 'V' &&
          bytes(13) == 'P' && bytes(14) == '8' && bytes(15) == 'X' &&
          (bytes(20) & 0x02) != 0)
          decodeWebpAnim(bytes).map { case (cw, ch2, fr) =>
            (cw, ch2, fr.head._2)
          }
        else None
      case _ => None
    }
  }

  /** PNG scanline unfiltering, ALL FIVE filter types (r14 — the
    * previous subset accepted only filter-0 rows, but real-world
    * encoders pick Sub/Up/Average/Paeth adaptively per row, so this was
    * the biggest practical PNG gap): None/Sub/Up/Average/Paeth per the
    * PNG spec §9, reconstructed in place over the 8-bit RGB scanlines
    * (bpp = 3, the decode subset's color type). The Paeth predictor
    * uses the spec's exact tie-breaking (a, then b, then c on equal
    * distances). Returns false on an unknown filter type. */
  // Adam7 pass geometry (PNG §8.2): x/y origins and steps per pass
  private val A7X0 = Array(0, 4, 0, 2, 0, 1, 0)
  private val A7Y0 = Array(0, 0, 4, 0, 2, 0, 1)
  private val A7DX = Array(8, 8, 4, 4, 2, 2, 1)
  private val A7DY = Array(8, 8, 8, 4, 4, 2, 2)

  private[graft] def pngUnfilter(raw: Array[Byte], w: Int, h: Int): Boolean = {
    val rowLen = 1 + 3 * w
    val bpp = 3
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a)
      val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < h) {
      val rs = y * rowLen
      val f = raw(rs) & 0xff
      if (f > 4) return false
      var i = 0
      while (i < 3 * w) {
        val x = raw(rs + 1 + i) & 0xff
        val a = if (i >= bpp) raw(rs + 1 + i - bpp) & 0xff else 0
        val b = if (y > 0) raw(rs - rowLen + 1 + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) raw(rs - rowLen + 1 + i - bpp) & 0xff
          else 0
        val recon = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case _ => x + paeth(a, b, c)
        }
        raw(rs + 1 + i) = (recon & 0xff).toByte
        i += 1
      }
      y += 1
    }
    true
  }

  /** Filtered-PNG fixture encoder: a spec-valid 8-bit RGB PNG whose
    * scanlines are REALLY filtered (`filterOf(row)` picks the type per
    * row) and deflate-compressed through the JDK (dynamic huffman — a
    * different zlib shape than [[buildImage]]'s stored blocks, so the
    * inflate path is exercised both ways). Gray-plants `pix` into all
    * three channels like the other fixtures. With `interlaced` the
    * raster is the Adam7 pass sequence (each sub-image filtered
    * independently, `filterOf` fed a running global row index) and the
    * IHDR interlace byte is 1. */
  private[graft] def makePngFiltered(w: Int, h: Int,
      pix: (Int, Int) => Int, filterOf: Int => Int,
      interlaced: Boolean = false): Array[Byte] = {
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a)
      val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val bpp = 3
    // filter one pw×ph sub-image of gray values into PNG scanlines
    def filterPass(gOf: (Int, Int) => Int, pw: Int, ph: Int,
        rowBase: Int): Array[Byte] = {
      val recon = new Array[Int](ph * 3 * pw)
      var y = 0
      while (y < ph) {
        var x = 0
        while (x < pw) {
          val g = gOf(x, y) & 0xff
          recon(y * 3 * pw + 3 * x) = g
          recon(y * 3 * pw + 3 * x + 1) = g
          recon(y * 3 * pw + 3 * x + 2) = g
          x += 1
        }
        y += 1
      }
      val rowLen = 1 + 3 * pw
      val raw = new Array[Byte](ph * rowLen)
      y = 0
      while (y < ph) {
        val f = filterOf(rowBase + y) & 0xff
        require(f <= 4, s"bad PNG filter $f")
        raw(y * rowLen) = f.toByte
        var i = 0
        while (i < 3 * pw) {
          val x = recon(y * 3 * pw + i)
          val a = if (i >= bpp) recon(y * 3 * pw + i - bpp) else 0
          val b = if (y > 0) recon((y - 1) * 3 * pw + i) else 0
          val c = if (y > 0 && i >= bpp) recon((y - 1) * 3 * pw + i - bpp)
            else 0
          val filt = f match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - ((a + b) >> 1)
            case _ => x - paeth(a, b, c)
          }
          raw(y * rowLen + 1 + i) = (filt & 0xff).toByte
          i += 1
        }
        y += 1
      }
      raw
    }
    val raw: Array[Byte] =
      if (!interlaced) filterPass(pix, w, h, 0)
      else {
        val parts = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var rowBase = 0
        var p = 0
        while (p < 7) {
          val pw = (w - A7X0(p) + A7DX(p) - 1) / A7DX(p)
          val ph = (h - A7Y0(p) + A7DY(p) - 1) / A7DY(p)
          if (pw > 0 && ph > 0) {
            val x0 = A7X0(p); val y0 = A7Y0(p)
            val dx = A7DX(p); val dy = A7DY(p)
            parts ++= filterPass(
              (px, py) => pix(x0 + px * dx, y0 + py * dy), pw, ph, rowBase)
            rowBase += ph
          }
          p += 1
        }
        parts.toArray
      }
    val def0 = new java.util.zip.Deflater()
    def0.setInput(raw)
    def0.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zn = def0.deflate(zbuf)
    def0.end()
    val zlib = java.util.Arrays.copyOf(zbuf, zn)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes(StandardCharsets.US_ASCII)
      val bb = ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(t)
      crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte)
      .put(if (interlaced) 1.toByte else 0.toByte)
    pngSignature ++ chunk("IHDR", ihdr.array()) ++
      chunk("IDAT", zlib) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** GIF pixel decode (closing the r9 codec-scope gap for the phash
    * path): Global/Local Color Table, first image frame, full LZW per
    * the GIF87a/89a spec (variable 3–12-bit codes LSB-first, clear/end
    * codes, dictionary growth with the deferred-clear quirk), including
    * the 4-pass interlaced row order (rows 0/8.., 4/12.., 2/6.., 1/3..
    * — the JDK's own GIF writer interlaces by default, so real-world
    * coverage requires it). Scope: first full-canvas frame with a
    * palette (extension blocks are skipped); gray = the palette entry's
    * first channel, the same achromatic contract as the other color
    * formats. WebP stays header-only — VP8/VP8L payloads are
    * entropy-coded like jpeg, the documented codec boundary. Poison-blob
    * contract: any structural violation returns None, never a crash. */
  // ---------------------------------------------------------------------
  // TIFF (r14): baseline 6.0 — IFD walk in both byte orders, gray/RGB
  // 8-bit, strip layout, Compression 1 (none) and 32773 (PackBits)
  // ---------------------------------------------------------------------

  /** Baseline TIFF decode: header ("II*\0" little / "MM\0*" big), the
    * first IFD's tag walk (ImageWidth/Length, BitsPerSample 8,
    * PhotometricInterpretation 1 gray / 2 RGB, SamplesPerPixel,
    * RowsPerStrip, StripOffsets/ByteCounts — SHORT or LONG, inline or
    * offset-stored), strip-by-strip raster assembly, and PackBits
    * (32773) decompression. Gray = first channel (the achromatic
    * contract of the other color formats). Returns None for anything
    * malformed or outside the subset (tiled layouts, other depths,
    * palette/CMYK, LZW/JPEG-in-TIFF). */
  private[graft] def decodeTiffGray(bytes: Array[Byte])
      : Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 8) return None
    val little =
      if (bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 &&
        bytes(3) == 0) true
      else if (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
        bytes(3) == 42) false
      else return None
    def u16(o: Int): Int =
      if (o + 2 > bytes.length) -1
      else if (little) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else if (little) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val nTags = u16(ifd.toInt)
    if (nTags <= 0 || ifd + 2 + 12L * nTags > bytes.length) return None
    var w = 0
    var h = 0
    var bps = 8 // default per spec
    var compression = 1
    var photometric = -1
    var spp = 1
    var rowsPerStrip = Int.MaxValue
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    // a tag's count values: SHORT (3) or LONG (4), inline when they fit
    // in the 4-byte value field, else at the stored offset
    def values(entry: Int, typ: Int, count: Int): Array[Long] = {
      val sz = if (typ == 3) 2 else 4
      val at =
        if (count * sz <= 4) entry + 8
        else u32(entry + 8).toInt
      if (at < 0 || at + count.toLong * sz > bytes.length) return null
      Array.tabulate(count)(k =>
        if (typ == 3) u16(at + 2 * k).toLong else u32(at + 4 * k))
    }
    var t = 0
    var bad = false
    while (!bad && t < nTags) {
      val e = ifd.toInt + 2 + 12 * t
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      if (cnt < 0 || cnt > 65536) bad = true
      else if (typ == 3 || typ == 4) {
        val c = cnt.toInt
        def one(): Long = {
          val v = values(e, typ, 1)
          if (v == null) { bad = true; 0L } else v(0)
        }
        tag match {
          case 256 => w = one().toInt
          case 257 => h = one().toInt
          case 258 =>
            val v = values(e, typ, c)
            if (v == null || v.exists(_ != 8)) bad = true
          case 259 => compression = one().toInt
          case 262 => photometric = one().toInt
          case 273 =>
            stripOffsets = values(e, typ, c)
            if (stripOffsets == null) bad = true
          case 277 => spp = one().toInt
          case 278 => rowsPerStrip = math.min(one(), Int.MaxValue).toInt
          case 279 =>
            stripCounts = values(e, typ, c)
            if (stripCounts == null) bad = true
          case _ => () // orientation, resolution, etc.: ignored
        }
      }
      t += 1
    }
    if (bad || w <= 0 || h <= 0 || w.toLong * h > 16000000L) return None
    if (bps != 8) return None
    if (!(photometric == 1 && spp == 1) && !(photometric == 2 && spp == 3))
      return None
    if (compression != 1 && compression != 32773) return None
    if (stripOffsets == null || stripCounts == null ||
      stripOffsets.length != stripCounts.length) return None
    if (rowsPerStrip <= 0) return None
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    if (stripOffsets.length != nStrips) return None
    val rowBytes = w * spp
    val raster = new Array[Byte](rowBytes * h)
    var s = 0
    while (s < nStrips) {
      val off = stripOffsets(s)
      val len = stripCounts(s)
      if (off < 0 || len < 0 || off + len > bytes.length) return None
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      val want = rows * rowBytes
      val dst = s * rowsPerStrip * rowBytes
      if (compression == 1) {
        if (len != want) return None
        System.arraycopy(bytes, off.toInt, raster, dst, want)
      } else {
        // PackBits: n∈[0,127] copy n+1 literals; n∈[-127,-1] repeat the
        // next byte 1−n times; −128 is a no-op
        var p = off.toInt
        val end = (off + len).toInt
        var q = dst
        val qEnd = dst + want
        while (p < end && q < qEnd) {
          val n = bytes(p)
          p += 1
          if (n >= 0) {
            if (p + n + 1 > end || q + n + 1 > qEnd) return None
            System.arraycopy(bytes, p, raster, q, n + 1)
            p += n + 1
            q += n + 1
          } else if (n != -128) {
            if (p >= end || q + (1 - n) > qEnd) return None
            java.util.Arrays.fill(raster, q, q + 1 - n, bytes(p))
            p += 1
            q += 1 - n
          }
        }
        if (q != qEnd || p != end) return None
      }
      s += 1
    }
    val g = new Array[Int](w * h)
    var i = 0
    while (i < w * h) { g(i) = raster(i * spp) & 0xff; i += 1 }
    Some((w, h, g))
  }

  /** TIFF fixture: gray or RGB (gray-planted channels), either byte
    * order, multi-strip with `rowsPerStrip`, uncompressed or PackBits
    * (runs emitted for repeats ≥ 3, literals otherwise — both branch
    * types appear on any textured plant). */
  private[graft] def makeTiff(w: Int, h: Int, pix: (Int, Int) => Int,
      little: Boolean, rgb: Boolean, rowsPerStrip: Int,
      packBits: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && rowsPerStrip > 0)
    val spp = if (rgb) 3 else 1
    val rowBytes = w * spp
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
      val raw = new Array[Byte](rows * rowBytes)
      var r = 0
      while (r < rows) {
        var x = 0
        while (x < w) {
          val g = (pix(x, s * rowsPerStrip + r) & 0xff).toByte
          var c = 0
          while (c < spp) { raw(r * rowBytes + x * spp + c) = g; c += 1 }
          x += 1
        }
        r += 1
      }
      if (!packBits) raw
      else {
        val out = new java.io.ByteArrayOutputStream()
        var i = 0
        while (i < raw.length) {
          // find a run of ≥3 equal bytes, else emit a literal block
          var run = 1
          while (i + run < raw.length && run < 128 &&
            raw(i + run) == raw(i)) run += 1
          if (run >= 3) {
            out.write(1 - run) // repeat count byte
            out.write(raw(i))
            i += run
          } else {
            var lit = run
            while (i + lit < raw.length && lit < 128 &&
              !(i + lit + 2 < raw.length && raw(i + lit) == raw(i + lit + 1)
                && raw(i + lit) == raw(i + lit + 2))) lit += 1
            out.write(lit - 1)
            out.write(raw, i, lit)
            i += lit
          }
        }
        out.toByteArray
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (little) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (little) {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      } else {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
    out.write(if (little) 'I' else 'M')
    out.write(if (little) 'I' else 'M')
    if (little) { out.write(42); out.write(0) } else { out.write(0); out.write(42) }
    w32(8) // IFD right after the header
    val tags = 9
    val ifdSize = 2 + 12 * tags + 4
    // layout: header(8) + IFD + [BitsPerSample array if rgb] + strips
    val bpsArrayOff = 8 + ifdSize
    val stripsStart = bpsArrayOff + (if (rgb) 6 else 0)
    val stripOffs = strips.scanLeft(stripsStart.toLong)(_ + _.length)
    w16(tags)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) {
        // a SHORT value sits in the value field's FIRST two bytes
        w16(value.toInt); w16(0)
      } else w32(value)
    }
    entry(256, 4, 1, w) // ImageWidth
    entry(257, 4, 1, h) // ImageLength
    if (rgb) entry(258, 3, 3, bpsArrayOff) // BitsPerSample offset-stored
    else entry(258, 3, 1, 8)
    entry(259, 3, 1, if (packBits) 32773 else 1)
    entry(262, 3, 1, if (rgb) 2 else 1)
    if (nStrips == 1) entry(273, 4, 1, stripOffs(0))
    else entry(273, 4, nStrips, -1L) // patched below
    entry(277, 3, 1, spp)
    entry(278, 4, 1, rowsPerStrip)
    if (nStrips == 1) entry(279, 4, 1, strips(0).length)
    else entry(279, 4, nStrips, -1L)
    w32(0) // next IFD
    if (rgb) { w16(8); w16(8); w16(8) }
    // multi-strip offset/count arrays ride AFTER the strips; easier to
    // just re-emit the file when nStrips > 1 with proper offsets
    if (nStrips == 1) {
      strips.foreach(s => out.write(s, 0, s.length))
      out.toByteArray
    } else {
      // second pass: arrays after strips
      val arraysAt = stripOffs.last
      val bytes0 = out.toByteArray
      val fixed = new java.io.ByteArrayOutputStream()
      fixed.write(bytes0, 0, bytes0.length)
      strips.foreach(s => fixed.write(s, 0, s.length))
      // strip offsets array, then counts array
      val offArrAt = arraysAt
      val cntArrAt = arraysAt + 4L * nStrips
      val f = fixed.toByteArray
      def patch32(at: Int, v: Long): Unit = {
        if (little) {
          f(at) = (v & 0xff).toByte; f(at + 1) = ((v >> 8) & 0xff).toByte
          f(at + 2) = ((v >> 16) & 0xff).toByte
          f(at + 3) = ((v >> 24) & 0xff).toByte
        } else {
          f(at) = ((v >> 24) & 0xff).toByte
          f(at + 1) = ((v >> 16) & 0xff).toByte
          f(at + 2) = ((v >> 8) & 0xff).toByte; f(at + 3) = (v & 0xff).toByte
        }
      }
      // entries are at 8 + 2 + 12*k; tag order above: 273 is index 5,
      // 279 is index 8
      patch32(8 + 2 + 12 * 5 + 8, offArrAt)
      patch32(8 + 2 + 12 * 8 + 8, cntArrAt)
      val out2 = new java.io.ByteArrayOutputStream()
      out2.write(f, 0, f.length)
      (0 until nStrips).foreach(s => {
        val bb = java.nio.ByteBuffer.allocate(4)
          .order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN
            else java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(stripOffs(s).toInt)
        out2.write(bb.array(), 0, 4)
      })
      (0 until nStrips).foreach(s => {
        val bb = java.nio.ByteBuffer.allocate(4)
          .order(if (little) java.nio.ByteOrder.LITTLE_ENDIAN
            else java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(strips(s).length)
        out2.write(bb.array(), 0, 4)
      })
      out2.toByteArray
    }
  }

  // ---------------------------------------------------------------------
  // Animated WebP (r14): VP8X + ANIM + ANMF compositing over the
  // existing VP8 (lossy) and VP8L (lossless) frame decoders
  // ---------------------------------------------------------------------

  /** Animated-WebP decode: the VP8X extended container with the
    * animation flag, the ANIM chunk (background color, loop count),
    * and ANMF frame chunks — sub-rectangle frames at even offsets,
    * per-frame millisecond durations, dispose-to-background vs keep,
    * embedded "VP8 " (lossy key-frame subset) or "VP8L" payloads
    * decoded by wrapping them back into standalone containers.
    * Returns (canvas w, h, frames as (duration_ms, full-canvas gray
    * snapshot)). OPAQUE subset: frames with ALPH chunks (and the blend
    * semantics that only matter with alpha) are out of scope → None;
    * the canvas initializes to the ANIM background's blue channel
    * (achromatic fixtures plant equal channels). */
  private[graft] def decodeWebpAnim(bytes: Array[Byte])
      : Option[(Int, Int, Seq[(Int, Array[Int])])] = {
    if (bytes.length < 30 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
      bytes(9) != 'E' || bytes(10) != 'B' || bytes(11) != 'P') return None
    if (new String(bytes, 12, 4, StandardCharsets.US_ASCII) != "VP8X")
      return None
    def u24(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16)
    def u32(o: Int): Long = (bytes(o) & 0xffL) |
      ((bytes(o + 1) & 0xffL) << 8) | ((bytes(o + 2) & 0xffL) << 16) |
      ((bytes(o + 3) & 0xffL) << 24)
    val flags = bytes(20) & 0xff
    if ((flags & 0x02) == 0) return None // not an animation
    val w = u24(24) + 1
    val h = u24(27) + 1
    if (w.toLong * h > 16000000L) return None
    var canvas: Array[Int] = null
    var bgGray = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])]
    var pendingDispose: (Int, Int, Int, Int) = null
    var i = 12
    while (i + 8 <= bytes.length) {
      val four = new String(bytes, i, 4, StandardCharsets.US_ASCII)
      val size = u32(i + 4)
      val data = i + 8
      if (size < 0 || data + size > bytes.length) return None
      four match {
        case "VP8X" => ()
        case "ANIM" =>
          if (size < 6) return None
          // background color rides [B, G, R, A]; achromatic contract
          bgGray = bytes(data) & 0xff
          canvas = Array.fill(w * h)(bgGray)
        case "ANMF" =>
          if (canvas == null || size < 24) return None
          val fx = u24(data) * 2
          val fy = u24(data + 3) * 2
          val fw = u24(data + 6) + 1
          val fh = u24(data + 9) + 1
          val dur = u24(data + 12)
          val fflags = bytes(data + 15) & 0xff
          val disposeBg = (fflags & 1) != 0
          if (fx + fw > w || fy + fh > h) return None
          // embedded frame chunk (ALPH → out of the opaque subset)
          val efour =
            new String(bytes, data + 16, 4, StandardCharsets.US_ASCII)
          if (efour != "VP8 " && efour != "VP8L") return None
          val esize = u32(data + 20)
          if (esize < 0 || data + 24 + esize > data + size) return None
          // rewrap as a standalone file for the single-frame decoders.
          // RIFF size = bytes after the 8-byte RIFF header: "WEBP" (4) +
          // chunk header (8) + payload + pad. Copy only header+payload from
          // the source (the pad byte, if any, stays zero in the fresh
          // buffer) — a final odd-sized chunk may legally omit its pad,
          // so reading it from `bytes` could run past the file.
          val inner = (4 + 8 + esize + (esize & 1)).toInt
          val bb = ByteBuffer.allocate(8 + inner)
            .order(ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
          bb.putInt(inner)
          bb.put("WEBP".getBytes(StandardCharsets.US_ASCII))
          bb.put(bytes, data + 16, (8 + esize).toInt)
          decodeGray(bb.array()) match {
            case None => return None
            case Some((dw, dh, g)) =>
              if (dw != fw || dh != fh) return None
              // previous frame's deferred background dispose
              if (pendingDispose != null) {
                val (pl, pt, pw2, ph2) = pendingDispose
                var y = 0
                while (y < ph2) {
                  var x = 0
                  while (x < pw2) {
                    canvas((pt + y) * w + pl + x) = bgGray; x += 1
                  }
                  y += 1
                }
              }
              var y = 0
              while (y < fh) {
                var x = 0
                while (x < fw) {
                  canvas((fy + y) * w + fx + x) = g(y * fw + x)
                  x += 1
                }
                y += 1
              }
              frames += ((dur, canvas.clone()))
              pendingDispose = if (disposeBg) (fx, fy, fw, fh) else null
          }
        case _ => () // ICCP/EXIF/XMP: skip
      }
      i = data + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    if (frames.isEmpty || i != bytes.length) None
    else Some((w, h, frames.toSeq))
  }

  /** One animation frame for the fixture: an even-aligned position,
    * duration, the dispose-to-background bit, and a COMPLETE
    * single-frame WebP file (lossy or lossless) whose chunk gets
    * embedded. */
  private[graft] final case class WebpAnimFrameSpec(fx: Int, fy: Int,
      durMs: Int, disposeBg: Boolean, file: Array[Byte])

  /** Animated-WebP fixture: VP8X (animation flag, canvas dims), ANIM
    * (achromatic background, infinite loop), and one ANMF per spec
    * embedding the spec's file's own VP8 /VP8L chunk. */
  private[graft] def makeWebpAnimated(w: Int, h: Int, bgGray: Int,
      frames: Seq[WebpAnimFrameSpec]): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty)
    def chunk(four: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(four.getBytes(StandardCharsets.US_ASCII))
      bb.putInt(payload.length)
      bb.put(payload)
      bb.array()
    }
    def u24(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte)
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x02 // animation
    System.arraycopy(u24(w - 1), 0, vp8x, 4, 3)
    System.arraycopy(u24(h - 1), 0, vp8x, 7, 3)
    val anim = new Array[Byte](6)
    anim(0) = bgGray.toByte // B
    anim(1) = bgGray.toByte // G
    anim(2) = bgGray.toByte // R
    anim(3) = 0xff.toByte // A (opaque)
    val body = new java.io.ByteArrayOutputStream()
    body.write(chunk("VP8X", vp8x))
    body.write(chunk("ANIM", anim))
    frames.foreach { f =>
      require(f.fx % 2 == 0 && f.fy % 2 == 0, "ANMF offsets are 2px units")
      // the embedded chunk starts at byte 12 of the standalone file
      val innerSize = ((f.file(16) & 0xff) | ((f.file(17) & 0xff) << 8) |
        ((f.file(18) & 0xff) << 16) | ((f.file(19) & 0xff) << 24))
      val embedded = java.util.Arrays.copyOfRange(f.file, 12,
        12 + 8 + innerSize + (innerSize & 1))
      val (_, fw, fh, _) = decodeMeta(f.file)
      val payload = new java.io.ByteArrayOutputStream()
      payload.write(u24(f.fx / 2), 0, 3)
      payload.write(u24(f.fy / 2), 0, 3)
      payload.write(u24(fw - 1), 0, 3)
      payload.write(u24(fh - 1), 0, 3)
      payload.write(u24(f.durMs), 0, 3)
      payload.write(if (f.disposeBg) 0x01 else 0x00)
      payload.write(embedded, 0, embedded.length)
      body.write(chunk("ANMF", payload.toByteArray))
    }
    val b = body.toByteArray
    val out = ByteBuffer.allocate(12 + b.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    out.putInt(4 + b.length)
    out.put("WEBP".getBytes(StandardCharsets.US_ASCII))
    out.put(b)
    out.array()
  }

  /** One composited animation frame: the FULL-CANVAS grayscale
    * snapshot after the frame renders, plus its GCE timing/disposal. */
  private[graft] final case class GifFrame(delayCs: Int, disposal: Int,
      gray: Array[Int])

  /** ANIMATED GIF decode (r14 — the 2D-animation analog of the IVF
    * video stream surface): full GIF89a multi-frame walk with Graphic
    * Control Extensions (delay, disposal methods 0–3 incl.
    * restore-to-background and restore-to-previous, transparency
    * index), sub-rectangle frames composited onto the logical-screen
    * canvas, per-frame local color tables, per-frame interlacing, and
    * the trailer check. The canvas initializes to the background
    * index's global-palette gray (the spec reading; browsers differ by
    * treating it as transparent — documented, deterministic here).
    * Returns full-canvas snapshots per frame. Poison contract as the
    * rest of the codec surface: malformed anywhere → None. */
  private[graft] def decodeGifFrames(bytes: Array[Byte])
      : Option[(Int, Int, Seq[GifFrame])] = {
    if (bytes.length < 14) return None
    val magic = new String(bytes, 0, 6, StandardCharsets.US_ASCII)
    if (magic != "GIF87a" && magic != "GIF89a") return None
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val w = u16(6)
    val h = u16(8)
    if (w <= 0 || h <= 0 || w.toLong * h > 16000000L) return None
    val packed = bytes(10) & 0xff
    val bgIdx = bytes(11) & 0xff
    var gct = -1
    var gctSize = 0
    var i = 13
    if ((packed & 0x80) != 0) {
      gct = 13
      gctSize = 2 << (packed & 7)
      // a header can advertise a GCT larger than the remaining file —
      // malformed-anywhere returns None, never throws
      if (13 + 3 * gctSize > bytes.length) return None
      i += 3 * gctSize
    }
    val bgGray =
      if (gct >= 0 && bgIdx < gctSize) bytes(gct + 3 * bgIdx) & 0xff else 0
    val canvas = Array.fill(w * h)(bgGray)
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifFrame]
    // pending GCE state (applies to the next image descriptor only)
    var delayCs = 0
    var disposal = 0
    var transIdx = -1
    // previous frame's restore info
    var prevDisposal = 0
    var prevRect = (0, 0, 0, 0)
    var prevSnapshot: Array[Int] = null
    while (i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x3b => // trailer
          return if (frames.isEmpty) None else Some((w, h, frames.toSeq))
        case 0x21 => // extension
          if (i + 1 >= bytes.length) return None
          val label = bytes(i + 1) & 0xff
          if (label == 0xf9) { // Graphic Control Extension
            if (i + 7 >= bytes.length || (bytes(i + 2) & 0xff) != 4)
              return None
            val gp = bytes(i + 3) & 0xff
            disposal = (gp >> 2) & 7
            if (disposal > 3) return None
            delayCs = u16(i + 4)
            transIdx = if ((gp & 1) != 0) bytes(i + 6) & 0xff else -1
            if ((bytes(i + 7) & 0xff) != 0) return None
            i += 8
          } else { // application/comment/plain-text: skip sub-blocks
            i += 2
            while (i < bytes.length && (bytes(i) & 0xff) != 0)
              i += 1 + (bytes(i) & 0xff)
            if (i >= bytes.length) return None
            i += 1
          }
        case 0x2c => // image descriptor
          if (i + 10 > bytes.length) return None
          val (left, top, fw, fh) =
            (u16(i + 1), u16(i + 3), u16(i + 5), u16(i + 7))
          if (fw <= 0 || fh <= 0 || left + fw > w || top + fh > h)
            return None
          val ipacked = bytes(i + 9) & 0xff
          i += 10
          var pal = gct
          var palSize = gctSize
          if ((ipacked & 0x80) != 0) {
            pal = i
            palSize = 2 << (ipacked & 7)
            i += 3 * palSize
          }
          if (pal < 0 || pal + 3 * palSize > bytes.length ||
            i >= bytes.length) return None
          val interlaced = (ipacked & 0x40) != 0
          val minCode = bytes(i) & 0xff
          i += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          var ok = true
          while (ok && i < bytes.length && (bytes(i) & 0xff) != 0) {
            val len = bytes(i) & 0xff
            if (i + 1 + len > bytes.length) ok = false
            else { data.write(bytes, i + 1, len); i += 1 + len }
          }
          if (!ok || i >= bytes.length) return None
          i += 1 // sub-block terminator
          // dispose of the PREVIOUS frame before rendering this one
          prevDisposal match {
            case 2 =>
              val (pl, pt, pw2, ph2) = prevRect
              var y = 0
              while (y < ph2) {
                var x = 0
                while (x < pw2) {
                  canvas((pt + y) * w + pl + x) = bgGray; x += 1
                }
                y += 1
              }
            case 3 =>
              if (prevSnapshot != null)
                System.arraycopy(prevSnapshot, 0, canvas, 0, w * h)
            case _ => ()
          }
          val preRender =
            if (disposal == 3) canvas.clone() else null
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val order = new Array[Int](fh)
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                  y <- start until fh by step) { order(r) = y; r += 1 }
              order
            }
          gifLzwDecode(data.toByteArray, minCode, fw * fh) match {
            case None => return None
            case Some(idx) =>
              var k = 0
              while (k < idx.length) {
                val v = idx(k)
                if (v >= palSize) return None
                if (v != transIdx) {
                  canvas((top + rowOf(k / fw)) * w + left + k % fw) =
                    bytes(pal + 3 * v) & 0xff
                }
                k += 1
              }
          }
          frames += GifFrame(delayCs, disposal, canvas.clone())
          prevDisposal = disposal
          prevRect = (left, top, fw, fh)
          prevSnapshot = preRender
          delayCs = 0
          disposal = 0
          transIdx = -1
        case _ => return None
      }
    }
    None // no trailer
  }

  /** Per-frame directive for the animated-GIF fixture encoder: a
    * sub-rectangle, GCE fields, an optional local palette (grayscale
    * shifted by `palShift`; −1 = use the global identity palette),
    * optional interlacing, and the palette-index plant over LOCAL
    * coordinates. */
  private[graft] final case class GifAnimFrameSpec(left: Int, top: Int,
      fw: Int, fh: Int, delayCs: Int, disposal: Int,
      transIdx: Int = -1, palShift: Int = -1, interlaced: Boolean = false,
      idxOf: (Int, Int) => Int)

  /** Animated-GIF fixture: GIF89a, 256-entry grayscale identity GCT,
    * background index 0, one GCE + image descriptor per spec, local
    * palettes as shifted-gray ((i + palShift) & 0xff), and the naive
    * clear-per-pixel LZW coding (spec-valid; dictionary growth is
    * covered by the JDK-writer cross-test). */
  private[graft] def makeGifAnimated(w: Int, h: Int,
      frames: Seq[GifAnimFrameSpec]): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(StandardCharsets.US_ASCII))
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0xf7) // GCT present, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect
    var ci = 0
    while (ci < 256) { out.write(ci); out.write(ci); out.write(ci); ci += 1 }
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.fw > 0 && f.fh > 0 &&
        f.left + f.fw <= w && f.top + f.fh <= h, "frame rect out of canvas")
      require(f.disposal >= 0 && f.disposal <= 3)
      // GCE
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transIdx >= 0) 1 else 0))
      out.write(f.delayCs & 0xff); out.write((f.delayCs >> 8) & 0xff)
      out.write(if (f.transIdx >= 0) f.transIdx else 0)
      out.write(0)
      // image descriptor
      out.write(0x2c)
      out.write(f.left & 0xff); out.write((f.left >> 8) & 0xff)
      out.write(f.top & 0xff); out.write((f.top >> 8) & 0xff)
      out.write(f.fw & 0xff); out.write((f.fw >> 8) & 0xff)
      out.write(f.fh & 0xff); out.write((f.fh >> 8) & 0xff)
      if (f.palShift < 0) out.write(if (f.interlaced) 0x40 else 0x00)
      else {
        out.write(0x87 | (if (f.interlaced) 0x40 else 0x00)) // LCT, 256
        var k = 0
        while (k < 256) {
          val g = (k + f.palShift) & 0xff
          out.write(g); out.write(g); out.write(g)
          k += 1
        }
      }
      out.write(8) // LZW minimum code size
      // naive clear-per-pixel 9-bit stream, LSB-first (stream order is
      // interlace-permuted when the frame is interlaced)
      val codes = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nbits = 0
      def putCode(c: Int): Unit = {
        acc |= c.toLong << nbits
        nbits += 9
        while (nbits >= 8) {
          codes.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8
        }
      }
      val rows: Seq[Int] =
        if (!f.interlaced) 0 until f.fh
        else Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap {
          case (s, st) => s until f.fh by st
        }
      rows.foreach { y =>
        var x = 0
        while (x < f.fw) {
          putCode(256)
          putCode(f.idxOf(x, y) & 0xff)
          x += 1
        }
      }
      putCode(257) // end of information
      if (nbits > 0) codes.write((acc & 0xff).toInt)
      val cb = codes.toByteArray
      var off = 0
      while (off < cb.length) {
        val n = math.min(255, cb.length - off)
        out.write(n)
        out.write(cb, off, n)
        off += n
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private[graft] def decodeGifGray(bytes: Array[Byte], w: Int,
      h: Int): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 14) return None
    val packed = bytes(10) & 0xff
    var pal = -1 // palette byte offset
    var palSize = 0
    var i = 13
    if ((packed & 0x80) != 0) {
      pal = 13
      palSize = 2 << (packed & 7)
      i += 3 * palSize
    }
    // block walk to the first image descriptor
    while (i < bytes.length && (bytes(i) & 0xff) == 0x21) {
      i += 2 // extension introducer + label
      while (i < bytes.length && (bytes(i) & 0xff) != 0) i += 1 + (bytes(i) & 0xff)
      i += 1 // sub-block terminator
    }
    if (i + 10 > bytes.length || (bytes(i) & 0xff) != 0x2c) return None
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val (left, top, fw, fh) = (u16(i + 1), u16(i + 3), u16(i + 5), u16(i + 7))
    val ipacked = bytes(i + 9) & 0xff
    i += 10
    if ((ipacked & 0x80) != 0) { // local palette overrides
      pal = i
      palSize = 2 << (ipacked & 7)
      i += 3 * palSize
    }
    val interlaced = (ipacked & 0x40) != 0
    if (left != 0 || top != 0 || fw != w || fh != h ||
      pal < 0 || pal + 3 * palSize > bytes.length ||
      i >= bytes.length) return None
    val minCode = bytes(i) & 0xff
    i += 1
    if (minCode < 2 || minCode > 8) return None
    // concatenate the data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (i < bytes.length && (bytes(i) & 0xff) != 0) {
      val len = bytes(i) & 0xff
      if (i + 1 + len > bytes.length) return None
      data.write(bytes, i + 1, len)
      i += 1 + len
    }
    // stream row r → image row y: identity, or the 4-pass interlace walk
    val rowOf: Int => Int =
      if (!interlaced) identity
      else {
        val order = new Array[Int](h)
        var r = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
            y <- start until h by step) { order(r) = y; r += 1 }
        order
      }
    gifLzwDecode(data.toByteArray, minCode, w * h).flatMap { idx =>
      val g = new Array[Int](w * h)
      var k = 0
      while (k < idx.length) {
        if (idx(k) >= palSize) return None
        g(rowOf(k / w) * w + k % w) = bytes(pal + 3 * idx(k)) & 0xff
        k += 1
      }
      Some((w, h, g))
    }
  }

  /** GIF-variant LZW: initial code width minCode+1 (grows to 12),
    * clear = 2^minCode resets the dictionary, end = clear+1 terminates;
    * dictionary entries are (prefix code, appended root) pairs expanded
    * by walking the prefix chain; the just-defined-code case (code ==
    * next free slot) appends the previous expansion's first symbol. A
    * full dictionary that receives no clear keeps serving existing codes
    * (the deferred-clear quirk). Returns exactly `nPixels` palette
    * indices or None on any corruption. */
  private[graft] def gifLzwDecode(data: Array[Byte], minCode: Int,
      nPixels: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = end + 1
    var codeSize = minCode + 1
    val out = new Array[Int](nPixels)
    var outPos = 0
    var bitPos = 0
    val totalBits = data.length * 8
    val stack = new Array[Int](4097)
    var prev = -1
    while (outPos < nPixels) {
      if (bitPos + codeSize > totalBits) return None
      var code = 0
      var b = 0
      while (b < codeSize) {
        code |= ((data((bitPos + b) >> 3) >> ((bitPos + b) & 7)) & 1) << b
        b += 1
      }
      bitPos += codeSize
      if (code == clear) { dictSize = end + 1; codeSize = minCode + 1; prev = -1 }
      else if (code == end) return None // early end: pixels missing
      else if (code > dictSize || (prev < 0 && code >= clear)) return None
      else {
        var sp = 0
        var cur = code
        val kCase = code == dictSize
        if (kCase) {
          if (prev < 0) return None
          sp = 1 // slot 0 filled with the first symbol below (emitted last)
          cur = prev
        }
        while (cur > end) {
          if (sp >= 4096) return None
          stack(sp) = suffix(cur); sp += 1; cur = prefix(cur)
        }
        if (cur >= clear) return None // chain must bottom out at a root
        stack(sp) = cur; sp += 1
        if (kCase) stack(0) = cur
        while (sp > 0) {
          sp -= 1
          if (outPos >= nPixels) return None
          out(outPos) = stack(sp); outPos += 1
        }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = cur
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  // ---------------------------------------------------------------------
  // WebP VP8L (lossless) pixel decode
  // ---------------------------------------------------------------------

  /** Shared sentinel for any structural violation inside the VP8L parse —
    * caught at the [[decodeVp8lGray]] boundary and mapped to None (the
    * poison-blob contract). Stackless: parse failure is a data condition,
    * not an error path worth a stack capture per blob. */
  private object Vp8lMalformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** LSB-first bit reader over a byte range, per the VP8L spec's bit
    * order (bit i of an n-bit read is stream bit i). Reading past the
    * chunk end throws [[Vp8lMalformed]]. */
  private final class Vp8lReader(buf: Array[Byte], from: Int, until: Int) {
    private var bit: Long = from.toLong * 8
    private val end: Long = until.toLong * 8
    def bits(n: Int): Int = {
      if (n == 0) return 0
      if (bit + n > end) throw Vp8lMalformed
      var v = 0
      var i = 0
      while (i < n) {
        val p = bit + i
        v |= ((buf((p >> 3).toInt) >> (p & 7).toInt) & 1) << i
        i += 1
      }
      bit += n
      v
    }
  }

  /** Canonical prefix-code decoder built from code lengths (deflate-style
    * canonical assignment: codes increase with (length, symbol) order;
    * stream bits traverse root→leaf, i.e. MSB of the canonical code
    * first). Exactly one nonzero length ⇒ the spec's degenerate 0-bit
    * code. Otherwise the length multiset must satisfy Kraft EXACTLY —
    * over- or under-subscribed codes are malformed (an incomplete tree
    * would make some bit sequences undecodable, and a conforming encoder
    * never emits one). */
  private final class Vp8lTree private (singleLeaf: Int, child: Array[Int]) {
    def read(r: Vp8lReader): Int = {
      if (singleLeaf >= 0) return singleLeaf
      var node = 0
      while (true) {
        val v = child(2 * node + r.bits(1))
        if (v < 0) return -v - 1
        if (v == 0) throw Vp8lMalformed
        node = v
      }
      -1 // unreachable
    }
  }

  private object Vp8lTree {
    /** The spec's degenerate 1-symbol code: reads consume 0 bits. */
    def single(sym: Int): Vp8lTree = new Vp8lTree(sym, null)

    /** The simple 2-symbol form: code 0 is the FIRST transmitted symbol
      * (spec order — NOT canonical-by-index, which would differ when
      * s0 > s1). */
    def pair(s0: Int, s1: Int): Vp8lTree =
      new Vp8lTree(-1, Array(-(s0 + 1), -(s1 + 1)))

    /** Canonical code from lengths (deflate-style: codes increase with
      * (length, symbol) order; stream bits traverse root→leaf, MSB of
      * the canonical code first). Exactly one nonzero length ⇒ the
      * degenerate 0-bit code. Otherwise the multiset must satisfy Kraft
      * EXACTLY — over- or under-subscribed codes are malformed. */
    def fromLengths(lens: Array[Int]): Vp8lTree = {
      var nz = -1
      var nLeaves = 0
      var i = 0
      while (i < lens.length) {
        if (lens(i) > 0) { nz = i; nLeaves += 1 }
        if (lens(i) > 15) throw Vp8lMalformed
        i += 1
      }
      if (nLeaves == 0) throw Vp8lMalformed
      if (nLeaves == 1) return single(nz)
      val maxLen = lens.max
      val cnt = new Array[Int](maxLen + 1)
      lens.foreach(l => if (l > 0) cnt(l) += 1)
      var kraft = 0L
      var l = 1
      while (l <= maxLen) { kraft += cnt(l).toLong << (maxLen - l); l += 1 }
      if (kraft != (1L << maxLen)) throw Vp8lMalformed
      val nextCode = new Array[Int](maxLen + 1)
      var code = 0
      l = 1
      while (l <= maxLen) {
        code = (code + cnt(l - 1)) << 1
        nextCode(l) = code
        l += 1
      }
      // flat tree: node k has children at arr(2k)/arr(2k+1);
      // 0 = unassigned, >0 = internal node index, <0 = -(symbol+1)
      val arr = new Array[Int](4 * nLeaves) // ≤ 2·leaves−1 nodes
      var nNodes = 1
      var sym = 0
      while (sym < lens.length) {
        val len = lens(sym)
        if (len > 0) {
          val c = nextCode(len)
          nextCode(len) += 1
          var node = 0
          var b = len - 1
          while (b > 0) {
            val idx = 2 * node + ((c >> b) & 1)
            if (arr(idx) < 0) throw Vp8lMalformed
            if (arr(idx) == 0) { arr(idx) = nNodes; nNodes += 1 }
            node = arr(idx)
            b -= 1
          }
          val idx = 2 * node + (c & 1)
          if (arr(idx) != 0) throw Vp8lMalformed
          arr(idx) = -(sym + 1)
        }
        sym += 1
      }
      new Vp8lTree(-1, arr)
    }
  }

  /** kCodeLengthCodeOrder from the VP8L spec: the transmission order of
    * the code-length code's own 3-bit lengths. */
  private val Vp8lClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code per the spec: the 1-bit simple form (1–2 symbols) or
    * the normal form (a code-length code over the 19-symbol alphabet with
    * 16/17/18 repeats and the optional max_symbol cap). */
  private def readVp8lCode(r: Vp8lReader, alphabet: Int): Vp8lTree = {
    if (r.bits(1) == 1) { // simple
      val numSym = r.bits(1) + 1
      val first8 = r.bits(1)
      val s0 = r.bits(if (first8 == 1) 8 else 1)
      if (s0 >= alphabet) throw Vp8lMalformed
      if (numSym == 1) Vp8lTree.single(s0)
      else {
        val s1 = r.bits(8)
        if (s1 >= alphabet || s1 == s0) throw Vp8lMalformed
        Vp8lTree.pair(s0, s1)
      }
    } else { // normal
      val numCl = 4 + r.bits(4)
      if (numCl > Vp8lClOrder.length) throw Vp8lMalformed
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(Vp8lClOrder(i)) = r.bits(3); i += 1 }
      val clTree = Vp8lTree.fromLengths(clLens)
      val maxSymbolCap =
        if (r.bits(1) == 1) {
          val nbits = 2 + 2 * r.bits(3)
          val ms = 2 + r.bits(nbits)
          if (ms > alphabet) alphabet else ms
        } else alphabet
      val lens = new Array[Int](alphabet)
      var sym = 0
      var prev = 8
      var budget = maxSymbolCap
      while (sym < alphabet && budget > 0) {
        budget -= 1
        val c = clTree.read(r)
        if (c < 16) {
          lens(sym) = c; sym += 1
          if (c != 0) prev = c
        } else {
          val (rep, rl) = c match {
            case 16 => (3 + r.bits(2), prev)
            case 17 => (3 + r.bits(3), 0)
            case _  => (11 + r.bits(7), 0)
          }
          if (sym + rep > alphabet) throw Vp8lMalformed
          var k = 0
          while (k < rep) { lens(sym) = rl; sym += 1; k += 1 }
        }
      }
      Vp8lTree.fromLengths(lens)
    }
  }

  /** WebP VP8L (lossless) grayscale pixel decode — closing the r10
    * codec-scope gap: lossless WebP is a bounded public bitstream (like
    * GIF's LZW was), so its payloads get REAL near-dup treatment instead
    * of stopping at the header. Implemented subset, chosen so every
    * in-scope stream decodes exactly and everything else returns None
    * (never a wrong pixel):
    *   - full canonical prefix-code machinery: simple (1–2 symbol) and
    *     normal codes, the 19-symbol code-length code, 16/17/18 repeats,
    *     the max_symbol cap, degenerate 0-bit single-symbol codes;
    *   - color cache (any 1–11 bit size, 0x1e35a7bd multiplicative hash);
    *   - the subtract-green transform (inverted after decode);
    *   - LZ77 back-references with the shared length/distance prefix
    *     scheme; PLAIN distances only (code > 120) — the spec's 120-code
    *     2D neighborhood map, the predictor/color/color-indexing
    *     transforms, and meta-prefix (entropy-image) tiling are OUTSIDE
    *     the subset and return None. Lossy VP8/VP8X stays header-only
    *     ([[webpMeta]]): its payload is arithmetic-coded, the same codec
    *     boundary as JPEG.
    * Achromatic contract as the other color formats: gray = the red
    * channel (planted pixels write equal channels). Poison-blob contract:
    * any structural violation → None, never a crash. */
  private[graft] def decodeVp8lGray(bytes: Array[Byte])
      : Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 25 || bytes(12) != 'V' || bytes(13) != 'P' ||
      bytes(14) != '8' || bytes(15) != 'L') return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val csize = bb.getInt(16)
      if (csize < 5) return None
      val until = math.min(bytes.length.toLong, 20L + csize).toInt
      val r = new Vp8lReader(bytes, 20, until)
      if (r.bits(8) != 0x2f) return None
      val w = r.bits(14) + 1
      val h = r.bits(14) + 1
      r.bits(1) // alpha-is-used hint
      if (r.bits(3) != 0) return None // only version 0 exists
      var subGreen = false
      var more = r.bits(1)
      while (more == 1) {
        r.bits(2) match {
          case 2 =>
            if (subGreen) return None // each transform at most once
            subGreen = true
          case _ => return None // predictor/color/color-indexing: subset
        }
        more = r.bits(1)
      }
      val cacheBits =
        if (r.bits(1) == 1) {
          val cb = r.bits(4)
          if (cb < 1 || cb > 11) return None
          cb
        } else 0
      val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
      if (r.bits(1) == 1) return None // meta prefix codes: subset
      val green = readVp8lCode(r, 256 + 24 + cacheSize)
      val red = readVp8lCode(r, 256)
      val blue = readVp8lCode(r, 256)
      val alpha = readVp8lCode(r, 256)
      val dist = readVp8lCode(r, 40)
      val n = w * h
      if (n <= 0 || n > (1 << 26)) return None
      val rCh = new Array[Int](n)
      val gCh = new Array[Int](n)
      val bCh = new Array[Int](n)
      val aCh = new Array[Int](n)
      val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
      def insertCache(pos: Int): Unit = if (cache != null) {
        val argb = (aCh(pos) << 24) | (rCh(pos) << 16) |
          (gCh(pos) << 8) | bCh(pos)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
      }
      def lz77Value(code: Int): Int =
        if (code < 4) code + 1
        else {
          val extra = (code - 2) >> 1
          ((2 + (code & 1)) << extra) + r.bits(extra) + 1
        }
      var pos = 0
      while (pos < n) {
        val s = green.read(r)
        if (s < 256) { // literal: green, then red, blue, alpha
          gCh(pos) = s
          rCh(pos) = red.read(r)
          bCh(pos) = blue.read(r)
          aCh(pos) = alpha.read(r)
          insertCache(pos)
          pos += 1
        } else if (s < 280) { // LZ77 back-reference
          val length = lz77Value(s - 256)
          val dcode = lz77Value(dist.read(r))
          if (dcode <= 120) return None // 2D neighborhood map: subset
          val d = dcode - 120
          if (d > pos || pos + length > n) return None
          var k = 0
          while (k < length) {
            rCh(pos) = rCh(pos - d); gCh(pos) = gCh(pos - d)
            bCh(pos) = bCh(pos - d); aCh(pos) = aCh(pos - d)
            insertCache(pos)
            pos += 1; k += 1
          }
        } else { // color-cache hit
          val idx = s - 280
          if (cache == null || idx >= cacheSize) return None
          val argb = cache(idx)
          aCh(pos) = (argb >>> 24) & 0xff
          rCh(pos) = (argb >>> 16) & 0xff
          gCh(pos) = (argb >>> 8) & 0xff
          bCh(pos) = argb & 0xff
          pos += 1
        }
      }
      val g = new Array[Int](n)
      var i = 0
      while (i < n) {
        g(i) = if (subGreen) (rCh(i) + gCh(i)) & 0xff else rCh(i)
        i += 1
      }
      Some((w, h, g))
    } catch {
      case e: RuntimeException if e eq Vp8lMalformed => None
    }
  }

  /** 64-bit dHash over a 9×8 nearest-neighbor sample grid: row gy samples
    * gray at (gx·w div 9, gy·h div 8); bit gy·8+gx is 1 iff the right
    * neighbor sample is brighter. Integer-exact (no resample filter), so
    * the oracle reproduces it from the planted formula. Halves keep all
    * 64 bits out of the sign position. */
  private[graft] def dHashHalves(w: Int, h: Int, g: Array[Int]): (Long, Long) = {
    var lo = 0L
    var hi = 0L
    var gy = 0
    while (gy < 8) {
      val sy = gy * h / 8
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 9
        val x1 = (gx + 1) * w / 9
        if (g(sy * w + x1) > g(sy * w + x0)) {
          val bit = gy * 8 + gx
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
        gx += 1
      }
      gy += 1
    }
    (lo, hi)
  }

  /** Batch dHash extraction: decode → sample → 64 bits, map-only over
    * partitions (the [[extractFeatures]] shape). Undecodable payloads
    * (malformed, or formats without raster data) drop — no hash, no
    * false near-dup. */
  def imageDHash(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.flatMap { row =>
        decodeGray(row.payload).map { case (w, h, g) =>
          val (lo, hi) = dHashHalves(w, h, g)
          ImageHash(row.doc_id, lo, hi)
        }
      }
    }.toDF()
  }

  /** Image near-dup counts over (ph_lo, ph_hi): the 64 bits split into
    * maxHamming+1 disjoint blocks — any pair within maxHamming collides
    * on ≥1 whole block by pigeonhole (recall 1), so candidates are an
    * equi join on (block, value) and only candidates pay the exact
    * bit_count verification. The image twin of Neutral.simHashNearDups:
    * banded, never all-pairs; blocks must align with the 32-bit halves.
    * At 100 TB true-dup cliques concentrate buckets, so the degree output
    * defaults to the star-capped edge set too (r16 — the r15 sf1 sweep
    * measured full enumeration at rows exponent ~2.0 on a dominant-class
    * corpus): `n_near` is the EXACT near-dup degree whenever no (t,
    * bucket) exceeds `starCap` (all driver-oracle scales), and degrades
    * to the hub-verified lower bound when one does — every member of a
    * genuine oversized duplicate class keeps its rep edge, so the
    * has-near-dup signal (n_near > 0) survives; only the exact count of
    * an over-cap clique is traded. Exact degree at any scale is opt-in
    * via starCap = None. */
  def phashNearDups(hashes: DataFrame, maxHamming: Int = 7,
      starCap: Option[Int] = Some(256)): DataFrame = {
    val pairs = phashPairs(hashes, maxHamming, starCap)
    hashes.join(
        pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_near")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_near"))
      .select("doc_id", "ph_lo", "ph_hi", "n_near")
  }

  /** Verified near-dup pairs (doc_a < doc_b) via the banded candidate
    * join + exact bit_count Hamming check — shared by the count and
    * survivor forms, and exposed for cross-modal compositions
    * ([[jointDedupSurvivors]]). `starCap` (closure consumers) switches
    * oversized buckets to hub-verified star candidates — see
    * [[phashPairs]]; identical components on a genuine duplicate class
    * (ScaleSpec), O(n) instead of O(n²) bucket cost. Pair-COUNT
    * consumers ([[phashNearDups]]) share the default cap since r16:
    * below the cap the degree is exact, above it the count of an
    * over-cap clique degrades to the hub-verified lower bound. */
  def phashPairsOf(hashes: DataFrame, maxHamming: Int = 7,
      starCap: Option[Int] = None): DataFrame =
    phashPairs(hashes, maxHamming, starCap)

  /** Joint multimodal dedup (the paired-corpus shape: every document
    * carries both text and an image, and a pair is a duplicate when
    * EITHER modality matches — re-uploads crop/re-encode images, mirrors
    * rewrite captions): union the text near-dup pairs with the image
    * near-dup pairs, close transitively, keep ONE survivor (min doc_id)
    * per component. Each modality contributes only its own banded pairs
    * (no new all-pairs anywhere); the closure is the same pointer-jumping
    * components every dedup family shares. */
  def jointDedupSurvivors(textPairs: DataFrame, imagePairs: DataFrame,
      docs: DataFrame): DataFrame = {
    val edges = textPairs.select("doc_a", "doc_b")
      .unionByName(imagePairs.select("doc_a", "doc_b"))
      .distinct()
    val dropped = Dedup.connectedComponents(edges)
      .filter(col("doc_id") =!= col("component"))
      .select("doc_id")
    docs.select("doc_id").join(dropped, Seq("doc_id"), "left_anti")
  }

  private def phashPairs(hashes: DataFrame, maxHamming: Int,
      starCap: Option[Int] = None): DataFrame = {
    val tables = maxHamming + 1
    val width = 64 / tables
    require(tables >= 2 && 64 % tables == 0 && 32 % width == 0,
      "maxHamming+1 must be a power of two >= 2 (blocks align with halves)")
    val mask = (1L << width) - 1
    val buckets = (0 until tables).map { t =>
      val bitpos = t * width
      val half = if (bitpos < 32) col("ph_lo") else col("ph_hi")
      shiftright(half, bitpos % 32).bitwiseAND(lit(mask))
    }
    val bucketed0 = hashes.select(col("doc_id"), col("ph_lo"), col("ph_hi"),
      posexplode(array(buckets: _*)).as(Seq("t", "bucket")))
    // r15 scale fix (measured: the sf1 sweep put this family at rows
    // exponent ~2.0 — 1.7G+ shuffle rows — because a boilerplate-shaped
    // corpus concentrates a LINEAR share of docs per (t, bucket)): with
    // starCap set, oversized buckets emit hub-verified STAR candidates
    // (bucket-min rep → member, O(size)) instead of all pairs (O(size²)).
    // The final bit_count filter verifies star rows exactly like pairs.
    // Both windows reuse the (t, bucket) shuffle partitioning.
    val (bucketed, star) = starCap match {
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("t", "bucket")
        val sized = bucketed0
          .withColumn("bsize", count(lit(1)).over(w))
          .withColumn("rep", min(col("doc_id")).over(w))
        val small = sized.filter(col("bsize") <= cap)
          .select("t", "bucket", "doc_id", "ph_lo", "ph_hi")
        // rep = min(doc_id), so doc_a < doc_b is already canonical; the
        // rep's own hash rides back in via a narrow self-join on doc_id
        val starRaw = sized.filter(col("bsize") > cap &&
            col("doc_id") =!= col("rep"))
          .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"),
            col("ph_lo").as("lo_b"), col("ph_hi").as("hi_b"))
          .join(hashes.select(col("doc_id").as("doc_a"),
            col("ph_lo").as("lo_a"), col("ph_hi").as("hi_a")), Seq("doc_a"))
          .select("doc_a", "doc_b", "lo_a", "hi_a", "lo_b", "hi_b")
        (small, starRaw)
      case None => (bucketed0, null)
    }
    val a = bucketed.select(col("t"), col("bucket"),
      col("doc_id").as("doc_a"), col("ph_lo").as("lo_a"), col("ph_hi").as("hi_a"))
    val b = bucketed.select(col("t"), col("bucket"),
      col("doc_id").as("doc_b"), col("ph_lo").as("lo_b"), col("ph_hi").as("hi_b"))
    val cand0 = a.join(b, Seq("t", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "lo_a", "hi_a", "lo_b", "hi_b")
    val cand = if (star == null) cand0 else cand0.unionByName(star)
    cand
      .filter((bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b")))) <= maxHamming)
      .select("doc_a", "doc_b")
      .distinct()
  }

  // ---------------------------------------------------------------------
  // Audio fingerprint (energy-difference sign bits) + banded near-dup
  // ---------------------------------------------------------------------

  /** Fingerprint geometry: 64 windows × 32 samples = 2048 PCM samples
    * per clip; 63 sign bits (E(w+1) > E(w)) — the single-band integer
    * skeleton of Haitsma & Kalker 2002 ("A Highly Robust Audio
    * Fingerprinting System"), whose bits are the signs of band-energy
    * differences; one band keeps the whole fingerprint integer-exact so
    * the DuckDB oracle reproduces it from the planted waveform. */
  private[graft] val AfWindows = 64
  private[graft] val AfWinLen = 32

  /** Planted 16-bit PCM sample t of clip `id` — the oracle's ground
    * truth, recovered by Spark from the encoded WAV bytes. The quadratic
    * base waveform depends only on the pattern class pid = id % 8 (same
    * pid ⇒ same audio), while the sparse id-dependent perturbation
    * (~1/97 of samples, +7) nudges window energies enough to flip the
    * occasional close-race sign bit — same-pid clips land at SMALL
    * Hamming distances, different-pid clips at unrelated fingerprints. */
  private[graft] def texturedSample(id: Long, t: Int): Int = {
    val pid = (id % 8).toInt
    val base = (t * t * 3 + t * (pid + 1) * 7 + pid * 13) % 2048 - 1024
    if ((t + id) % 97 == 0) base + 7 else base
  }

  /** A complete, valid 16-bit PCM mono WAV (spec-exact 44-byte header,
    * 8 kHz) carrying the planted waveform of `id`. */
  private[graft] def makeTexturedWav(id: Long): Array[Byte] = {
    val n = AfWindows * AfWinLen
    val bb = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(36 + 2 * n)
    bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(16)
    bb.putShort(1)          // PCM
    bb.putShort(1)          // mono
    bb.putInt(8000)
    bb.putInt(8000 * 2)     // byte rate
    bb.putShort(2)          // block align
    bb.putShort(16)         // bits per sample
    bb.put("data".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(2 * n)
    var t = 0
    while (t < n) { bb.putShort(texturedSample(id, t).toShort); t += 1 }
    bb.array()
  }

  /** Documents → textured audio table: REAL encoded WAV clips with
    * planted waveforms — the fixture corpus for the audio-fingerprint
    * dedup path (the audio twin of [[syntheticTexturedImageTable]]). */
  def syntheticTexturedAudioTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) => MediaRow(id, makeTexturedWav(id), src) }
      .toDF()
  }

  /** First-channel 16-bit PCM decode: the RIFF chunk walk of
    * [[wavMeta]], then little-endian int16 samples from the data chunk
    * (stride = channels). Poison-blob contract: non-WAV, non-PCM,
    * non-16-bit, or truncated payloads return None, never a crash. */
  private[graft] def decodePcm(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 12 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
      bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var fmtCode = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= bytes.length) {
      val size = bb.getInt(i + 4).toLong & 0xffffffffL
      val tag = new String(bytes, i, 4, StandardCharsets.US_ASCII)
      if (tag == "fmt " && size >= 16 && i + 24 <= bytes.length) {
        fmtCode = bb.getShort(i + 8) & 0xffff
        channels = bb.getShort(i + 10) & 0xffff
        bits = bb.getShort(i + 22) & 0xffff
      } else if (tag == "data") {
        dataOff = i + 8
        dataLen = math.min(size, (bytes.length - dataOff).toLong).toInt
      }
      if (size > Int.MaxValue - 16) return None
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (fmtCode != 1 || channels <= 0 || bits != 16 || dataOff < 0) None
    else {
      val n = dataLen / (2 * channels)
      val out = new Array[Int](n)
      var s = 0
      while (s < n) { out(s) = bb.getShort(dataOff + 2 * channels * s).toInt; s += 1 }
      Some(out)
    }
  }

  /** 63-bit fingerprint of a PCM clip: window energies E(w) = Σ v² over
    * 32-sample windows, bit w = 1 iff E(w+1) > E(w), packed into the
    * two-halves sign-bit discipline. Clips shorter than two windows have
    * nothing to difference and drop. */
  private[graft] def afHalves(pcm: Array[Int]): Option[(Long, Long)] = {
    val nWin = math.min(AfWindows, pcm.length / AfWinLen)
    if (nWin < 2) return None
    val e = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var s = 0L
      var t = w * AfWinLen
      val end = t + AfWinLen
      while (t < end) { s += pcm(t).toLong * pcm(t); t += 1 }
      e(w) = s
      w += 1
    }
    var lo = 0L; var hi = 0L
    var b = 0
    while (b < nWin - 1) {
      if (e(b + 1) > e(b)) { if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32) }
      b += 1
    }
    Some((lo, hi))
  }

  /** Batch audio fingerprinting: decode → window energies → sign bits,
    * map-only over partitions (the [[imageDHash]] shape). Undecodable or
    * too-short payloads drop — no fingerprint, no false near-dup. */
  def audioFingerprint(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.flatMap { row =>
        decodePcm(row.payload).flatMap(afHalves).map { case (lo, hi) =>
          ImageHash(row.doc_id, lo, hi)
        }
      }
    }.toDF()
  }

  /** Audio near-dup counts: the fingerprint drops into the SAME
    * Hamming-banded machinery as the image hash ([[phashNearDups]] —
    * disjoint 8-bit blocks, pigeonhole recall 1 at distance ≤ 7, exact
    * bit_count verify on candidates only; never all-pairs). Shares
    * [[phashNearDups]]'s star-capped degree default — exact below the
    * bucket cap, hub-verified lower bound above it. */
  def audioNearDups(media: DataFrame, maxHamming: Int = 7,
      starCap: Option[Int] = Some(256))(implicit spark: SparkSession): DataFrame =
    phashNearDups(audioFingerprint(media), maxHamming, starCap)
      .withColumnRenamed("ph_lo", "af_lo")
      .withColumnRenamed("ph_hi", "af_hi")

  /** Audio-corpus dedup: ONE survivor (min doc_id) per transitive
    * fingerprint near-dup component — [[phashDedupImages]] applied to the
    * audio fingerprint (the banded machinery and the pointer-jumping
    * closure are modality-agnostic once payloads become 64-bit hashes). */
  def audioDedup(media: DataFrame, maxHamming: Int = 7)(implicit spark: SparkSession): DataFrame =
    phashDedupImages(audioFingerprint(media), maxHamming)
      .withColumnRenamed("ph_lo", "af_lo")
      .withColumnRenamed("ph_hi", "af_hi")

  // ---------------------------------------------------------------------
  // Video near-dup: keyframe perceptual hashes + set overlap
  // ---------------------------------------------------------------------

  /** One sampled keyframe of a video: the [[MediaRow]] shape plus the
    * frame index within its clip. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Per-frame perceptual hash — [[imageDHash]] keyed by (video, frame). */
  final case class FrameHash(doc_id: Long, frame_idx: Int, ph_lo: Long,
      ph_hi: Long)

  /** Planted gray value of frame-content id `fid` at (x, y): every fid
    * gets its OWN quadratic texture (cross-term multiplier fid%29 + 1,
    * additive phase fid·17, mod-256 wraps keeping it non-monotonic), so
    * distinct fids hash to unrelated dHashes while equal fids are
    * byte-identical — frame identity IS content identity, the invariant
    * keyframe-fingerprint video dedup rests on. */
  private[graft] def videoFrameGray(fid: Long, x: Int, y: Int): Int =
    ((x * x * 3 + y * y * 5 + x * y * ((fid % 29).toInt + 1) + fid * 17) % 256).toInt

  private[graft] val VideoFrameW = 32
  private[graft] val VideoFrameH = 24

  /** Documents → per-video keyframe table: video `id` has 4 + id%5
    * sampled keyframes, keyframe k carrying the REAL encoded 32×24 image
    * of frame content fid = (id%8)·16 + k — same-class videos share
    * actual frame CONTENT (trimmed to different lengths), different
    * classes share nothing: the edited-copy / re-upload geometry video
    * dedup exists to catch. The frame-decode codec is out of container
    * scope (MP4 is entropy-coded), so the fixture plants the DECODED
    * keyframes and the operator owns everything a real pipeline runs
    * after its codec: per-frame hashing, the inverted hash join, and
    * set-overlap scoring. */
  def syntheticVideoFrameTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .flatMap { case (id, _) =>
        val nf = 4 + (id % 5).toInt
        (0 until nf).map { k =>
          val fid = (id % 8) * 16 + k
          FrameRow(id, k, buildImage(VideoFrameW, VideoFrameH, (fid % 4).toInt,
            (x, y) => videoFrameGray(fid, x, y).toByte))
        }
      }.toDF()
  }

  /** Batch per-frame dHash: decode each keyframe's bytes → 64-bit hash,
    * map-only over partitions. Undecodable frames drop. */
  def videoFrameDHash(frames: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    frames.as[FrameRow].mapPartitions { batch =>
      batch.flatMap { row =>
        decodeGray(row.payload).map { case (w, h, g) =>
          val (lo, hi) = dHashHalves(w, h, g)
          FrameHash(row.doc_id, row.frame_idx, lo, hi)
        }
      }
    }.toDF()
  }

  /** Video near-dup counts by keyframe-hash set overlap: two videos are
    * near-dups when the Jaccard similarity of their DISTINCT frame-hash
    * sets reaches `minJaccard` (the standard frame-fingerprint video
    * dedup shape: candidates come from an inverted index on exact frame
    * hash — only videos SHARING a frame ever meet, never all-pairs; the
    * per-pair match count then scores exactly). Returns per-video
    * (doc_id, n_frames, n_near). At 100 TB ubiquitous frames (intros,
    * slates) and dominant re-upload classes concentrate posting lists —
    * the r15 sf1 sweep measured the uncapped form at rows exponent ~2.05
    * (598 M shuffle rows) because the per-hash pair grouping is Θ(k²) in
    * the posting-list length k. Since r16 the default caps posting lists
    * (`maxPosting`): oversized lists emit hub star candidates (list-min
    * rep → member, O(k)) and every candidate's match count `m` is then
    * recomputed EXACTLY against the two videos' full keyframe sets (a
    * narrow equi join bounded by keyframes-per-video, the same
    * verify-the-candidate shape as the bit_count Hamming check), so a
    * surviving pair's Jaccard is never approximated — only pairs meeting
    * EXCLUSIVELY inside over-cap posting lists are traded for the hub
    * edge, which keeps has-near-dup (n_near > 0) for genuine duplicate
    * classes while the degree of an over-cap clique degrades to a lower
    * bound. Uncapped exact enumeration is opt-in via maxPosting = None
    * (single-pass: m falls out of the posting join itself). */
  def videoNearDups(frameHashes: DataFrame, minJaccard: Double = 0.5,
      maxPosting: Option[Int] = Some(256)): DataFrame = {
    val sets = frameHashes.select("doc_id", "ph_lo", "ph_hi").distinct()
    val nf = sets.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    val pairs = videoNearDupPairs(frameHashes, minJaccard, maxPosting)
    nf.join(
        pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_near")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_near"))
      .select("doc_id", "n_frames", "n_near")
  }

  /** Verified video near-dup pairs (doc_a < doc_b, Jaccard of distinct
    * frame-hash sets ≥ `minJaccard`) — the edge set behind
    * [[videoNearDups]], exposed for component-level consumers the way
    * [[phashPairsOf]] is for images. See [[videoNearDups]] for the
    * `maxPosting` star-cap semantics; every emitted pair is exactly
    * verified regardless of how it was proposed. */
  def videoNearDupPairs(frameHashes: DataFrame, minJaccard: Double = 0.5,
      maxPosting: Option[Int] = Some(256)): DataFrame = {
    val sets = frameHashes.select("doc_id", "ph_lo", "ph_hi").distinct()
    val nf = sets.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    val scored = maxPosting match {
      case None =>
        // single-pass exact form: the posting join's own multiplicity IS
        // the shared-frame count
        val a = sets.select(col("doc_id").as("doc_a"), col("ph_lo"), col("ph_hi"))
        val b = sets.select(col("doc_id").as("doc_b"), col("ph_lo"), col("ph_hi"))
        a.join(b, Seq("ph_lo", "ph_hi"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("m"))
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        // posting-list size + rep over the SAME (hash) key the candidate
        // join shuffles on — one exchange feeds both windows and the join
        val w = Window.partitionBy("ph_lo", "ph_hi")
        val sized = sets
          .withColumn("psize", count(lit(1)).over(w))
          .withColumn("rep", min(col("doc_id")).over(w))
        val small = sized.filter(col("psize") <= cap)
          .select("ph_lo", "ph_hi", "doc_id")
        val pairsSmall = small.select(col("ph_lo"), col("ph_hi"),
            col("doc_id").as("doc_a"))
          .join(small.select(col("ph_lo"), col("ph_hi"),
            col("doc_id").as("doc_b")), Seq("ph_lo", "ph_hi"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b")
        // rep = min(doc_id) over the posting, so doc_a < doc_b already
        val star = sized.filter(col("psize") > cap &&
            col("doc_id") =!= col("rep"))
          .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
        val cand = pairsSmall.unionByName(star).distinct()
        // exact m per candidate: explode by doc_a's (bounded) keyframe
        // set, then equi-join doc_b's set on the hash — candidate-linear
        cand
          .join(sets.select(col("doc_id").as("doc_a"),
            col("ph_lo"), col("ph_hi")), Seq("doc_a"))
          .join(sets.select(col("doc_id").as("doc_b"),
            col("ph_lo"), col("ph_hi")), Seq("doc_b", "ph_lo", "ph_hi"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("m"))
    }
    scored
      .join(nf.select(col("doc_id").as("doc_a"), col("n_frames").as("nfa")), "doc_a")
      .join(nf.select(col("doc_id").as("doc_b"), col("n_frames").as("nfb")), "doc_b")
      .filter(col("m").cast("double") /
        (col("nfa") + col("nfb") - col("m")) >= minJaccard)
      .select("doc_a", "doc_b")
  }

  /** Image-corpus dedup: ONE survivor (min doc_id) per transitive phash
    * near-dup component — the image twin of Neutral.dedupCorpusClustered,
    * with Dedup.connectedComponents (pointer-jumping, O(log diameter)
    * rounds) closing the pair graph so hub-shaped duplicate clusters
    * collapse to exactly one kept image. Returns the surviving doc_ids
    * with their hashes. */
  def phashDedupImages(hashes: DataFrame, maxHamming: Int = 7,
      starCap: Option[Int] = Some(256)): DataFrame = {
    // survivors are COMPONENT-level, so the skew-safe star policy applies
    // (r15): buckets over starCap contribute hub-verified star edges —
    // the closure of a genuine duplicate class is unchanged while the
    // candidate volume stays linear (the sf1 sweep measured the full-pair
    // form at rows exponent ~2.0). 256 never engages at sf0.01 oracle
    // scale (largest planted bucket ~62), so the driver gate's results
    // are bit-identical; at sf0.1+ the policy bounds the blow-up.
    val dropped = Dedup
      .connectedComponents(phashPairs(hashes, maxHamming, starCap))
      .filter(col("doc_id") =!= col("component"))
      .select("doc_id")
    hashes.join(dropped, Seq("doc_id"), "left_anti")
      .select("doc_id", "ph_lo", "ph_hi")
  }
}
