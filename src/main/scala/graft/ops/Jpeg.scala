package graft.ops

/** From-scratch BASELINE JPEG (ITU-T T.81 / ISO 10918-1) GRAYSCALE
  * decode — the r12 stretch / r13 verdict #5 closing the last
  * `header_only` codec class in the scope gate: marker-segment parsing
  * (DQT/DHT/SOF0/SOS with APPn/COM skip), canonical Huffman table
  * construction from the DHT BITS/HUFFVAL form, the entropy-coded
  * segment with 0xFF00 byte unstuffing, DC-difference prediction with
  * the T.81 F.12 EXTEND convention, run/size AC coefficient coding
  * (EOB + ZRL), zigzag de-scan, dequantization, the 2-D 8×8 inverse DCT
  * with level shift, and edge-block cropping. The in-repo fixture
  * encoder [[makeJpegGray]] emits spec-valid baseline files through the
  * same tables, so a planted-formula gate check exercises the whole
  * chain (a one-bit drift anywhere — Huffman, extend, zigzag, dequant,
  * IDCT — lands on wrong pixels and hash-fails).
  *
  * DOCUMENTED SUBSET (the VP8/VP8L discipline — anything outside
  * returns None, never a crash):
  *  - baseline sequential DCT (SOF0) only, 8-bit precision, ONE
  *    component (grayscale), 1×1 sampling, single scan, no restart
  *    intervals (a DRI with nonzero interval rejects), no arithmetic
  *    coding, no progressive/hierarchical modes;
  *  - Huffman tables are read from the file's own DHT segments (any
  *    valid canonical table, not just the Annex K examples);
  *  - the IDCT is the T.81 A.3.3 formula evaluated in double precision
  *    with final rounding — bit-exact for the DC-only blocks the gate's
  *    closed-form oracle uses (constant = round(q₀·level/8)), and shared
  *    with the fixture encoder's reconstruction simulation for
  *    AC-bearing blocks (T.81 does not mandate a bit-exact IDCT, so
  *    cross-decoder AC equality is explicitly NOT claimed; the subset
  *    claim is self-consistency plus exact DC).
  *
  * Reference behavior being reimplemented: the reference warehouse
  * stores image URLs only (`ufc/models/staging/stg_fighters.sql` — the
  * image_url column); the decode surface itself is beyond-reference
  * scope, part of the multimodal pipeline contract.
  */
object Jpeg {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Zigzag index: natural position of the k-th coefficient in scan
    * order (same table as T.81 Figure A.6). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // -------------------------------------------------------------------
  // Canonical Huffman (T.81 Annex C)
  // -------------------------------------------------------------------

  /** Decode-side table: for each code length L (1..16), the smallest
    * code value of that length, the largest + 1, and the offset of its
    * first symbol in `symbols` — the standard canonical walk. */
  private final class HuffTable(counts: Array[Int], val symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCodeEx = new Array[Int](17) // max + 1, or -1 when empty
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l) == 0) { maxCodeEx(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l)
          k += counts(l)
          maxCodeEx(l) = code
        }
        code <<= 1
        l += 1
      }
      if (k != symbols.length) throw Malformed
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; any other 0xFF-marker inside the scan rejects (no
    * restart intervals in subset). */
  private final class BitReader(buf: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bitBuf = 0
    private var bitCnt = 0
    def bit(): Int = {
      if (bitCnt == 0) {
        if (pos >= end) throw Malformed
        var b = buf(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= end) throw Malformed
          val m = buf(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed
          else throw Malformed // RSTn or stray marker: out of subset
          b = 0xff
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCodeEx(l) >= 0 && code < t.maxCodeEx(l))
          return t.symbols(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      throw Malformed
    }
    /** Scan position for EOI validation. */
    def bytePos: Int = pos
  }

  /** T.81 F.12 EXTEND: map the s received bits to the signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // -------------------------------------------------------------------
  // Inverse DCT (T.81 A.3.3, double evaluation + rounding)
  // -------------------------------------------------------------------

  private val IdctCos: Array[Double] = {
    val a = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        a(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
        x += 1
      }
      u += 1
    }
    a
  }

  /** 8×8 dequantized coefficients (natural order) → spatial samples
    * (level-shifted +128, clamped). Separable two-pass evaluation. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows of the coefficient block: 1-D over u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(y * 8 + u) * IdctCos(u * 8 + x); u += 1 }
        tmp(y * 8 + x) = s * 0.5
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * IdctCos(v * 8 + yy); v += 1 }
        val p = math.round(s * 0.5).toInt + 128
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  // -------------------------------------------------------------------
  // Decoder
  // -------------------------------------------------------------------

  /** Decode a baseline grayscale JPEG in the documented subset. Returns
    * (width, height, gray row-major) or None. */
  private[graft] def decodeLumaGray(bytes: Array[Byte])
      : Option[(Int, Int, Array[Int])] =
    try {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) return None
      var i = 2
      val quant = new Array[Array[Int]](4)
      val huffDc = new Array[HuffTable](4)
      val huffAc = new Array[HuffTable](4)
      var w = 0
      var h = 0
      var qId = -1
      var sofSeen = false
      var dcId = -1
      var acId = -1
      var scanStart = -1
      while (scanStart < 0) {
        if (i + 1 >= bytes.length) return None
        if ((bytes(i) & 0xff) != 0xff) return None
        var m = bytes(i + 1) & 0xff
        while (m == 0xff && i + 2 < bytes.length) { i += 1; m = bytes(i + 1) & 0xff }
        if (m == 0xd9) return None // EOI before SOS
        if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
        else {
          if (i + 3 >= bytes.length) return None
          val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > bytes.length) return None
          val seg = i + 4
          m match {
            case 0xdb => // DQT: one or more (PqTq, 64 values) tables
              var p = seg
              val segEnd = i + 2 + len
              while (p < segEnd) {
                val pq = (bytes(p) & 0xff) >> 4
                val tq = bytes(p) & 0x0f
                if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
                val t = new Array[Int](64)
                var k = 0
                while (k < 64) { t(k) = bytes(p + 1 + k) & 0xff; k += 1 }
                quant(tq) = t
                p += 65
              }
            case 0xc4 => // DHT: one or more (TcTh, BITS, HUFFVAL) tables
              var p = seg
              val segEnd = i + 2 + len
              while (p < segEnd) {
                val tc = (bytes(p) & 0xff) >> 4
                val th = bytes(p) & 0x0f
                if (tc > 1 || th > 3 || p + 17 > segEnd) return None
                val counts = new Array[Int](17)
                var n = 0
                var l = 1
                while (l <= 16) {
                  counts(l) = bytes(p + l) & 0xff; n += counts(l); l += 1
                }
                if (p + 17 + n > segEnd || n == 0 || n > 256) return None
                val syms = new Array[Int](n)
                var k = 0
                while (k < n) { syms(k) = bytes(p + 17 + k) & 0xff; k += 1 }
                val t = new HuffTable(counts, syms)
                if (tc == 0) huffDc(th) = t else huffAc(th) = t
                p += 17 + n
              }
            case 0xc0 => // SOF0 baseline
              if (len < 8) return None
              if ((bytes(seg) & 0xff) != 8) return None // precision
              h = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
              w = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
              val nc = bytes(seg + 5) & 0xff
              if (nc != 1) return None // grayscale-only subset
              if ((bytes(seg + 7) & 0xff) != 0x11) return None // 1x1
              qId = bytes(seg + 8) & 0x0f
              if (w <= 0 || h <= 0 || w.toLong * h > 16000000L) return None
              sofSeen = true
            case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                0xcb | 0xcd | 0xce | 0xcf =>
              return None // non-baseline frame type: out of subset
            case 0xdd => // DRI: restart intervals out of subset
              if (len < 4) return None
              val ri = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
              if (ri != 0) return None
            case 0xda => // SOS
              if (!sofSeen) return None
              val ns = bytes(seg) & 0xff
              if (ns != 1) return None
              dcId = (bytes(seg + 2) & 0xff) >> 4
              acId = bytes(seg + 2) & 0x0f
              scanStart = i + 2 + len
            case _ => () // APPn, COM, others: skip
          }
          if (scanStart < 0) i += 2 + len
        }
      }
      if (qId < 0 || quant(qId) == null || huffDc(dcId) == null ||
        huffAc(acId) == null) return None
      val q = quant(qId)
      val dcT = huffDc(dcId)
      val acT = huffAc(acId)
      val bw = (w + 7) / 8
      val bh = (h + 7) / 8
      val stride = bw * 8
      val plane = new Array[Int](stride * bh * 8)
      val br = new BitReader(bytes, scanStart, bytes.length)
      val coef = new Array[Int](64)
      val block = new Array[Int](64)
      var pred = 0
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          java.util.Arrays.fill(coef, 0)
          val s = br.decode(dcT)
          if (s > 11) throw Malformed
          pred += extend(br.bits(s), s)
          coef(0) = pred * q(0)
          var k = 1
          var eob = false
          while (!eob && k < 64) {
            val rs = br.decode(acT)
            val r = rs >> 4
            val sz = rs & 0x0f
            if (sz == 0) {
              if (r == 15) k += 16 // ZRL
              else eob = true
            } else {
              k += r
              if (k > 63) throw Malformed
              coef(Zigzag(k)) = extend(br.bits(sz), sz) * q(k)
              k += 1
            }
          }
          idct(coef, block)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              plane((by * 8 + yy) * stride + bx * 8 + xx) = block(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      // trailing EOI validation: after the last block, the stream must
      // close with FFD9 within the few bytes the lazy bit reader may not
      // have consumed (≤1 padding byte, possibly a stuffed pair) — a
      // truncated scan that HAPPENED to decode all blocks still rejects
      val p0 = br.bytePos
      var eoiOk = false
      var p = math.max(2, p0 - 1)
      while (!eoiOk && p + 1 < bytes.length && p <= p0 + 3) {
        eoiOk = (bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) == 0xd9
        p += 1
      }
      if (!eoiOk) return None
      val g = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { g(y * w + x) = plane(y * stride + x); x += 1 }
        y += 1
      }
      Some((w, h, g))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  // -------------------------------------------------------------------
  // Fixture encoder
  // -------------------------------------------------------------------

  /** MSB-first bit writer with 0xFF00 stuffing. */
  private final class BitWriter(
      out: scala.collection.mutable.ArrayBuffer[Byte]) {
    private var bitBuf = 0
    private var bitCnt = 0
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          out += bitBuf.toByte
          if ((bitBuf & 0xff) == 0xff) out += 0x00.toByte
          bitBuf = 0
          bitCnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits, per the spec. */
    def flush(): Unit =
      if (bitCnt > 0) bits((1 << (8 - bitCnt)) - 1, 8 - bitCnt)
  }

  /** The fixture's quant table, ZIGZAG order: q₀ = 8 so a DC-only block
    * reconstructs to exactly 128 + level; 16 elsewhere. */
  private val FixQuantZz: Array[Int] =
    Array.tabulate(64)(k => if (k == 0) 8 else 16)

  // canonical single-length tables, well clear of the all-ones code:
  // DC = 12 symbols (categories 0..11) at length 5; AC = EOB, ZRL, and
  // run 0..15 × size 1..8 at length 8 (130 of 256 slots)
  private val FixDcSyms: Array[Int] = Array.tabulate(12)(identity)
  private val FixAcSyms: Array[Int] =
    Array(0x00, 0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 8) yield (r << 4) | s)

  private def fixDcCode(sym: Int): Int = FixDcSyms.indexOf(sym)
  private def fixAcCode(sym: Int): Int = FixAcSyms.indexOf(sym)

  /** Category (bit size) of a DC difference / AC level per T.81 F.1.2. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** The s low bits that EXTEND inverts: v itself when positive,
    * v - 1 (two's complement low bits) when negative. */
  private def receiveBits(v: Int, s: Int): Int =
    if (v >= 0) v else v - 1 + (1 << s) // low s bits of v-1

  /** Build a spec-valid baseline grayscale JPEG with ARBITRARY planted
    * quantized levels per 8×8 block (`levels(bx, by)` = 64 ZIGZAG-order
    * values; position 0 is the DC level, coded as a difference from the
    * raster predecessor like the spec requires). Returns (file bytes,
    * expected w×h pixels) — the expectation is the encoder's own
    * dequant+IDCT simulation, sharing the transform but NONE of the
    * entropy path with [[decodeLumaGray]], so a decode comparison
    * verifies marker parsing, Huffman, EXTEND, zigzag, and dequant
    * wiring exactly. DC-only blocks are integer-exact: pixel =
    * clamp(128 + level) under the q₀ = 8 fixture table. */
  private[graft] def makeJpegGray(w: Int, h: Int,
      levels: (Int, Int) => Array[Int]): (Array[Byte], Array[Int]) = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = out += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    // JFIF APP0 (exercises the decoder's APPn skip path; real-world
    // baseline files virtually always carry it)
    marker(0xe0); u16(16)
    "JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII).foreach(b => u8(b & 0xff))
    u8(0); u8(1); u8(1) // \0, version 1.1
    u8(0); u16(1); u16(1); u8(0); u8(0) // density + no thumbnail
    // DQT, table 0
    marker(0xdb); u16(2 + 1 + 64); u8(0x00)
    FixQuantZz.foreach(u8)
    // SOF0: 8-bit, 1 component, 1x1 sampling, quant table 0
    marker(0xc0); u16(8 + 3); u8(8); u16(h); u16(w); u8(1)
    u8(1); u8(0x11); u8(0)
    // DHT: DC table 0 (all length 5), AC table 0 (all length 7)
    val dcCounts = Array.fill(16)(0); dcCounts(4) = FixDcSyms.length // len 5
    val acCounts = Array.fill(16)(0); acCounts(7) = FixAcSyms.length // len 8
    marker(0xc4); u16(2 + (1 + 16 + FixDcSyms.length) +
      (1 + 16 + FixAcSyms.length))
    u8(0x00); dcCounts.foreach(u8); FixDcSyms.foreach(u8)
    u8(0x10); acCounts.foreach(u8); FixAcSyms.foreach(u8)
    // SOS
    marker(0xda); u16(6 + 2); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    val bwErr = new BitWriter(out)
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val stride = bw * 8
    val plane = new Array[Int](stride * bh * 8)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val zz = levels(bx, by)
        require(zz.length == 64)
        // DC difference
        val diff = zz(0) - pred
        pred = zz(0)
        val s = category(diff)
        require(s <= 11, s"DC difference $diff out of category range")
        bwErr.bits(fixDcCode(s), 5)
        if (s > 0) bwErr.bits(receiveBits(diff, s) & ((1 << s) - 1), s)
        // AC run/size with ZRL and EOB
        var k = 1
        var lastNz = 0
        while (k < 64) { if (zz(k) != 0) lastNz = k; k += 1 }
        k = 1
        var run = 0
        while (k <= lastNz) {
          if (zz(k) == 0) { run += 1; k += 1 }
          else {
            while (run > 15) { bwErr.bits(fixAcCode(0xf0), 8); run -= 16 }
            val sz = category(zz(k))
            require(sz <= 8,
              s"fixture AC table covers size<=8: size=$sz")
            bwErr.bits(fixAcCode((run << 4) | sz), 8)
            bwErr.bits(receiveBits(zz(k), sz) & ((1 << sz) - 1), sz)
            run = 0
            k += 1
          }
        }
        if (lastNz < 63) bwErr.bits(fixAcCode(0x00), 8) // EOB
        // reconstruction simulation
        java.util.Arrays.fill(coef, 0)
        k = 0
        while (k < 64) {
          coef(Zigzag(k)) = zz(k) * FixQuantZz(k)
          k += 1
        }
        idct(coef, block)
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            plane((by * 8 + yy) * stride + bx * 8 + xx) = block(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    bwErr.flush()
    marker(0xd9) // EOI
    val expected = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { expected(y * w + x) = plane(y * stride + x); x += 1 }
      y += 1
    }
    (out.toArray, expected)
  }

  /** Constant-gray fixture (the codec-scope class upgrade): every block
    * plants one DC level v−128, so the decode is exactly v everywhere —
    * the closed form the scope oracle recomputes. */
  private[graft] def makeJpegConst(w: Int, h: Int, v: Int): Array[Byte] = {
    val zz = new Array[Int](64)
    zz(0) = (v & 0xff) - 128
    makeJpegGray(w, h, (_, _) => zz)._1
  }
}
