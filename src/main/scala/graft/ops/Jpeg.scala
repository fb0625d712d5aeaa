package graft.ops

/** From-scratch BASELINE JPEG (ITU-T T.81 / ISO 10918-1) decode —
  * grayscale (r14, closing the last `header_only` codec class in the
  * scope gate) and, since the same round, full YCbCr COLOR: marker-
  * segment parsing (DQT/DHT/SOF0/DRI/SOS with APPn/COM skip), canonical
  * Huffman table construction from the DHT BITS/HUFFVAL form, the
  * entropy-coded segment with 0xFF00 byte unstuffing, interleaved MCU
  * decoding with per-component sampling factors, RESTART INTERVALS
  * (DRI + sequence-checked RSTn with per-component DC predictor reset),
  * DC-difference prediction with the T.81 F.12 EXTEND convention,
  * run/size AC coefficient coding (EOB + ZRL), zigzag de-scan,
  * dequantization, the 2-D 8×8 inverse DCT with level shift, edge-block
  * cropping, box chroma upsampling, and an EXACT-integer JFIF YCbCr→RGB
  * conversion ([[ycc2rgb]]). The in-repo fixture encoders
  * [[makeJpegGray]] / [[makeJpegColor]] emit spec-valid baseline files
  * through the same tables, so a planted-formula gate check exercises
  * the whole chain (a one-bit drift anywhere — Huffman, extend, zigzag,
  * dequant, IDCT, upsample, color convert — lands on wrong pixels and
  * hash-fails).
  *
  * DOCUMENTED SUBSET (the VP8/VP8L discipline — anything outside
  * returns None, never a crash):
  *  - baseline sequential DCT (SOF0) AND progressive DCT (SOF2, r14 —
  *    the most common real-world variant: multi-scan spectral
  *    selection + successive approximation per T.81 Annex G, with EOBn
  *    run coding, AC refinement correction-bit weaving, interleaved DC
  *    scans on the MCU grid vs single-component scans on the
  *    ceil(natural/8) grid, and restart intervals inside any scan);
  *    8-bit precision, 1 component (grayscale, non-interleaved) or 3
  *    components (YCbCr) with luma sampling factors up to 2×2 and 1×1
  *    chroma — the 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 JFIF family; restart
  *    intervals supported (RSTn required at the exact spec position
  *    with the cyclic sequence number); no arithmetic coding, no
  *    hierarchical/lossless modes, no subsampled-luma layouts;
  *  - chroma upsampling is nearest-neighbor box replication (T.81 does
  *    not mandate a filter; libjpeg's default "fancy" bilinear differs
  *    — cross-decoder chroma-edge equality is NOT claimed, exactness is
  *    against this decoder's own documented arithmetic);
  *  - Huffman tables are read from the file's own DHT segments (any
  *    valid canonical table, not just the Annex K examples);
  *  - the IDCT is the T.81 A.3.3 formula evaluated in double precision
  *    with final rounding — bit-exact for the DC-only blocks the gate's
  *    closed-form oracle uses (constant = round(q₀·level/8)), and shared
  *    with the fixture encoder's reconstruction simulation for
  *    AC-bearing blocks (T.81 does not mandate a bit-exact IDCT, so
  *    cross-decoder AC equality is explicitly NOT claimed; the subset
  *    claim is self-consistency plus exact DC). CROSS-VALIDATED (r14):
  *    the JDK's independent ImageIO reader decodes the fixture
  *    encoders' files — grayscale DC-only EXACTLY, 4:4:4 color
  *    (baseline and progressive) within ±1/channel (YCbCr→RGB rounding
  *    conventions differ across decoders) — so the emitted bitstreams
  *    are validated by a second implementation, not only this one.
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
    * unstuffing; a 0xFF-marker inside the bit stream rejects — RSTn
    * markers are legal ONLY at the byte-aligned restart boundaries the
    * MCU loop consumes explicitly via [[restartTo]]. */
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
          else throw Malformed // marker mid-bitstream: malformed
          b = 0xff
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    /** Consume the RSTn marker at a restart boundary: drop the partial
      * pad byte (B.2.1.1 pads with 1-bits; a FULL 0xFF pad byte plus its
      * stuffed 0x00 was already consumed by [[bit]] at the byte level),
      * then require exactly 0xFF, 0xD0+expect at the read position —
      * spec position, strictly enforced, wrong sequence number rejects. */
    def restartTo(expect: Int): Unit = {
      bitCnt = 0
      if (pos + 1 >= end || (buf(pos) & 0xff) != 0xff ||
        (buf(pos + 1) & 0xff) != 0xd0 + expect) throw Malformed
      pos += 2
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

  /** One frame component: SOF sampling factors + quant/huff selectors
    * and its decoded plane (block-grid padded; cropped on return). */
  private final class Comp(val h: Int, val v: Int, val tq: Int) {
    var dc: HuffTable = null
    var ac: HuffTable = null
    var plane: Array[Int] = null
    var stride = 0
    var pred = 0
    // progressive state: the full-frame coefficient store (ZIGZAG order
    // per block, accumulated across scans), block dims on the padded
    // MCU grid, and the smaller non-interleaved dims (ceil(natural/8),
    // T.81 A.2.2) that single-component scans walk
    var coefs: Array[Int] = null
    var wB = 0
    var hB = 0
    var wBNI = 0
    var hBNI = 0
  }

  /** Decoded frame: per-component planes at their NATURAL (subsampled)
    * resolution — `cw(c) = ceil(w·hc/hmax)`, `ch(c) = ceil(h·vc/vmax)`
    * per T.81 A.1.1 — geometry alongside for the upsampling consumer. */
  private[graft] final case class Planes(w: Int, h: Int,
      planes: Array[Array[Int]], cw: Array[Int], ch: Array[Int],
      hmax: Int, vmax: Int)

  /** Decode ONE progressive scan's entropy-coded segment (T.81 G.2):
    * DC first/refinement scans (interleaved MCU order for multi-
    * component scans, the component's own ceil(natural/8) block grid
    * otherwise), AC first scans with EOBn run coding (band [Ss, Se],
    * values shifted by the Al point transform), and AC refinement
    * scans (correction bits for history-nonzero coefficients woven
    * through the run/ZRL/EOB structure — the G.7 flow). Restart
    * markers reset predictors AND the EOB run. Accumulates into each
    * component's zigzag-order coefficient store and returns the file
    * position of the marker that follows the segment (skipping pad
    * bits and 0xFF fill bytes). */
  private def progScan(bytes: Array[Byte], start: Int,
      scomps: Array[Comp], ss: Int, se: Int, ah: Int, al: Int,
      ri: Int, mcusX: Int, mcusY: Int): Int = {
    val br = new BitReader(bytes, start, bytes.length)
    var rstIdx = 0
    var sinceRst = 0
    var eobrun = 0
    var c = 0
    while (c < scomps.length) { scomps(c).pred = 0; c += 1 }
    def maybeRestart(): Unit =
      if (ri > 0 && sinceRst == ri) {
        br.restartTo(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        sinceRst = 0
        eobrun = 0
        var cc = 0
        while (cc < scomps.length) { scomps(cc).pred = 0; cc += 1 }
      }
    def dcBlock(cp: Comp, bi: Int): Unit =
      if (ah == 0) {
        val s = br.decode(cp.dc)
        if (s > 11) throw Malformed
        cp.pred += extend(br.bits(s), s)
        cp.coefs(bi) = cp.pred << al
      } else if (br.bit() == 1) cp.coefs(bi) |= 1 << al
    def acFirstBlock(cp: Comp, bi: Int): Unit =
      if (eobrun > 0) eobrun -= 1
      else {
        var k = ss
        var done = false
        while (!done && k <= se) {
          val rs = br.decode(cp.ac)
          val r = rs >> 4
          val s = rs & 0x0f
          if (s != 0) {
            k += r
            if (k > se) throw Malformed
            cp.coefs(bi + k) = extend(br.bits(s), s) << al
            k += 1
          } else if (r == 15) k += 16 // ZRL
          else { // EOBn: run of (1 << r) + receive(r) all-done bands
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.bits(r)
            done = true
          }
        }
      }
    def acRefineBlock(cp: Comp, bi: Int): Unit = {
      val p1 = 1 << al
      var k = ss
      // a history-nonzero coefficient consumes one correction bit; a
      // set bit adds ±2^Al if that bit of the magnitude is still clear
      def correct(idx: Int): Unit = {
        val cur = cp.coefs(idx)
        if (br.bit() == 1 && (cur & p1) == 0)
          cp.coefs(idx) = cur + (if (cur >= 0) p1 else -p1)
      }
      if (eobrun == 0) {
        var done = false
        while (!done && k <= se) {
          val rs = br.decode(cp.ac)
          var r = rs >> 4
          val s = rs & 0x0f
          var newVal = 0
          if (s != 0) {
            if (s != 1) throw Malformed // only ±1·2^Al appears newly
            newVal = if (br.bit() == 1) p1 else -p1
          } else if (r != 15) {
            eobrun = 1 << r
            if (r > 0) eobrun += br.bits(r)
            done = true
          }
          if (!done) {
            // advance over r zero-HISTORY positions (history-nonzero
            // ones take correction bits instead of counting), then
            // place the new coefficient (ZRL: r = 15, nothing placed)
            var placed = false
            while (!placed && k <= se) {
              if (cp.coefs(bi + k) != 0) correct(bi + k)
              else if (r == 0) {
                if (newVal != 0) cp.coefs(bi + k) = newVal
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // inside an EOB run the band's remaining history-nonzero
        // coefficients still take their correction bits
        while (k <= se) {
          if (cp.coefs(bi + k) != 0) correct(bi + k)
          k += 1
        }
        eobrun -= 1
      }
    }
    if (ss == 0 && scomps.length > 1) {
      // interleaved DC scan in MCU order
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          var cc = 0
          while (cc < scomps.length) {
            val cp = scomps(cc)
            var v = 0
            while (v < cp.v) {
              var u = 0
              while (u < cp.h) {
                dcBlock(cp, ((my * cp.v + v) * cp.wB + mx * cp.h + u) * 64)
                u += 1
              }
              v += 1
            }
            cc += 1
          }
          sinceRst += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: one component over its ceil(natural/8) grid
      // (T.81 A.2.2 — NOT the MCU-padded grid); restart counts blocks
      val cp = scomps(0)
      var by = 0
      while (by < cp.hBNI) {
        var bx = 0
        while (bx < cp.wBNI) {
          maybeRestart()
          val bi = (by * cp.wB + bx) * 64
          if (ss == 0) dcBlock(cp, bi)
          else if (ah == 0) acFirstBlock(cp, bi)
          else acRefineBlock(cp, bi)
          sinceRst += 1
          bx += 1
        }
        by += 1
      }
    }
    // find the next marker: drop pad bits, allow a trailing stuffed
    // 0xFF00 and any number of 0xFF fill bytes; anything else rejects
    var p = br.bytePos
    var slack = 2
    var res = -1
    while (res < 0) {
      if (p + 1 >= bytes.length) throw Malformed
      val b0 = bytes(p) & 0xff
      val b1 = bytes(p + 1) & 0xff
      if (b0 == 0xff && b1 == 0xff) p += 1 // fill byte
      else if (b0 == 0xff && b1 != 0) res = p
      else { p += 1; slack -= 1; if (slack < 0) throw Malformed }
    }
    res
  }

  /** Decode a baseline JPEG in the documented subset: grayscale (one
    * component, non-interleaved) or YCbCr (three components, one
    * interleaved scan, luma sampling up to 2×2 with 1×1 chroma — the
    * 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 family), with restart intervals
    * (DRI + RSTn sequence-checked, DC predictors reset per B.2.1.2).
    * Returns None for anything outside (progressive, arithmetic,
    * 12-bit, >2 sampling factors, subsampled-luma layouts, multi-scan). */
  private[graft] def decodePlanes(bytes: Array[Byte]): Option[Planes] =
    try {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) return None
      var i = 2
      val quant = new Array[Array[Int]](4)
      val huffDc = new Array[HuffTable](4)
      val huffAc = new Array[HuffTable](4)
      var w = 0
      var h = 0
      var comps: Array[Comp] = null
      var compIds: Array[Int] = null
      var ri = 0
      var scanStart = -1
      var progressive = false
      var nScans = 0
      var progDone = false
      var hmax = 0
      var vmax = 0
      var mcusX = 0
      var mcusY = 0
      while (scanStart < 0 && !progDone) {
        if (i + 1 >= bytes.length) return None
        if ((bytes(i) & 0xff) != 0xff) return None
        var m = bytes(i + 1) & 0xff
        while (m == 0xff && i + 2 < bytes.length) { i += 1; m = bytes(i + 1) & 0xff }
        if (m == 0xd9) {
          // EOI: closes a progressive stream after ≥1 scan; premature
          // anywhere else
          if (progressive && nScans > 0) progDone = true else return None
        }
        else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
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
            case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
              if (comps != null) return None // one frame header only
              progressive = m == 0xc2
              if (len < 8) return None
              if ((bytes(seg) & 0xff) != 8) return None // precision
              h = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
              w = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
              val nc = bytes(seg + 5) & 0xff
              if (nc != 1 && nc != 3) return None
              if (len < 8 + 3 * nc) return None
              if (w <= 0 || h <= 0 || w.toLong * h > 16000000L) return None
              comps = new Array[Comp](nc)
              compIds = new Array[Int](nc)
              var c = 0
              while (c < nc) {
                compIds(c) = bytes(seg + 6 + 3 * c) & 0xff
                val hv = bytes(seg + 7 + 3 * c) & 0xff
                comps(c) = new Comp(hv >> 4, hv & 0x0f,
                  bytes(seg + 8 + 3 * c) & 0x0f)
                c += 1
              }
              if (nc == 1) {
                if (comps(0).h != 1 || comps(0).v != 1) return None
              } else {
                // luma up to 2×2, chroma strictly 1×1 (the JFIF family)
                if (comps(0).h < 1 || comps(0).h > 2 ||
                  comps(0).v < 1 || comps(0).v > 2) return None
                if (comps(1).h != 1 || comps(1).v != 1 ||
                  comps(2).h != 1 || comps(2).v != 1) return None
              }
              // grid geometry, needed per scan in the progressive path
              hmax = comps.map(_.h).max
              vmax = comps.map(_.v).max
              mcusX = (w + 8 * hmax - 1) / (8 * hmax)
              mcusY = (h + 8 * vmax - 1) / (8 * vmax)
              c = 0
              while (c < nc) {
                val cp = comps(c)
                cp.wB = mcusX * cp.h
                cp.hB = mcusY * cp.v
                cp.wBNI = ((w * cp.h + hmax - 1) / hmax + 7) / 8
                cp.hBNI = ((h * cp.v + vmax - 1) / vmax + 7) / 8
                c += 1
              }
            case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                0xcb | 0xcd | 0xce | 0xcf =>
              return None // non-baseline/progressive frame: out of subset
            case 0xdd => // DRI: restart interval (any value; 0 disables)
              if (len < 4) return None
              ri = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
            case 0xda if !progressive =>
              // baseline SOS: single scan covering every component
              if (comps == null) return None
              val ns = bytes(seg) & 0xff
              if (ns != comps.length) return None
              var c = 0
              while (c < ns) {
                val cs = bytes(seg + 1 + 2 * c) & 0xff
                if (cs != compIds(c)) return None // frame order required
                val tt = bytes(seg + 2 + 2 * c) & 0xff
                val dcT = huffDc(tt >> 4)
                val acT = huffAc(tt & 0x0f)
                if (dcT == null || acT == null) return None
                comps(c).dc = dcT
                comps(c).ac = acT
                c += 1
              }
              scanStart = i + 2 + len
            case 0xda => // progressive SOS: one of many scans (T.81 G)
              if (comps == null) return None
              val ns = bytes(seg) & 0xff
              if (ns < 1 || ns > comps.length || len != 6 + 2 * ns)
                return None
              val scomps = new Array[Comp](ns)
              var prevIdx = -1
              var c = 0
              while (c < ns) {
                val cs = bytes(seg + 1 + 2 * c) & 0xff
                val idx = compIds.indexOf(cs)
                if (idx <= prevIdx) return None // frame-order subset
                prevIdx = idx
                val cp = comps(idx)
                val tt = bytes(seg + 2 + 2 * c) & 0xff
                cp.dc = huffDc(tt >> 4) // may be null: refinement scans
                cp.ac = huffAc(tt & 0x0f) // don't touch their tables
                scomps(c) = cp
                c += 1
              }
              val sSs = bytes(seg + 1 + 2 * ns) & 0xff
              val sSe = bytes(seg + 2 + 2 * ns) & 0xff
              val ahal = bytes(seg + 3 + 2 * ns) & 0xff
              val ah = ahal >> 4
              val al = ahal & 0x0f
              // G.1.1.1 progression constraints: DC scans carry the
              // 0..0 band (any component set), AC scans one component
              // and a band inside 1..63; successive approximation
              // refines exactly one bit at a time
              if (sSe > 63 || sSe < sSs) return None
              if (sSs == 0 && sSe != 0) return None
              if (sSs > 0 && ns != 1) return None
              if (ah != 0 && ah != al + 1) return None
              if (al > 13) return None
              if (sSs == 0 && ah == 0 && scomps.exists(_.dc == null))
                return None
              if (sSs > 0 && scomps(0).ac == null) return None
              c = 0
              while (c < comps.length) {
                val cp = comps(c)
                if (cp.coefs == null)
                  cp.coefs = new Array[Int](cp.wB * cp.hB * 64)
                c += 1
              }
              i = progScan(bytes, i + 2 + len, scomps, sSs, sSe, ah, al,
                ri, mcusX, mcusY)
              nScans += 1
            case _ => () // APPn, COM, others: skip
          }
          // a progressive SOS advanced i itself (to the marker after
          // its entropy segment)
          if (scanStart < 0 && !(progressive && m == 0xda)) i += 2 + len
        }
      }
      val nc = comps.length
      var c = 0
      while (c < nc) {
        val cp = comps(c)
        if (quant(cp.tq) == null) return None
        cp.stride = mcusX * cp.h * 8
        cp.plane = new Array[Int](cp.stride * mcusY * cp.v * 8)
        c += 1
      }
      val coef = new Array[Int](64)
      val block = new Array[Int](64)
      if (progressive) {
        // all scans are in the coefficient stores; dequant + IDCT the
        // whole frame (latest-wins quant tables, as libjpeg does)
        c = 0
        while (c < nc) {
          val cp = comps(c)
          val q = quant(cp.tq)
          var by = 0
          while (by < cp.hB) {
            var bx = 0
            while (bx < cp.wB) {
              val bi = (by * cp.wB + bx) * 64
              java.util.Arrays.fill(coef, 0)
              var k = 0
              while (k < 64) {
                coef(Zigzag(k)) = cp.coefs(bi + k) * q(k)
                k += 1
              }
              idct(coef, block)
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  cp.plane((by * 8 + yy) * cp.stride + bx * 8 + xx) =
                    block(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
      } else {
      val br = new BitReader(bytes, scanStart, bytes.length)
      var rstIdx = 0
      var sinceRst = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (ri > 0 && sinceRst == ri) {
            br.restartTo(rstIdx)
            rstIdx = (rstIdx + 1) & 7
            sinceRst = 0
            var cc = 0
            while (cc < nc) { comps(cc).pred = 0; cc += 1 }
          }
          var cc = 0
          while (cc < nc) {
            val cp = comps(cc)
            val q = quant(cp.tq)
            var v = 0
            while (v < cp.v) {
              var u = 0
              while (u < cp.h) {
                java.util.Arrays.fill(coef, 0)
                val s = br.decode(cp.dc)
                if (s > 11) throw Malformed
                cp.pred += extend(br.bits(s), s)
                coef(0) = cp.pred * q(0)
                var k = 1
                var eob = false
                while (!eob && k < 64) {
                  val rs = br.decode(cp.ac)
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
                val px0 = (mx * cp.h + u) * 8
                val py0 = (my * cp.v + v) * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    cp.plane((py0 + yy) * cp.stride + px0 + xx) =
                      block(yy * 8 + xx)
                    xx += 1
                  }
                  yy += 1
                }
                u += 1
              }
              v += 1
            }
            cc += 1
          }
          sinceRst += 1
          mx += 1
        }
        my += 1
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
      } // end baseline entropy path
      val planes = new Array[Array[Int]](nc)
      val cws = new Array[Int](nc)
      val chs = new Array[Int](nc)
      c = 0
      while (c < nc) {
        val cp = comps(c)
        val cwc = (w * cp.h + hmax - 1) / hmax
        val chc = (h * cp.v + vmax - 1) / vmax
        val out = new Array[Int](cwc * chc)
        var y = 0
        while (y < chc) {
          var x = 0
          while (x < cwc) { out(y * cwc + x) = cp.plane(y * cp.stride + x); x += 1 }
          y += 1
        }
        planes(c) = out
        cws(c) = cwc
        chs(c) = chc
        c += 1
      }
      Some(Planes(w, h, planes, cws, chs, hmax, vmax))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Decode to a gray plane: the single component of a grayscale file,
    * or the full-resolution LUMA plane of a color file (gray = Y, the
    * same achromatic contract the other color formats use). */
  private[graft] def decodeLumaGray(bytes: Array[Byte])
      : Option[(Int, Int, Array[Int])] =
    decodePlanes(bytes).map(d => (d.w, d.h, d.planes(0)))

  // -------------------------------------------------------------------
  // YCbCr → RGB (JFIF), exact integer form
  // -------------------------------------------------------------------

  /** JFIF YCbCr→RGB in 16.16 fixed point with round-half-up and an
    * arithmetic-shift floor — EXACT integer arithmetic (constants =
    * round(c·65536): 1.402→91881, 0.344136→22554, 0.714136→46802,
    * 1.772→116130), so an oracle reproduces every output with integer
    * (or power-of-two-exact) operations. Returns packed 0xRRGGBB. */
  private[graft] def ycc2rgb(y: Int, cb: Int, cr: Int): Int = {
    val cb1 = cb - 128
    val cr1 = cr - 128
    def cl(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    val r = cl(((y << 16) + 91881 * cr1 + 32768) >> 16)
    val g = cl(((y << 16) - 22554 * cb1 - 46802 * cr1 + 32768) >> 16)
    val b = cl(((y << 16) + 116130 * cb1 + 32768) >> 16)
    (r << 16) | (g << 8) | b
  }

  /** Decode to full-resolution RGB planes: grayscale replicates the gray
    * plane; color box-upsamples chroma (sample (x,y) reads chroma
    * (x·hc/hmax, y·vc/vmax) — nearest-neighbor replication, the T.81-
    * legal filter an exact oracle can mirror) then converts per
    * [[ycc2rgb]]. Returns (w, h, r, g, b) row-major planes. */
  private[graft] def decodeRgb(bytes: Array[Byte])
      : Option[(Int, Int, Array[Int], Array[Int], Array[Int])] =
    decodePlanes(bytes).map { d =>
      val n = d.w * d.h
      val r = new Array[Int](n)
      val g = new Array[Int](n)
      val b = new Array[Int](n)
      if (d.planes.length == 1) {
        System.arraycopy(d.planes(0), 0, r, 0, n)
        System.arraycopy(d.planes(0), 0, g, 0, n)
        System.arraycopy(d.planes(0), 0, b, 0, n)
      } else {
        val yP = d.planes(0)
        val cbP = d.planes(1)
        val crP = d.planes(2)
        val cw = d.cw(1)
        var y = 0
        while (y < d.h) {
          val cy = y / d.vmax
          var x = 0
          while (x < d.w) {
            val ci = cy * cw + x / d.hmax
            val rgb = ycc2rgb(yP(y * d.w + x), cbP(ci), crP(ci))
            r(y * d.w + x) = rgb >> 16
            g(y * d.w + x) = (rgb >> 8) & 0xff
            b(y * d.w + x) = rgb & 0xff
            x += 1
          }
          y += 1
        }
      }
      (d.w, d.h, r, g, b)
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

  /** Progressive-scan AC symbol set: the baseline set PLUS the EOBn
    * symbols (r << 4 for r = 1..14 — EOB runs of 2..32767; r = 0 is the
    * plain EOB already present) that T.81 G.1.2.2 adds. 144 symbols,
    * all at length 8 (canonical, clear of the all-ones code). */
  private val FixAcProgSyms: Array[Int] =
    (0 to 14).map(_ << 4).toArray ++ Array(0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 8) yield (r << 4) | s)

  private def fixAcProgCode(sym: Int): Int = {
    val i = FixAcProgSyms.indexOf(sym)
    require(i >= 0, f"symbol 0x$sym%02x not in the progressive AC set")
    i
  }

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

  /** The chroma fixture quant table (ZIGZAG): q₀ = 8 keeps DC-only
    * chroma blocks integer-exact (value = 128 + level); 17 elsewhere so
    * the two-table DQT path is genuinely exercised (a luma/chroma table
    * swap changes AC pixels and fails the round-trip). */
  private val FixQuantChromaZz: Array[Int] =
    Array.tabulate(64)(k => if (k == 0) 8 else 17)

  /** Build a spec-valid baseline YCbCr COLOR JPEG: three components in
    * one interleaved scan, luma sampling (hs, vs) ∈ {1,2}² with 1×1
    * chroma (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), separate luma/chroma quant
    * and Huffman tables, and an optional restart interval `ri` (DRI +
    * RSTn every ri MCUs, byte-aligned 1-bit padding, DC predictors
    * reset — B.2.1.1/B.2.1.2). `levels(comp, bx, by)` supplies 64
    * ZIGZAG-order quantized levels per 8×8 block of component comp
    * (0 = Y on the luma block grid, 1 = Cb, 2 = Cr on the chroma grid);
    * position 0 is the DC level, coded as a difference per component.
    * Returns (file bytes, expected (r, g, b) full-resolution planes) —
    * the expectation is the encoder's own dequant + IDCT + box-upsample
    * + [[ycc2rgb]] simulation, sharing the transforms but none of the
    * entropy path with [[decodePlanes]]. DC-only blocks stay integer-
    * exact (component sample = clamp(128 + level) under q₀ = 8). */
  private[graft] def makeJpegColor(w: Int, h: Int, hs: Int, vs: Int,
      ri: Int, levels: (Int, Int, Int) => Array[Int])
      : (Array[Byte], (Array[Int], Array[Int], Array[Int])) = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096)
    require(hs >= 1 && hs <= 2 && vs >= 1 && vs <= 2 && ri >= 0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = out += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // JFIF APP0
    "JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      .foreach(b => u8(b & 0xff))
    u8(0); u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    // DQT: table 0 (luma), table 1 (chroma) — one segment, two tables
    marker(0xdb); u16(2 + 2 * 65)
    u8(0x00); FixQuantZz.foreach(u8)
    u8(0x01); FixQuantChromaZz.foreach(u8)
    // SOF0: 8-bit, 3 components — Y (hs,vs,q0), Cb/Cr (1,1,q1)
    marker(0xc0); u16(8 + 3 * 3); u8(8); u16(h); u16(w); u8(3)
    u8(1); u8((hs << 4) | vs); u8(0)
    u8(2); u8(0x11); u8(1)
    u8(3); u8(0x11); u8(1)
    // DHT: DC/AC tables 0 (luma) and 1 (chroma), same canonical shapes
    val dcCounts = Array.fill(16)(0); dcCounts(4) = FixDcSyms.length
    val acCounts = Array.fill(16)(0); acCounts(7) = FixAcSyms.length
    val tblLen = (1 + 16 + FixDcSyms.length) + (1 + 16 + FixAcSyms.length)
    marker(0xc4); u16(2 + 2 * tblLen)
    u8(0x00); dcCounts.foreach(u8); FixDcSyms.foreach(u8)
    u8(0x10); acCounts.foreach(u8); FixAcSyms.foreach(u8)
    u8(0x01); dcCounts.foreach(u8); FixDcSyms.foreach(u8)
    u8(0x11); acCounts.foreach(u8); FixAcSyms.foreach(u8)
    if (ri > 0) { marker(0xdd); u16(4); u16(ri) } // DRI
    // SOS: 3 components, (dc, ac) table ids 0/0, 1/1, 1/1
    marker(0xda); u16(6 + 2 * 3); u8(3)
    u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(63); u8(0)
    val bwr = new BitWriter(out)
    val mcusX = (w + 8 * hs - 1) / (8 * hs)
    val mcusY = (h + 8 * vs - 1) / (8 * vs)
    val compH = Array(hs, 1, 1)
    val compV = Array(vs, 1, 1)
    val quantZz = Array(FixQuantZz, FixQuantChromaZz, FixQuantChromaZz)
    val strides = Array(mcusX * hs * 8, mcusX * 8, mcusX * 8)
    val planes = Array(
      new Array[Int](strides(0) * mcusY * vs * 8),
      new Array[Int](strides(1) * mcusY * 8),
      new Array[Int](strides(2) * mcusY * 8))
    val preds = new Array[Int](3)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    def codeBlock(c: Int, bx: Int, by: Int): Unit = {
      val zz = levels(c, bx, by)
      require(zz.length == 64)
      val diff = zz(0) - preds(c)
      preds(c) = zz(0)
      val s = category(diff)
      require(s <= 11, s"DC difference $diff out of category range")
      bwr.bits(fixDcCode(s), 5)
      if (s > 0) bwr.bits(receiveBits(diff, s) & ((1 << s) - 1), s)
      var k = 1
      var lastNz = 0
      while (k < 64) { if (zz(k) != 0) lastNz = k; k += 1 }
      k = 1
      var run = 0
      while (k <= lastNz) {
        if (zz(k) == 0) { run += 1; k += 1 }
        else {
          while (run > 15) { bwr.bits(fixAcCode(0xf0), 8); run -= 16 }
          val sz = category(zz(k))
          require(sz <= 8, s"fixture AC table covers size<=8: size=$sz")
          bwr.bits(fixAcCode((run << 4) | sz), 8)
          bwr.bits(receiveBits(zz(k), sz) & ((1 << sz) - 1), sz)
          run = 0
          k += 1
        }
      }
      if (lastNz < 63) bwr.bits(fixAcCode(0x00), 8) // EOB
      // reconstruction simulation into the component plane
      java.util.Arrays.fill(coef, 0)
      k = 0
      while (k < 64) { coef(Zigzag(k)) = zz(k) * quantZz(c)(k); k += 1 }
      idct(coef, block)
      val st = strides(c)
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          planes(c)((by * 8 + yy) * st + bx * 8 + xx) = block(yy * 8 + xx)
          xx += 1
        }
        yy += 1
      }
    }
    var rstIdx = 0
    var sinceRst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (ri > 0 && sinceRst == ri) {
          bwr.flush()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          sinceRst = 0
          java.util.Arrays.fill(preds, 0)
        }
        var v = 0
        while (v < vs) {
          var u = 0
          while (u < hs) { codeBlock(0, mx * hs + u, my * vs + v); u += 1 }
          v += 1
        }
        codeBlock(1, mx, my)
        codeBlock(2, mx, my)
        sinceRst += 1
        mx += 1
      }
      my += 1
    }
    bwr.flush()
    marker(0xd9) // EOI
    // expected full-resolution RGB: crop + box-upsample + exact convert
    val n = w * h
    val rE = new Array[Int](n)
    val gE = new Array[Int](n)
    val bE = new Array[Int](n)
    var y = 0
    while (y < h) {
      val cy = y / vs
      var x = 0
      while (x < w) {
        val rgb = ycc2rgb(
          planes(0)(y * strides(0) + x),
          planes(1)(cy * strides(1) + x / hs),
          planes(2)(cy * strides(2) + x / hs))
        rE(y * w + x) = rgb >> 16
        gE(y * w + x) = (rgb >> 8) & 0xff
        bE(y * w + x) = rgb & 0xff
        x += 1
      }
      y += 1
    }
    (out.toArray, (rE, gE, bE))
  }

  /** Build a spec-valid PROGRESSIVE (SOF2) YCbCr JPEG using libjpeg's
    * standard 10-scan progression script: an interleaved DC-first scan
    * (Al = 1), per-component AC-first scans with spectral selection
    * (Y split 1..5 / 6..63 at Al = 2, chroma 1..63 at Al = 1), a DC
    * refinement scan, and successive-approximation AC refinement scans
    * down to Al = 0 (Y twice: 2→1, 1→0). Every coefficient bit is
    * eventually sent, so the completed frame reconstructs EXACTLY the
    * planted levels — the expectation is the same dequant + IDCT +
    * box-upsample + [[ycc2rgb]] simulation as [[makeJpegColor]], and a
    * decode comparison pins the whole G.2 surface: EOBn run coding
    * across blocks, ZRL-in-refinement, correction-bit weaving, the
    * point transforms, spectral band bookkeeping, and the
    * non-interleaved ceil(natural/8) block walk (≠ the MCU grid when
    * dims are odd against the sampling). `ri` > 0 adds DRI + RSTn
    * restarts inside every scan (EOB runs forced closed at each
    * boundary). `levels(comp, bx, by)` as in [[makeJpegColor]]. */
  private[graft] def makeJpegProgressive(w: Int, h: Int, hs: Int, vs: Int,
      ri: Int, levels: (Int, Int, Int) => Array[Int])
      : (Array[Byte], (Array[Int], Array[Int], Array[Int])) = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096)
    require(hs >= 1 && hs <= 2 && vs >= 1 && vs <= 2 && ri >= 0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = out += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 2 * 65) // DQT: luma + chroma tables
    u8(0x00); FixQuantZz.foreach(u8)
    u8(0x01); FixQuantChromaZz.foreach(u8)
    // SOF2 (progressive DCT): 8-bit, 3 components
    marker(0xc2); u16(8 + 3 * 3); u8(8); u16(h); u16(w); u8(3)
    u8(1); u8((hs << 4) | vs); u8(0)
    u8(2); u8(0x11); u8(1)
    u8(3); u8(0x11); u8(1)
    // DHT: DC 0/1 (shared shape), progressive AC 0/1 (EOBn symbols in)
    val dcCounts = Array.fill(16)(0); dcCounts(4) = FixDcSyms.length
    val acCounts = Array.fill(16)(0); acCounts(7) = FixAcProgSyms.length
    val tblLen = (1 + 16 + FixDcSyms.length) + (1 + 16 + FixAcProgSyms.length)
    marker(0xc4); u16(2 + 2 * tblLen)
    u8(0x00); dcCounts.foreach(u8); FixDcSyms.foreach(u8)
    u8(0x10); acCounts.foreach(u8); FixAcProgSyms.foreach(u8)
    u8(0x01); dcCounts.foreach(u8); FixDcSyms.foreach(u8)
    u8(0x11); acCounts.foreach(u8); FixAcProgSyms.foreach(u8)
    if (ri > 0) { marker(0xdd); u16(4); u16(ri) }
    val mcusX = (w + 8 * hs - 1) / (8 * hs)
    val mcusY = (h + 8 * vs - 1) / (8 * vs)
    val compH = Array(hs, 1, 1)
    val compV = Array(vs, 1, 1)
    // non-interleaved block dims (T.81 A.2.2) — what AC scans walk
    val wBNI = Array((w + 7) / 8, (w + hs * 8 - 1) / (hs * 8),
      (w + hs * 8 - 1) / (hs * 8))
    val hBNI = Array((h + 7) / 8, (h + vs * 8 - 1) / (vs * 8),
      (h + vs * 8 - 1) / (vs * 8))
    val zzOf = Array.tabulate(3) { c =>
      (bx: Int, by: Int) => {
        val a = levels(c, bx, by)
        require(a.length == 64)
        a
      }
    }
    var bwr: BitWriter = null
    var rstIdx = 0
    var sinceRst = 0
    var eobrun = 0
    val beBits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def acSym(sym: Int): Unit = bwr.bits(fixAcProgCode(sym), 8)
    def emitEobrun(): Unit =
      if (eobrun > 0) {
        var nbits = 0
        var t = eobrun
        while ({ t >>= 1; t != 0 }) nbits += 1
        acSym(nbits << 4)
        if (nbits > 0) bwr.bits(eobrun - (1 << nbits), nbits)
        eobrun = 0
        beBits.foreach(b => bwr.bits(b, 1))
        beBits.clear()
      }
    val preds = new Array[Int](3)
    def maybeRestart(): Unit =
      if (ri > 0 && sinceRst == ri) {
        emitEobrun()
        bwr.flush()
        marker(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        sinceRst = 0
        java.util.Arrays.fill(preds, 0)
      }
    def beginScan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)
        : Unit = {
      marker(0xda); u16(6 + 2 * comps.length); u8(comps.length)
      comps.foreach { c =>
        u8(c + 1) // component id
        u8(if (c == 0) 0x00 else 0x11) // DC/AC table selectors
      }
      u8(ss); u8(se); u8((ah << 4) | al)
      bwr = new BitWriter(out)
      rstIdx = 0
      sinceRst = 0
      eobrun = 0
      beBits.clear()
      java.util.Arrays.fill(preds, 0)
    }
    def endScan(): Unit = { emitEobrun(); bwr.flush() }
    // ---- scan 1: interleaved DC first, Al = 1
    beginScan(Seq(0, 1, 2), 0, 0, 0, 1)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        maybeRestart()
        var c = 0
        while (c < 3) {
          var v = 0
          while (v < compV(c)) {
            var u = 0
            while (u < compH(c)) {
              val dcT = zzOf(c)(mx * compH(c) + u, my * compV(c) + v)(0) >> 1
              val diff = dcT - preds(c)
              preds(c) = dcT
              val s = category(diff)
              require(s <= 11, "DC difference out of range")
              bwr.bits(fixDcCode(s), 5)
              if (s > 0) bwr.bits(receiveBits(diff, s) & ((1 << s) - 1), s)
              u += 1
            }
            v += 1
          }
          c += 1
        }
        sinceRst += 1
        mx += 1
      }
      my += 1
    }
    endScan()
    // ---- AC first scan over one component's NI grid
    def acFirstScan(c: Int, ss: Int, se: Int, al: Int): Unit = {
      beginScan(Seq(c), ss, se, 0, al)
      var by = 0
      while (by < hBNI(c)) {
        var bx = 0
        while (bx < wBNI(c)) {
          maybeRestart()
          val zz = zzOf(c)(bx, by)
          var r = 0
          var k = ss
          var any = false
          while (k <= se) {
            val t0 = zz(k)
            val mag = math.abs(t0) >> al
            if (mag == 0) r += 1
            else {
              emitEobrun()
              while (r > 15) { acSym(0xf0); r -= 16 }
              val sz = category(mag)
              require(sz <= 8, "fixture AC table covers size<=8")
              acSym((r << 4) | sz)
              val signed = if (t0 < 0) -mag else mag
              bwr.bits(receiveBits(signed, sz) & ((1 << sz) - 1), sz)
              r = 0
              any = true
            }
            k += 1
          }
          if (r > 0 || !any) {
            eobrun += 1
            if (eobrun == 0x7fff) emitEobrun()
          }
          sinceRst += 1
          bx += 1
        }
        by += 1
      }
      endScan()
    }
    // ---- AC refinement scan (the G.7 flow, jcphuff's shape)
    def acRefineScan(c: Int, ss: Int, se: Int, al: Int): Unit = {
      beginScan(Seq(c), ss, se, al + 1, al)
      val brBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      var by = 0
      while (by < hBNI(c)) {
        var bx = 0
        while (bx < wBNI(c)) {
          maybeRestart()
          val zz = zzOf(c)(bx, by)
          // pre-pass: point-transformed magnitudes + last NEW-nonzero
          val absv = new Array[Int](64)
          var eobPos = ss - 1
          var k = ss
          while (k <= se) {
            val t = math.abs(zz(k)) >> al
            absv(k) = t
            if (t == 1) eobPos = k
            k += 1
          }
          var r = 0
          brBits.clear()
          k = ss
          while (k <= se) {
            val temp = absv(k)
            if (temp == 0) r += 1
            else {
              // ZRLs only when they can't fold into the block's EOB
              while (r > 15 && k <= eobPos) {
                emitEobrun()
                acSym(0xf0)
                r -= 16
                brBits.foreach(b => bwr.bits(b, 1))
                brBits.clear()
              }
              if (temp > 1) brBits += (temp & 1) // history-nonzero
              else {
                emitEobrun()
                acSym((r << 4) | 1)
                bwr.bits(if (zz(k) < 0) 0 else 1, 1)
                brBits.foreach(b => bwr.bits(b, 1))
                brBits.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || brBits.nonEmpty) {
            eobrun += 1
            beBits ++= brBits
            brBits.clear()
            if (eobrun == 0x7fff || beBits.length > 900) emitEobrun()
          }
          sinceRst += 1
          bx += 1
        }
        by += 1
      }
      endScan()
    }
    acFirstScan(0, 1, 5, 2) // scan 2
    acFirstScan(1, 1, 63, 1) // scan 3
    acFirstScan(2, 1, 63, 1) // scan 4
    acFirstScan(0, 6, 63, 2) // scan 5
    // ---- scan 6: DC refinement (interleaved), Ah = 1 → Al = 0
    beginScan(Seq(0, 1, 2), 0, 0, 1, 0)
    my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        maybeRestart()
        var c = 0
        while (c < 3) {
          var v = 0
          while (v < compV(c)) {
            var u = 0
            while (u < compH(c)) {
              bwr.bits(zzOf(c)(mx * compH(c) + u, my * compV(c) + v)(0) & 1, 1)
              u += 1
            }
            v += 1
          }
          c += 1
        }
        sinceRst += 1
        mx += 1
      }
      my += 1
    }
    endScan()
    acRefineScan(0, 1, 63, 1) // scan 7: Y 2 → 1
    acRefineScan(0, 1, 63, 0) // scan 8: Y 1 → 0
    acRefineScan(1, 1, 63, 0) // scan 9
    acRefineScan(2, 1, 63, 0) // scan 10
    marker(0xd9) // EOI
    // expected pixels: the completed progression reconstructs the full
    // planted levels, so the simulation is makeJpegColor's exactly
    val quantZz = Array(FixQuantZz, FixQuantChromaZz, FixQuantChromaZz)
    val strides = Array(mcusX * hs * 8, mcusX * 8, mcusX * 8)
    val planes = Array(
      new Array[Int](strides(0) * mcusY * vs * 8),
      new Array[Int](strides(1) * mcusY * 8),
      new Array[Int](strides(2) * mcusY * 8))
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var c = 0
    while (c < 3) {
      var by = 0
      while (by < hBNI(c)) {
        var bx = 0
        while (bx < wBNI(c)) {
          val zz = zzOf(c)(bx, by)
          java.util.Arrays.fill(coef, 0)
          var k = 0
          while (k < 64) { coef(Zigzag(k)) = zz(k) * quantZz(c)(k); k += 1 }
          idct(coef, block)
          val st = strides(c)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              planes(c)((by * 8 + yy) * st + bx * 8 + xx) = block(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    val n = w * h
    val rE = new Array[Int](n)
    val gE = new Array[Int](n)
    val bE = new Array[Int](n)
    var y = 0
    while (y < h) {
      val cy = y / vs
      var x = 0
      while (x < w) {
        val rgb = ycc2rgb(
          planes(0)(y * strides(0) + x),
          planes(1)(cy * strides(1) + x / hs),
          planes(2)(cy * strides(2) + x / hs))
        rE(y * w + x) = rgb >> 16
        gE(y * w + x) = (rgb >> 8) & 0xff
        bE(y * w + x) = rgb & 0xff
        x += 1
      }
      y += 1
    }
    (out.toArray, (rE, gE, bE))
  }
}
