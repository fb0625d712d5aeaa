package graft.ops

import java.nio.charset.StandardCharsets

/** From-scratch FLAC decode (RFC 9639 / the public FLAC format spec) —
  * the AUDIO analog of the [[Vp8]]/[[Jpeg]] image work, upgrading the
  * codec surface's audio classes past container-header metadata to
  * SAMPLE-exact decode. FLAC is lossless and integer-exact end to end,
  * so every decoded sample is a hash-gateable closed-form value: the
  * stream walk (fLaC magic, STREAMINFO, metadata skip), frame headers
  * (sync, blocking strategy, the block-size/sample-rate/sample-size
  * code tables with their end-of-header uncommon forms, channel
  * assignment, UTF-8-coded frame/sample numbers, CRC-8), subframes
  * (CONSTANT / VERBATIM / FIXED orders 0–4 / LPC orders 1–32 with
  * quantized-coefficient precision and shift), wasted-bits unary
  * prefixes, rice-coded residuals (both 4- and 5-bit parameter
  * methods, partition orders, escape-to-raw partitions, zigzag), the
  * three stereo decorrelation modes (left/side, right/side, mid/side
  * with the side-channel +1 bit depth), and the frame-closing CRC-16.
  *
  * DOCUMENTED SUBSET (the codec discipline — anything outside returns
  * None, never a crash): 8/12/16/20/24-bit samples, 1..8 channels
  * (stereo decorrelation on 2), fixed-blocksize streams with
  * sequential frame numbers or variable-blocksize streams with
  * sequential sample numbers, STREAMINFO totals validated when
  * nonzero; both CRCs verified; no ID3 prefixes, no Ogg mapping.
  * The in-repo fixture encoder [[makeFlac]] emits spec-valid streams
  * through the same tables (including the rice parameter choice, LPC
  * quantization, escape partitions, and wasted-bits shifts), so a
  * decode comparison pins the whole chain — a one-bit drift anywhere
  * lands on different samples or a CRC failure and hash-fails.
  *
  * Reference behavior being reimplemented: the reference warehouse has
  * no audio surface (its `ufc/models` tree is tabular); this is part of the
  * beyond-reference multimodal pipeline contract, next to WAV/MP4
  * container metadata in [[Multimodal]].
  */
object Flac {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Decoded stream: per-channel sample arrays plus stream params. */
  private[graft] final case class FlacAudio(sampleRate: Int, channels: Int,
      bps: Int, samples: Array[Array[Int]])

  // -------------------------------------------------------------------
  // Bit I/O (MSB-first; FLAC has no byte stuffing)
  // -------------------------------------------------------------------

  private final class BitReader(buf: Array[Byte], start: Int, end: Int) {
    var pos = start
    private var bitCnt = 0 // bits consumed of buf(pos)
    def bit(): Int = {
      if (pos >= end) throw Malformed
      val b = (buf(pos) >> (7 - bitCnt)) & 1
      bitCnt += 1
      if (bitCnt == 8) { bitCnt = 0; pos += 1 }
      b
    }
    def u(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def s(n: Int): Int = {
      val v = u(n)
      (v << (64 - n) >> (64 - n)).toInt
    }
    /** FLAC unary: count of 0 bits before the terminating 1. */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) { q += 1; if (q > (1 << 20)) throw Malformed }
      q
    }
    def alignByte(): Unit = if (bitCnt != 0) { bitCnt = 0; pos += 1 }
    def aligned: Boolean = bitCnt == 0
    def atEnd: Boolean = pos >= end
  }

  private final class BitWriter(
      out: scala.collection.mutable.ArrayBuffer[Byte]) {
    private var cur = 0
    private var cnt = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      cnt += 1
      if (cnt == 8) { out += cur.toByte; cur = 0; cnt = 0 }
    }
    def u(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bit(0); i += 1 }; bit(1) }
    def alignByte(): Unit = while (cnt != 0) bit(0)
  }

  // -------------------------------------------------------------------
  // CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
  // -------------------------------------------------------------------

  private[graft] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  private[graft] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc =
          if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // block-size code table (4 bits): 0 reserved, 1 = 192, 2..5 =
  // 576·2^(n−2), 6/7 = uncommon 8/16-bit (value−1) at header end,
  // 8..15 = 256·2^(n−8)
  private def blockSizeOf(code: Int, br: BitReader): Int = code match {
    case 0 => throw Malformed
    case 1 => 192
    case c if c >= 2 && c <= 5 => 576 << (c - 2)
    case 6 => br.u(8).toInt + 1
    case 7 => br.u(16).toInt + 1
    case c => 256 << (c - 8)
  }

  private val RateTable: Array[Int] = Array(-1, 88200, 176400, 192000,
    8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000)

  private def sampleRateOf(code: Int, streamRate: Int, br: BitReader): Int =
    code match {
      case 0 => streamRate
      case c if c <= 11 => RateTable(c)
      case 12 => br.u(8).toInt * 1000
      case 13 => br.u(16).toInt
      case 14 => br.u(16).toInt * 10
      case _ => throw Malformed
    }

  private val BpsTable: Array[Int] = Array(-1, 8, 12, -1, 16, 20, 24, -1)

  /** UTF-8-style coded number, 1..7 bytes (36 bits max), as the frame
    * header carries frame/sample numbers. */
  private def readCodedNumber(br: BitReader): Long = {
    val b0 = br.u(8).toInt
    if ((b0 & 0x80) == 0) return b0
    var nCont = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { nCont += 1; mask >>= 1 }
    if (nCont < 1 || nCont > 6) throw Malformed
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nCont) {
      val c = br.u(8).toInt
      if ((c & 0xc0) != 0x80) throw Malformed
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  private def writeCodedNumber(bw: BitWriter, v0: Long): Unit = {
    require(v0 >= 0 && v0 < (1L << 36))
    if (v0 < 0x80) bw.u(v0, 8)
    else {
      var nCont = 1
      while (v0 >= (1L << (6 * nCont + (6 - nCont)))) nCont += 1
      // lead byte: nCont+1 ones, a zero, then the top bits
      val leadBits = 6 - nCont
      val lead = ((0xff << (leadBits + 1)) & 0xff) |
        ((v0 >> (6 * nCont)) & ((1 << leadBits) - 1)).toInt
      bw.u(lead, 8)
      var i = nCont - 1
      while (i >= 0) {
        bw.u(0x80 | ((v0 >> (6 * i)) & 0x3f), 8)
        i -= 1
      }
    }
  }

  // -------------------------------------------------------------------
  // Decoder
  // -------------------------------------------------------------------

  /** Decode a complete FLAC stream in the documented subset. */
  private[graft] def decodeFlac(bytes: Array[Byte]): Option[FlacAudio] =
    try {
      if (bytes.length < 42) return None
      if (!bytes.take(4).sameElements(
        "fLaC".getBytes(StandardCharsets.US_ASCII))) return None
      var p = 4
      var last = false
      var haveInfo = false
      var streamRate = 0
      var streamCh = 0
      var streamBps = 0
      var totalSamples = 0L
      while (!last) {
        if (p + 4 > bytes.length) return None
        val hdr = bytes(p) & 0xff
        last = (hdr & 0x80) != 0
        val btype = hdr & 0x7f
        val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
          (bytes(p + 3) & 0xff)
        if (p + 4 + len > bytes.length) return None
        if (btype == 0) { // STREAMINFO
          if (len != 34 || haveInfo) return None
          val br = new BitReader(bytes, p + 4, p + 4 + len)
          br.u(16) // min block size
          br.u(16) // max block size
          br.u(24) // min frame size
          br.u(24) // max frame size
          streamRate = br.u(20).toInt
          streamCh = br.u(3).toInt + 1
          streamBps = br.u(5).toInt + 1
          totalSamples = br.u(36)
          haveInfo = true
          if (streamRate <= 0 || streamCh > 8) return None
          if (streamBps != 8 && streamBps != 12 && streamBps != 16 &&
            streamBps != 20 && streamBps != 24) return None
        } else if (btype == 127) return None // invalid
        p += 4 + len
      }
      if (!haveInfo) return None
      // frames until end of stream
      val chans = Array.fill(streamCh)(
        new scala.collection.mutable.ArrayBuffer[Int])
      var frameIdx = 0L
      var samplePos = 0L
      var blockStrategy = -1
      while (p < bytes.length) {
        val frameStart = p
        val br = new BitReader(bytes, p, bytes.length)
        if (br.u(14) != 0x3ffe) throw Malformed // sync
        if (br.bit() != 0) throw Malformed // reserved
        val strategy = br.bit() // 0 fixed-blocksize, 1 variable
        if (blockStrategy < 0) blockStrategy = strategy
        else if (strategy != blockStrategy) throw Malformed
        val bsCode = br.u(4).toInt
        val srCode = br.u(4).toInt
        val chAsgn = br.u(4).toInt
        val bpsCode = br.u(3).toInt
        if (br.bit() != 0) throw Malformed // reserved
        val num = readCodedNumber(br)
        if (strategy == 0) { if (num != frameIdx) throw Malformed }
        else if (num != samplePos) throw Malformed
        val blockSize = blockSizeOf(bsCode, br)
        val rate = sampleRateOf(srCode, streamRate, br)
        if (rate != streamRate) throw Malformed
        val nCh = if (chAsgn < 8) chAsgn + 1 else 2
        if (chAsgn > 10) throw Malformed
        if (nCh != streamCh) throw Malformed
        val bps = if (bpsCode == 0) streamBps else BpsTable(bpsCode)
        if (bps != streamBps) throw Malformed
        if (!br.aligned) throw Malformed
        val hdrCrc = br.u(8).toInt
        if (hdrCrc != crc8(bytes, frameStart, br.pos - 1)) throw Malformed
        // subframes
        val frame = Array.ofDim[Int](nCh, blockSize)
        var ch = 0
        while (ch < nCh) {
          // side channels carry one extra bit (left/side: ch1;
          // right/side: ch0; mid/side: ch1)
          val chBps = bps + (chAsgn match {
            case 8 if ch == 1 => 1
            case 9 if ch == 0 => 1
            case 10 if ch == 1 => 1
            case _ => 0
          })
          decodeSubframe(br, frame(ch), blockSize, chBps)
          ch += 1
        }
        br.alignByte()
        val frameCrc = br.u(16).toInt
        if (frameCrc != crc16(bytes, frameStart, br.pos - 2)) throw Malformed
        // stereo decorrelation
        chAsgn match {
          case 8 => // left/side: right = left − side
            var i = 0
            while (i < blockSize) {
              frame(1)(i) = frame(0)(i) - frame(1)(i); i += 1
            }
          case 9 => // right/side: left = right + side
            var i = 0
            while (i < blockSize) {
              val side = frame(0)(i)
              frame(0)(i) = frame(1)(i) + side
              i += 1
            }
          case 10 => // mid/side
            var i = 0
            while (i < blockSize) {
              val side = frame(1)(i)
              var mid = frame(0)(i) << 1
              mid |= side & 1
              frame(0)(i) = (mid + side) >> 1
              frame(1)(i) = (mid - side) >> 1
              i += 1
            }
          case _ => ()
        }
        var c = 0
        while (c < nCh) { chans(c) ++= frame(c); c += 1 }
        frameIdx += 1
        samplePos += blockSize
        p = br.pos
      }
      if (frameIdx == 0) return None
      if (totalSamples != 0 && samplePos != totalSamples) return None
      Some(FlacAudio(streamRate, streamCh, streamBps,
        chans.map(_.toArray)))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def decodeSubframe(br: BitReader, out: Array[Int],
      blockSize: Int, bps: Int): Unit = {
    if (br.bit() != 0) throw Malformed // padding
    val t = br.u(6).toInt
    val wasted =
      if (br.bit() == 1) br.unary() + 1
      else 0
    val effBps = bps - wasted
    if (effBps <= 0) throw Malformed
    if (t == 0) { // CONSTANT
      val v = br.s(effBps)
      java.util.Arrays.fill(out, v)
    } else if (t == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = br.s(effBps); i += 1 }
    } else if ((t & 0x38) == 0x08 && (t & 0x07) <= 4) { // FIXED, order 0..4
      val order = t & 0x07
      var i = 0
      while (i < order) { out(i) = br.s(effBps); i += 1 }
      decodeResidual(br, out, blockSize, order)
      i = order
      while (i < blockSize) {
        out(i) += (order match {
          case 0 => 0
          case 1 => out(i - 1)
          case 2 => 2 * out(i - 1) - out(i - 2)
          case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
          case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
            out(i - 4)
        })
        i += 1
      }
    } else if ((t & 0x20) != 0) { // LPC, order 1..32
      val order = (t & 0x1f) + 1
      if (order > blockSize) throw Malformed
      var i = 0
      while (i < order) { out(i) = br.s(effBps); i += 1 }
      val precision = br.u(4).toInt + 1
      if (precision == 16) throw Malformed // 1111 invalid
      val shift = br.s(5)
      if (shift < 0) throw Malformed
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.s(precision); i += 1 }
      decodeResidual(br, out, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) += (acc >> shift).toInt
        i += 1
      }
    } else throw Malformed
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
  }

  private def decodeResidual(br: BitReader, out: Array[Int],
      blockSize: Int, order: Int): Unit = {
    val method = br.u(2).toInt
    if (method > 1) throw Malformed
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = br.u(4).toInt
    val nParts = 1 << po
    if ((blockSize & (nParts - 1)) != 0) throw Malformed
    val perPart = blockSize >> po
    if (perPart <= order && nParts == 1) throw Malformed
    var i = order
    var part = 0
    while (part < nParts) {
      val n = if (part == 0) perPart - order else perPart
      if (n < 0) throw Malformed
      val param = br.u(pBits).toInt
      if (param == escape) {
        val raw = br.u(5).toInt
        var k = 0
        while (k < n) {
          out(i) = if (raw == 0) 0 else br.s(raw)
          i += 1
          k += 1
        }
      } else {
        var k = 0
        while (k < n) {
          val q = br.unary()
          val v = (q.toLong << param) | br.u(param)
          out(i) = ((v >> 1) ^ -(v & 1)).toInt // zigzag
          i += 1
          k += 1
        }
      }
      part += 1
    }
  }

  // -------------------------------------------------------------------
  // Fixture encoder
  // -------------------------------------------------------------------

  /** One frame's coding directives for the fixture encoder. */
  private[graft] final case class FlacFrameSpec(
      blockSize: Int,
      chAsgn: Int, // 0..7 independent (must match channels−1), 8/9/10 stereo modes
      subframeType: Int, // 0 constant, 1 verbatim, 2 fixed, 3 lpc
      fixedOrder: Int = 2,
      lpcOrder: Int = 2,
      lpcShift: Int = 2,
      riceMethod: Int = 0, // 0 = 4-bit params, 1 = 5-bit
      partOrder: Int = 0,
      riceParam: Int = 4,
      escapePartitions: Boolean = false,
      wastedBits: Int = 0)

  /** Build a spec-valid FLAC stream: STREAMINFO + a PADDING block (the
    * metadata-skip path) + one frame per [[FlacFrameSpec]], samples
    * supplied by `sampleOf(frame, channel, index)` (values must fit
    * bps−wastedBits bits after the wasted-bits shift is peeled — the
    * encoder requires `v % 2^wasted == 0`). Stereo decorrelation specs
    * code the derived side/mid channels; everything round-trips
    * integer-exactly. Returns (bytes, per-channel samples). */
  private[graft] def makeFlac(sampleRate: Int, channels: Int, bps: Int,
      frames: Seq[FlacFrameSpec],
      sampleOf: (Int, Int, Int) => Int,
      variableBlocks: Boolean = false): (Array[Byte], Array[Array[Int]]) = {
    require(sampleRate > 0 && sampleRate < (1 << 20))
    // non-table rates ride the 16-bit uncommon Hz form
    require(RateTable.contains(sampleRate) || sampleRate < 65536)
    require(channels >= 1 && channels <= 8)
    require(Set(8, 12, 16, 20, 24).contains(bps))
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes(StandardCharsets.US_ASCII)
    val total = frames.map(_.blockSize.toLong).sum
    // STREAMINFO (not last)
    val si = new BitWriter(out)
    out += 0x00.toByte
    out += 0x00.toByte; out += 0x00.toByte; out += 34.toByte
    val minBs = frames.map(_.blockSize).min
    val maxBs = frames.map(_.blockSize).max
    si.u(minBs, 16); si.u(maxBs, 16)
    si.u(0, 24); si.u(0, 24) // frame sizes unknown
    si.u(sampleRate, 20)
    si.u(channels - 1, 3)
    si.u(bps - 1, 5)
    si.u(total, 36)
    var i = 0
    while (i < 16) { si.u(0, 8); i += 1 } // md5 unset
    // PADDING block (last) — the skip path
    out += 0x81.toByte
    out += 0x00.toByte; out += 0x00.toByte; out += 4.toByte
    i = 0
    while (i < 4) { out += 0x00.toByte; i += 1 }
    val chansOut = Array.fill(channels)(
      new scala.collection.mutable.ArrayBuffer[Int])
    var samplePos = 0L
    var fi = 0
    while (fi < frames.length) {
      val spec = frames(fi)
      val bs = spec.blockSize
      require(bs >= 16 && bs <= 65536)
      require((bs & ((1 << spec.partOrder) - 1)) == 0,
        "block size must divide by the partition count")
      val stereoMode = spec.chAsgn >= 8
      require(!stereoMode || channels == 2)
      require(stereoMode || spec.chAsgn == channels - 1)
      // raw channel samples for this frame
      val raw = Array.tabulate(channels, bs)((c, k) => sampleOf(fi, c, k))
      raw.foreach(_.foreach { v =>
        require(v >= -(1 << (bps - 1)) && v < (1 << (bps - 1)),
          s"sample $v out of $bps-bit range")
      })
      // coded channels (decorrelated for stereo modes)
      val coded = spec.chAsgn match {
        case 8 => Array(raw(0), // left/side
          Array.tabulate(bs)(k => raw(0)(k) - raw(1)(k)))
        case 9 => Array( // right/side: ch0 = side, ch1 = right
          Array.tabulate(bs)(k => raw(0)(k) - raw(1)(k)), raw(1))
        case 10 => Array( // mid/side
          Array.tabulate(bs)(k => (raw(0)(k) + raw(1)(k)) >> 1),
          Array.tabulate(bs)(k => raw(0)(k) - raw(1)(k)))
        case _ => raw
      }
      val frameStart = out.length
      val bw = new BitWriter(out)
      bw.u(0x3ffe, 14)
      bw.bit(0)
      bw.bit(if (variableBlocks) 1 else 0)
      // block size: prefer a table code, else the 16-bit uncommon form
      val bsCode = bs match {
        case 192 => 1
        case 576 => 2
        case 1152 => 3
        case 2304 => 4
        case 4608 => 5
        case 256 => 8
        case 512 => 9
        case 1024 => 10
        case 2048 => 11
        case 4096 => 12
        case 8192 => 13
        case 16384 => 14
        case 32768 => 15
        case _ => 7
      }
      bw.u(bsCode, 4)
      // sample rate: table code when available, else 16-bit Hz form
      val srCode = RateTable.indexOf(sampleRate) match {
        case -1 => 13
        case c => c
      }
      bw.u(srCode, 4)
      bw.u(spec.chAsgn, 4)
      val bpsCode = bps match {
        case 8 => 1
        case 12 => 2
        case 16 => 4
        case 20 => 5
        case _ => 6
      }
      bw.u(bpsCode, 3)
      bw.bit(0)
      writeCodedNumber(bw, if (variableBlocks) samplePos else fi.toLong)
      if (bsCode == 7) bw.u(bs - 1, 16)
      if (srCode == 13) bw.u(sampleRate, 16)
      // CRC-8 over the header bytes written so far (writer is aligned:
      // every field above totals whole bytes)
      bw.alignByte()
      out += crc8(out.toArray, frameStart, out.length).toByte
      val bw2 = new BitWriter(out)
      var ch = 0
      while (ch < channels) {
        val chBps = bps + (spec.chAsgn match {
          case 8 if ch == 1 => 1
          case 9 if ch == 0 => 1
          case 10 if ch == 1 => 1
          case _ => 0
        })
        encodeSubframe(bw2, coded(ch), spec, chBps)
        ch += 1
      }
      bw2.alignByte()
      val c16 = crc16(out.toArray, frameStart, out.length)
      out += ((c16 >> 8) & 0xff).toByte
      out += (c16 & 0xff).toByte
      var c = 0
      while (c < channels) { chansOut(c) ++= raw(c); c += 1 }
      samplePos += bs
      fi += 1
    }
    (out.toArray, chansOut.map(_.toArray))
  }

  private def encodeSubframe(bw: BitWriter, samples0: Array[Int],
      spec: FlacFrameSpec, bps: Int): Unit = {
    val wasted = spec.wastedBits
    require(wasted >= 0 && wasted < 8)
    val samples =
      if (wasted == 0) samples0
      else samples0.map { v =>
        require((v & ((1 << wasted) - 1)) == 0,
          "wasted-bits samples must be divisible by 2^wasted")
        v >> wasted
      }
    val effBps = bps - wasted
    val bs = samples.length
    bw.bit(0) // padding
    def writeWasted(): Unit =
      if (wasted == 0) bw.bit(0)
      else { bw.bit(1); bw.unary(wasted - 1) }
    spec.subframeType match {
      case 0 => // CONSTANT (caller must supply a constant frame)
        require(samples.forall(_ == samples(0)))
        bw.u(0, 6)
        writeWasted()
        bw.u(samples(0).toLong & ((1L << effBps) - 1), effBps)
      case 1 => // VERBATIM
        bw.u(1, 6)
        writeWasted()
        samples.foreach(v => bw.u(v.toLong & ((1L << effBps) - 1), effBps))
      case 2 => // FIXED
        val order = spec.fixedOrder
        require(order >= 0 && order <= 4 && order < bs)
        bw.u(0x08 | order, 6)
        writeWasted()
        var i = 0
        while (i < order) {
          bw.u(samples(i).toLong & ((1L << effBps) - 1), effBps)
          i += 1
        }
        val resid = new Array[Int](bs)
        i = order
        while (i < bs) {
          resid(i) = samples(i) - (order match {
            case 0 => 0
            case 1 => samples(i - 1)
            case 2 => 2 * samples(i - 1) - samples(i - 2)
            case 3 => 3 * samples(i - 1) - 3 * samples(i - 2) +
              samples(i - 3)
            case _ => 4 * samples(i - 1) - 6 * samples(i - 2) +
              4 * samples(i - 3) - samples(i - 4)
          })
          i += 1
        }
        encodeResidual(bw, resid, bs, order, spec)
      case _ => // LPC
        val order = spec.lpcOrder
        require(order >= 1 && order <= 32 && order < bs)
        require(spec.lpcShift >= 0 && spec.lpcShift <= 3,
          "fixture filter needs 1 << shift to fit 5-bit coefficients")
        bw.u(0x20 | (order - 1), 6)
        writeWasted()
        var i = 0
        while (i < order) {
          bw.u(samples(i).toLong & ((1L << effBps) - 1), effBps)
          i += 1
        }
        // fixture coefficients: a deterministic small-integer filter —
        // decode only needs SOME valid (precision, shift, coefs)
        val precision = 5 // coded as 4 (precision − 1)
        val coefs = Array.tabulate(order)(j =>
          if (j == 0) 1 << spec.lpcShift else (if (j == 1) -3 else j % 5 - 2))
        bw.u(precision - 1, 4)
        bw.u(spec.lpcShift, 5)
        coefs.foreach(cf => bw.u(cf.toLong & ((1L << precision) - 1),
          precision))
        val resid = new Array[Int](bs)
        i = order
        while (i < bs) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * samples(i - 1 - j); j += 1 }
          resid(i) = samples(i) - (acc >> spec.lpcShift).toInt
          i += 1
        }
        encodeResidual(bw, resid, bs, order, spec)
    }
  }

  private def encodeResidual(bw: BitWriter, resid: Array[Int], bs: Int,
      order: Int, spec: FlacFrameSpec): Unit = {
    val method = spec.riceMethod
    require(method == 0 || method == 1)
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = spec.partOrder
    val nParts = 1 << po
    val perPart = bs >> po
    require(perPart > order || nParts > 1)
    bw.u(method, 2)
    bw.u(po, 4)
    var i = order
    var part = 0
    while (part < nParts) {
      val n = if (part == 0) perPart - order else perPart
      if (spec.escapePartitions && part % 2 == 1) {
        // raw 12-bit escape partition
        bw.u(escape, pBits)
        bw.u(12, 5)
        var k = 0
        while (k < n) {
          require(resid(i) >= -2048 && resid(i) < 2048,
            "escape fixture residuals must fit 12 bits")
          bw.u(resid(i).toLong & 0xfff, 12)
          i += 1
          k += 1
        }
      } else {
        val param = spec.riceParam
        require(param >= 0 && param < escape)
        bw.u(param, pBits)
        var k = 0
        while (k < n) {
          val v = resid(i)
          val zz = (v.toLong << 1) ^ (v.toLong >> 63) // zigzag
          val q = (zz >>> param).toInt
          require(q < (1 << 16), s"rice quotient $q too large for fixture")
          bw.unary(q)
          bw.u(zz & ((1L << param) - 1), param)
          i += 1
          k += 1
        }
      }
      part += 1
    }
  }
}
