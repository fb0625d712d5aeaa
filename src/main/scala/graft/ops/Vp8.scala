package graft.ops

import java.nio.charset.StandardCharsets

/** From-scratch VP8 (lossy WebP) KEY-FRAME decode — the r11 stretch
  * extending `neardup_covered` past VP8L, FULL pixel surface since r14
  * (luma + both 4:2:0 chroma planes): the boolean arithmetic coder,
  * key-frame header, coefficient-probability updates, per-macroblock
  * intra modes, the full DCT-token decoder with band/context modeling,
  * inverse WHT + inverse DCT, 16×16 luma / 8×8 chroma intra prediction,
  * and reconstruction, per the public VP8 bitstream spec (RFC 6386). The
  * in-repo fixture encoder [[makeWebpLossy]] emits spec-valid key frames
  * through the same machinery, so the driver gate's planted-formula
  * check exercises the whole chain (a one-coefficient drift anywhere —
  * coder, dequant, WHT, IDCT, prediction — lands on wrong pixels and
  * hash-fails).
  *
  * DOCUMENTED SUBSET (the VP8L discipline — anything outside returns
  * None, never a crash):
  *  - SEGMENTATION (r14, previously the first out-of-subset line):
  *    per-segment quantizer and loop-filter features in absolute or
  *    delta mode (§9.3), the tree-coded per-MB segment map read FIRST
  *    in each MB header (§10), feature data persisted across inter
  *    frames and reset by key frames (libvpx init_frame), and the
  *    libvpx default of segment 0 when the map is not re-coded in a
  *    frame; ALL token-partition layouts (r14: 1/2/4/8
  *    partitions with the §9.5 3-byte size table and row-mod-N
  *    routing — the layout real encoders emit for multithreaded
  *    decode);
  *  - INTER FRAMES via the IVF container (r14, [[decodeIvf]]): all-
  *    inter macroblocks over any reference (last/golden/altref with
  *    refresh/copy plans and sign biases), whole-MB ZERO/NEAREST/NEAR/
  *    NEW modes through the §16.3 near-MV survey, §17.2 MV entropy
  *    (defaults + header updates, persistence honored), sixtap subpel
  *    motion compensation with spec edge clamping, INTRA-coded MBs
  *    inside inter frames — all four 16×16 modes AND B_PRED with its
  *    context-free non-key sub-mode coding (§11.2, updatable probs) —
  *    and SPLITMV (r14: all four §16.2 partition styles, the §17.3
  *    sub-MV reference tree with its five survey contexts, per-block
  *    MC, and round-away-averaged chroma MVs); OUT of subset: MVs
  *    beyond the §16.3 clamp window — whole-MB NEW or split block MVs
  *    that the reference decoder would prediction-time-clamp
  *    (need_to_clamp) — rejected (None), never approximated;
  *  - BOTH loop filters (r12 "What's missing" #2 — real-world encoders
  *    virtually always leave the filter on): normal and simple, all
  *    levels and sharpnesses, with the mode/ref level deltas parsed and
  *    applied (INTRA ref delta + B_PRED mode delta — the complete set
  *    for an all-intra key frame) and the eobtotal==0 interior-edge
  *    skip rule ([[loopFilterLuma]]);
  *  - all four 16×16 intra modes, plus B_PRED with ALL TEN 4×4
  *    sub-modes (r13: VE and the five diagonals joined DC/TM/HE, with
  *    the §12.3 above-right sourcing — column-3 subblocks read the row
  *    above the MACROBLOCK). One residual line: an above-right-reading
  *    sub-mode in column 3 of the frame's rightmost macroblock below
  *    the top row needs the off-frame replacement convention this
  *    environment can't validate → None, never approximated;
  *  - FULL chroma reconstruction (r14, closing the last luma-only
  *    caveat): UV dequant with the §14.1 132-cap on the DC factor, all
  *    four 8×8 chroma intra modes on the kf uv-mode tree, per-plane
  *    4:2:0 reconstruction, chroma coefficients counted into the
  *    eobtotal==0 filter-skip rule, and the §15 chroma loop-filter taps
  *    (normal filter only — §15.1 scopes the simple filter to luma).
  *
  * Fidelity note, stated plainly: the bitstream MACHINERY (coder, trees,
  * bands, contexts, zigzag, quantizer rules, transforms, prediction)
  * follows RFC 6386; the large probability CONSTANT tables
  * ([[DefaultCoeffProbs]], [[CoeffUpdateProbs]]) are keyed from the spec
  * but cannot be validated against external encoders in this build
  * environment (no VP8 corpus, no codec libs). Encoder and decoder share
  * them, and boolean arithmetic coding round-trips EXACTLY under any
  * probability model, so every in-repo decode is insensitive to their
  * values; decoding third-party VP8 files additionally requires the
  * constants to be digit-perfect and is therefore not claimed.
  */
object Vp8 {

  // -------------------------------------------------------------------
  // Boolean arithmetic coder (RFC 6386 §7/8)
  // -------------------------------------------------------------------

  /** Structural-violation sentinel, caught at the decode boundary. */
  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class BoolDecoder(buf: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var range = 255
    private var value = 0
    private var bitCount = 0
    // two-byte priming read (zeros past the end, as the spec's reference
    // decoder does for its final bytes)
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int =
      if (pos < end) { val b = buf(pos) & 0xff; pos += 1; b }
      else { pos += 1; 0 }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }

    /** n-bit literal, MSB first, each bit at probability 128. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** Flag + magnitude-and-sign form used by the quantizer deltas. */
    def signedLiteralIfFlag(n: Int): Int =
      if (bool(128) == 0) 0
      else { val v = literal(n); if (bool(128) == 1) -v else v }
  }

  private final class BoolEncoder {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var range = 255
    private var bottom = 0L // uint32 semantics, masked after shifts
    private var bitCount = 24

    private def carry(): Unit = {
      var i = out.length - 1
      while (i >= 0 && out(i) == -1) { out(i) = 0; i -= 1 }
      if (i >= 0) out(i) = (out(i) + 1).toByte
      // a carry out of an empty buffer cannot occur: bottom's written
      // prefix always starts below 0xff (coder invariant)
    }

    def bool(prob: Int, bit: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { bottom += split; range -= split }
      else range = split
      if ((bottom >>> 32) != 0) { carry(); bottom &= 0xffffffffL }
      while (range < 128) {
        range <<= 1
        if ((bottom & 0x80000000L) != 0) carry()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out += ((bottom >>> 24) & 0xff).toByte
          bottom &= 0xffffffL
          bitCount = 8
        }
      }
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }

    /** RFC 6386 §8.3 stop_encode, translated literally. */
    def flush(): Array[Byte] = {
      var c = bitCount
      var v = bottom
      if ((v & (1L << (32 - c))) != 0) carry()
      v = (v << (c & 7)) & 0xffffffffL
      c >>= 3
      while (c > 0) { v = (v << 8) & 0xffffffffL; c -= 1 }
      c = 4
      while (c > 0) {
        out += ((v >>> 24) & 0xff).toByte
        v = (v << 8) & 0xffffffffL
        c -= 1
      }
      out.toArray
    }
  }

  // -------------------------------------------------------------------
  // Constant tables (RFC 6386; see the fidelity note above)
  // -------------------------------------------------------------------

  // DCT token ids
  private final val TokZero = 0
  private final val TokEob = 11

  /** Token tree; leaf = -(token + 1), internal = next pair index. */
  private val CoeffTree: Array[Int] = Array(
    -(TokEob + 1), 2,
    -(TokZero + 1), 4,
    -(1 + 1), 6,
    8, 12,
    -(2 + 1), 10,
    -(3 + 1), -(4 + 1),
    14, 16,
    -(5 + 1), -(6 + 1),
    18, 20,
    -(7 + 1), -(8 + 1),
    -(9 + 1), -(10 + 1))

  /** token -> root-to-leaf (nodeIndex, bit) path, for the encoder. */
  private val TokenPaths: Array[Array[(Int, Int)]] = {
    val paths = new Array[Array[(Int, Int)]](12)
    def walk(node: Int, acc: List[(Int, Int)]): Unit = {
      var b = 0
      while (b < 2) {
        val t = CoeffTree(node + b)
        if (t <= 0) paths(-t - 1) = (acc :+ (node, b)).toArray
        else walk(t, acc :+ (node, b))
        b += 1
      }
    }
    walk(0, Nil)
    paths
  }

  private val CatBase = Array(5, 7, 11, 19, 35, 67) // cat1..cat6
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  private val CoeffBands =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  private val Zigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Key-frame luma-mode tree {-B, 2, 4, 6, -DC, -V, -H, -TM} with probs
    * {145, 156, 163, 128}; chroma tree {-DC, 2, -V, 4, -H, -TM} with kf
    * probs {142, 114, 183}. Only the DC paths are emitted by the fixture
    * encoder; the decoder walks the full trees. */
  private val KfYModeProb = Array(145, 156, 163, 128)
  private val KfUvModeProb = Array(142, 114, 183)

  private final val ModeDc = 0
  private final val ModeV = 1
  private final val ModeH = 2
  private final val ModeTm = 3
  private final val ModeB = 4

  /** 4×4 sub-mode ids for B_PRED — SPEC ids throughout since r13, with
    * ALL TEN §12.3 predictors implemented ([[predict4]]): DC 0, TM 1,
    * VE 2, HE 3, LD 4, RD 5, VR 6, VL 7, HD 8, HU 9. The one residual
    * subset line: an above-right-reading sub-mode (VE/LD/VL) in column
    * 3 of the frame's RIGHTMOST macroblock below the top row needs the
    * off-frame above-right replacement convention, which this build
    * environment cannot validate — rejected (None), never approximated
    * ([[bPredAboveRight]]). Tree per RFC 6386 §11.2 (leaf =
    * -(mode + 1)); the 10×10 context probability table is synthesized
    * in-range rather than keyed digit-perfect (the [[CoeffUpdateProbs]]
    * fidelity note applies — round-trip exact, third-party decode
    * already not claimed). */
  private final val BModeDc = 0
  private final val BModeTm = 1
  private final val BModeHu = 9
  private val DummyAr = Array(0, 0, 0, 0)
  // RFC order: DC, TM, VE, HE, LD, RD, VR, VL, HD, HU — leaves encode
  // the SPEC ids
  private val BModeTree: Array[Int] = Array(
    -(0 + 1), 2, // B_DC "0"
    -(1 + 1), 4, // B_TM "10"
    -(2 + 1), 6, // B_VE "110"
    8, 12,
    -(3 + 1), 10, // B_HE "11100"
    -(5 + 1), -(6 + 1), // B_RD "111010", B_VR "111011"
    -(4 + 1), 14, // B_LD "111100"
    -(7 + 1), 16, // B_VL "1111010"
    -(8 + 1), -(9 + 1)) // B_HD / B_HU

  /** spec-id → root-to-leaf path over [[BModeTree]], for the encoder. */
  private val BModePaths: Array[Array[(Int, Int)]] = {
    val paths = new Array[Array[(Int, Int)]](10)
    def walk(node: Int, acc: List[(Int, Int)]): Unit = {
      var b = 0
      while (b < 2) {
        val t = BModeTree(node + b)
        if (t <= 0) paths(-t - 1) = (acc :+ (node, b)).toArray
        else walk(t, acc :+ (node, b))
        b += 1
      }
    }
    walk(0, Nil)
    paths
  }

  /** Context probs [aboveSpecMode][leftSpecMode][9] — synthesized
    * deterministic in-range values (see the subset note above). */
  private val KfBModeProbs: Array[Array[Array[Int]]] =
    Array.tabulate(10, 10, 9) { (a, l, i) =>
      40 + ((a * 53 + l * 29 + i * 17) % 180)
    }

  /** Quantizer lookups (RFC 6386 §14.1). Index 4 (the fixture's qindex)
    * is load-bearing for the planted math: dc_qlookup(4) = 8. */
  private val DcQLookup: Array[Int] = Array(
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157)

  private val AcQLookup: Array[Int] = Array(
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284)

  /** Default DCT coefficient probabilities
    * [blockType][band][ctx][11 tree probs]; block types: 0 = Y after Y2,
    * 1 = Y2, 2 = chroma, 3 = Y without Y2. Keyed from RFC 6386 §13.5 —
    * see the fidelity note in the object scaladoc. */
  private val DefaultCoeffProbs: Array[Array[Array[Array[Int]]]] = {
    // a band row shared by construction where the spec repeats the
    // saturated pattern (high bands are dominated by 255/128 fills)
    def row(a: Int*): Array[Int] = a.toArray
    val sat = Array(
      row(255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
      row(255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
      row(255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128))
    val t0 = Array(
      Array(
        row(253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128),
        row(189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128),
        row(106, 126, 227, 252, 214, 168, 255, 201, 128, 128, 128)),
      Array(
        row(1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128),
        row(181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128),
        row(78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128)),
      Array(
        row(1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128),
        row(184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128),
        row(77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128)),
      Array(
        row(1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128),
        row(170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128),
        row(37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128)),
      Array(
        row(1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128),
        row(207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128),
        row(102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128)),
      Array(
        row(1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128),
        row(177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128),
        row(80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128)),
      Array(
        row(1, 1, 243, 255, 254, 255, 128, 128, 128, 128, 128),
        row(238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        row(75, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
      sat)
    val t1 = Array(
      Array(
        row(198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62),
        row(131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1),
        row(68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128)),
      Array(
        row(1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128),
        row(184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128),
        row(81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128)),
      Array(
        row(1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128),
        row(99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128),
        row(23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128)),
      Array(
        row(1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128),
        row(109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128),
        row(44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128)),
      Array(
        row(1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128),
        row(94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128),
        row(22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128)),
      Array(
        row(1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128),
        row(124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128),
        row(35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128)),
      Array(
        row(1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128),
        row(121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128),
        row(45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128)),
      Array(
        row(1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128),
        row(203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128),
        row(137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128)))
    val t2 = Array(
      Array(
        row(253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128),
        row(175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128),
        row(73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128)),
      Array(
        row(1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128),
        row(239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128),
        row(155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128)),
      Array(
        row(1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128),
        row(201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128),
        row(69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128)),
      Array(
        row(1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128),
        row(223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128),
        row(141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128)),
      Array(
        row(1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128),
        row(190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128),
        row(149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
      Array(
        row(1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        row(247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        row(240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
      Array(
        row(1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128),
        row(213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128),
        row(55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
      sat)
    val t3 = Array(
      Array(
        row(202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255),
        row(126, 38, 166, 203, 150, 165, 226, 161, 255, 244, 128),
        row(61, 46, 138, 188, 135, 122, 200, 145, 255, 255, 128)),
      Array(
        row(1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128),
        row(166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128),
        row(39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128)),
      Array(
        row(1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128),
        row(124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128),
        row(24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128)),
      Array(
        row(1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128),
        row(149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128),
        row(28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128)),
      Array(
        row(1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128),
        row(123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128),
        row(20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128)),
      Array(
        row(1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128),
        row(168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128),
        row(47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128)),
      Array(
        row(1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128),
        row(141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128),
        row(42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128)),
      Array(
        row(1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        row(244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        row(238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)))
    Array(t0, t1, t2, t3)
  }

  /** Coefficient-probability UPDATE probabilities (the bool prior for
    * "this entry is replaced in the header") — overwhelmingly 255 in the
    * spec; keyed per the fidelity note. */
  private val CoeffUpdateProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (t, b, c, l) =>
      // the spec's non-255 priors concentrate in the first bands' first
      // tree positions; this keys the dominant saturated structure
      if (b == 0 && l == 0) 250
      else if (b <= 1 && l <= 2) 254
      else 255
    }

  // -------------------------------------------------------------------
  // Transforms (RFC 6386 §14.3/14.4, integer-exact)
  // -------------------------------------------------------------------

  /** Inverse Walsh-Hadamard (Y2): input 16 dequantized coefficients,
    * output the 16 per-subblock DC values in raster order. */
  private def inverseWht(ip: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = ip(i) + ip(12 + i)
      val b1 = ip(4 + i) + ip(8 + i)
      val c1 = ip(4 + i) - ip(8 + i)
      val d1 = ip(i) - ip(12 + i)
      tmp(i) = a1 + b1
      tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1
      tmp(12 + i) = d1 - c1
      i += 1
    }
    val op = new Array[Int](16)
    i = 0
    while (i < 4) { // rows
      val base = 4 * i
      val a1 = tmp(base) + tmp(base + 3)
      val b1 = tmp(base + 1) + tmp(base + 2)
      val c1 = tmp(base + 1) - tmp(base + 2)
      val d1 = tmp(base) - tmp(base + 3)
      op(base) = (a1 + b1 + 3) >> 3
      op(base + 1) = (c1 + d1 + 3) >> 3
      op(base + 2) = (a1 - b1 + 3) >> 3
      op(base + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
    op
  }

  private final val SinPi8Sqrt2 = 35468
  private final val CosPi8Sqrt2Minus1 = 20091

  /** Inverse 4×4 DCT: 16 dequantized coefficients (natural order) → 16
    * residuals. */
  private def inverseDct(ip: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = ip(i) + ip(8 + i)
      val b1 = ip(i) - ip(8 + i)
      var t1 = (ip(4 + i) * SinPi8Sqrt2) >> 16
      var t2 = ip(12 + i) + ((ip(12 + i) * CosPi8Sqrt2Minus1) >> 16)
      val c1 = t1 - t2
      t1 = ip(4 + i) + ((ip(4 + i) * CosPi8Sqrt2Minus1) >> 16)
      t2 = (ip(12 + i) * SinPi8Sqrt2) >> 16
      val d1 = t1 + t2
      tmp(i) = a1 + d1
      tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1
      tmp(8 + i) = b1 - c1
      i += 1
    }
    val op = new Array[Int](16)
    i = 0
    while (i < 4) { // rows
      val base = 4 * i
      val a1 = tmp(base) + tmp(base + 2)
      val b1 = tmp(base) - tmp(base + 2)
      var t1 = (tmp(base + 1) * SinPi8Sqrt2) >> 16
      var t2 = tmp(base + 3) + ((tmp(base + 3) * CosPi8Sqrt2Minus1) >> 16)
      val c1 = t1 - t2
      t1 = tmp(base + 1) + ((tmp(base + 1) * CosPi8Sqrt2Minus1) >> 16)
      t2 = (tmp(base + 3) * SinPi8Sqrt2) >> 16
      val d1 = t1 + t2
      op(base) = (a1 + d1 + 4) >> 3
      op(base + 3) = (a1 - d1 + 4) >> 3
      op(base + 1) = (b1 + c1 + 4) >> 3
      op(base + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
    op
  }

  // -------------------------------------------------------------------
  // Token layer (shared by encode and decode)
  // -------------------------------------------------------------------

  /** Decode one block's tokens. `levels` receives quantized levels in
    * NATURAL (un-zigzagged) position order; returns true iff any level
    * is nonzero. */
  private def decodeBlockTokens(bd: BoolDecoder,
      probs: Array[Array[Array[Int]]], firstCoeff: Int, ctx0: Int,
      levels: Array[Int]): Boolean = {
    java.util.Arrays.fill(levels, 0)
    var i = firstCoeff
    var ctx = ctx0
    var prevZero = false
    var nonzero = false
    var done = false
    while (!done && i < 16) {
      val p = probs(CoeffBands(i))(ctx)
      var node = if (prevZero) 2 else 0
      var token = -1
      while (token < 0) {
        val t = CoeffTree(node + bd.bool(p(node >> 1)))
        if (t <= 0) token = -t - 1 else node = t
      }
      if (token == TokEob) done = true
      else if (token == TokZero) {
        prevZero = true; ctx = 0; i += 1
      } else {
        var v =
          if (token <= 4) token
          else {
            val cat = token - 5
            var extra = 0
            val cp = CatProbs(cat)
            var k = 0
            while (k < cp.length) { extra = (extra << 1) | bd.bool(cp(k)); k += 1 }
            CatBase(cat) + extra
          }
        if (bd.bool(128) == 1) v = -v
        levels(Zigzag(i)) = v
        nonzero = true
        prevZero = false
        ctx = if (v == 1 || v == -1) 1 else 2
        i += 1
      }
    }
    nonzero
  }

  /** Encode one block's tokens; `scanLevels` is in SCAN order (the
    * encoder's natural representation), positions firstCoeff..15. */
  private def encodeBlockTokens(be: BoolEncoder,
      probs: Array[Array[Array[Int]]], firstCoeff: Int, ctx0: Int,
      scanLevels: Array[Int]): Boolean = {
    var last = -1
    var i = firstCoeff
    while (i < 16) { if (scanLevels(i) != 0) last = i; i += 1 }
    var ctx = ctx0
    var prevZero = false
    i = firstCoeff
    def emitToken(token: Int, p: Array[Int]): Unit = {
      val path = TokenPaths(token)
      var k = if (prevZero) 1 else 0 // skip the EOB branch after a zero
      while (k < path.length) {
        val (node, bit) = path(k)
        be.bool(p(node >> 1), bit)
        k += 1
      }
    }
    while (i <= last) {
      val p = probs(CoeffBands(i))(ctx)
      val v = scanLevels(i)
      val a = math.abs(v)
      val token =
        if (a <= 4) a
        else {
          // largest category token whose base value is <= |level|
          var tk = 5
          while (tk < 10 && a >= CatBase(tk - 5 + 1)) tk += 1
          tk
        }
      emitToken(token, p)
      if (a == 0) { prevZero = true; ctx = 0 }
      else {
        if (a >= 5) {
          val cat = token - 5
          val extra = a - CatBase(cat)
          val cp = CatProbs(cat)
          var k = 0
          while (k < cp.length) {
            be.bool(cp(k), (extra >> (cp.length - 1 - k)) & 1)
            k += 1
          }
        }
        be.bool(128, if (v < 0) 1 else 0)
        prevZero = false
        ctx = if (a == 1) 1 else 2
      }
      i += 1
    }
    if (last < 15) {
      val p = probs(CoeffBands(if (last < firstCoeff) firstCoeff else last + 1))(ctx)
      // EOB is the root's 0-branch; prevZero can't be true here (a
      // trailing zero can't be `last`), except the all-zero case where
      // no token was emitted at all
      emitToken(TokEob, p)
    }
    last >= firstCoeff
  }

  // -------------------------------------------------------------------
  // Decoder
  // -------------------------------------------------------------------

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clampQ(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v
  private def c128(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

  /** In-loop deblocking filter (RFC 6386 §15) for one key-frame plane,
    * both filter types (0 = normal, 1 = simple). `size` is the plane's
    * macroblock span: 16 for luma (interior edges at 4/8/12), 8 for a
    * 4:2:0 chroma plane (one interior edge at 4). Callers apply the
    * simple filter to LUMA ONLY, per §15.1. Applied to the padded plane
    * in macroblock raster order AFTER full-frame reconstruction — intra
    * prediction reads the UNfiltered neighbors, the filter output is
    * what's displayed (and what would seed inter prediction). Per MB:
    * left edge (when a left neighbor exists), interior vertical edges,
    * top edge (when an above neighbor exists), interior horizontal
    * edges — interior edges only when the MB is B_PRED or decoded any
    * nonzero coefficient in ANY of its 24/25 blocks (`mbInner`, the
    * eobtotal==0 forced-skip rule). Shared verbatim by the decoder and
    * the fixture encoder's reconstruction simulation; the pixel
    * arithmetic itself is additionally pinned by hand-computed edge
    * fixtures in OpsSpec (spec formulas evaluated by hand, not by this
    * code). All taps run on the padded plane, as the reference decoder
    * does — display cropping happens after filtering. */
  private[graft] def loopFilterPlane(plane: Array[Int], stride: Int,
      mbCols: Int, mbRows: Int, size: Int, filterType: Int, sharpness: Int,
      mbLevel: Array[Int], mbInner: Array[Boolean],
      keyFrame: Boolean = true): Unit = {
    def u2s(v: Int): Int = v - 128
    def s2u(v: Int): Int = c128(v) + 128
    // edge taps addressed from q0's index `p` with step `d` (1 for a
    // vertical edge, stride for a horizontal one)
    def mask(i: Int, e: Int, p: Int, d: Int): Boolean = {
      val p3 = plane(p - 4 * d); val p2 = plane(p - 3 * d)
      val p1 = plane(p - 2 * d); val p0 = plane(p - d)
      val q0 = plane(p); val q1 = plane(p + d)
      val q2 = plane(p + 2 * d); val q3 = plane(p + 3 * d)
      math.abs(p3 - p2) <= i && math.abs(p2 - p1) <= i &&
        math.abs(p1 - p0) <= i && math.abs(q3 - q2) <= i &&
        math.abs(q2 - q1) <= i && math.abs(q1 - q0) <= i &&
        math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= e
    }
    def hev(t: Int, p: Int, d: Int): Boolean =
      math.abs(plane(p - 2 * d) - plane(p - d)) > t ||
        math.abs(plane(p + d) - plane(p)) > t
    def commonAdjust(useOuter: Boolean, p: Int, d: Int): Int = {
      val pp1 = u2s(plane(p - 2 * d)); val pp0 = u2s(plane(p - d))
      val qq0 = u2s(plane(p)); val qq1 = u2s(plane(p + d))
      val a = c128((if (useOuter) c128(pp1 - qq1) else 0) + 3 * (qq0 - pp0))
      val f = c128(a + 4) >> 3
      val e = c128(a + 3) >> 3
      plane(p) = s2u(qq0 - f)
      plane(p - d) = s2u(pp0 + e)
      f
    }
    def subblockFilter(hevT: Int, i: Int, e: Int, p: Int, d: Int): Unit =
      if (mask(i, e, p, d)) {
        val hv = hev(hevT, p, d)
        var f = commonAdjust(hv, p, d)
        if (!hv) {
          f = (f + 1) >> 1
          plane(p + d) = s2u(u2s(plane(p + d)) - f)
          plane(p - 2 * d) = s2u(u2s(plane(p - 2 * d)) + f)
        }
      }
    def mbFilter(hevT: Int, i: Int, e: Int, p: Int, d: Int): Unit =
      if (mask(i, e, p, d)) {
        if (!hev(hevT, p, d)) {
          val p2 = u2s(plane(p - 3 * d)); val p1 = u2s(plane(p - 2 * d))
          val p0 = u2s(plane(p - d)); val q0 = u2s(plane(p))
          val q1 = u2s(plane(p + d)); val q2 = u2s(plane(p + 2 * d))
          val w = c128(c128(p1 - q1) + 3 * (q0 - p0))
          var a = c128((27 * w + 63) >> 7)
          plane(p) = s2u(q0 - a); plane(p - d) = s2u(p0 + a)
          a = c128((18 * w + 63) >> 7)
          plane(p + d) = s2u(q1 - a); plane(p - 2 * d) = s2u(p1 + a)
          a = c128((9 * w + 63) >> 7)
          plane(p + 2 * d) = s2u(q2 - a); plane(p - 3 * d) = s2u(p2 + a)
        } else commonAdjust(useOuter = true, p, d): Unit
      }
    def simpleSegment(e: Int, p: Int, d: Int): Unit =
      if (math.abs(plane(p - d) - plane(p)) * 2 +
        math.abs(plane(p - 2 * d) - plane(p + d)) / 2 <= e)
        commonAdjust(useOuter = true, p, d): Unit
    var my = 0
    while (my < mbRows) {
      var mx = 0
      while (mx < mbCols) {
        val lvl = mbLevel(my * mbCols + mx)
        if (lvl > 0) {
          // §15.1 limit derivation, shared by both filter types
          var interior = lvl
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior < 1) interior = 1
          // §15.2 high-edge-variance thresholds differ by frame type:
          // key frames have no 20..39 band and cap at 2
          val hevT =
            if (keyFrame) { if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0 }
            else if (lvl >= 40) 3
            else if (lvl >= 20) 2
            else if (lvl >= 15) 1
            else 0
          val mbE = 2 * (lvl + 2) + interior
          val sbE = 2 * lvl + interior
          val inner = mbInner(my * mbCols + mx)
          val x0 = mx * size
          val y0 = my * size
          // edge order per §15: left, interior vertical (l→r), top,
          // interior horizontal (t→b)
          if (filterType == 0) {
            if (mx > 0) {
              var r = 0
              while (r < size) {
                mbFilter(hevT, interior, mbE, (y0 + r) * stride + x0, 1)
                r += 1
              }
            }
            if (inner) {
              var ce = 4
              while (ce < size) {
                var r = 0
                while (r < size) {
                  subblockFilter(hevT, interior, sbE,
                    (y0 + r) * stride + x0 + ce, 1)
                  r += 1
                }
                ce += 4
              }
            }
            if (my > 0) {
              var cc = 0
              while (cc < size) {
                mbFilter(hevT, interior, mbE, y0 * stride + x0 + cc, stride)
                cc += 1
              }
            }
            if (inner) {
              var re = 4
              while (re < size) {
                var cc = 0
                while (cc < size) {
                  subblockFilter(hevT, interior, sbE,
                    (y0 + re) * stride + x0 + cc, stride)
                  cc += 1
                }
                re += 4
              }
            }
          } else {
            if (mx > 0) {
              var r = 0
              while (r < size) {
                simpleSegment(mbE, (y0 + r) * stride + x0, 1); r += 1
              }
            }
            if (inner) {
              var ce = 4
              while (ce < size) {
                var r = 0
                while (r < size) {
                  simpleSegment(sbE, (y0 + r) * stride + x0 + ce, 1); r += 1
                }
                ce += 4
              }
            }
            if (my > 0) {
              var cc = 0
              while (cc < size) {
                simpleSegment(mbE, y0 * stride + x0 + cc, stride); cc += 1
              }
            }
            if (inner) {
              var re = 4
              while (re < size) {
                var cc = 0
                while (cc < size) {
                  simpleSegment(sbE, (y0 + re) * stride + x0 + cc, stride)
                  cc += 1
                }
                re += 4
              }
            }
          }
        }
        mx += 1
      }
      my += 1
    }
  }

  /** True iff the spec sub-mode reads the above-right pixels A[4..7]:
    * B_VE (2), B_LD (4), B_VL (7). */
  private def bModeUsesAr(spec: Int): Boolean =
    spec == 2 || spec == 4 || spec == 7

  /** Above-right pixels A[4..7] for the B_PRED subblock (bc, br) of
    * macroblock (mx, my) — the §12.3 sourcing rules:
    *  - columns 0-2: the 4 pixels directly above-right in the plane
    *    (the subblock above-right is already reconstructed in raster
    *    order; the frame-top border row is 127);
    *  - column 3: the true above-right lives in the NEXT macroblock
    *    (not yet reconstructed), so ALL rows take the row above the
    *    MACROBLOCK at x ∈ [px+16, px+19] — the above-RIGHT macroblock's
    *    bottom row (127 border on the top macroblock row);
    *  - column 3 of the frame's RIGHTMOST macroblock below the top row:
    *    those pixels are off-frame, and the replacement convention is
    *    the one §12.3 rule this build environment cannot validate — the
    *    subset line: rejected (None), never approximated. */
  private def bPredAboveRight(plane: Array[Int], stride: Int, mbCols: Int,
      mx: Int, my: Int, bc: Int, bx: Int, by: Int): Array[Int] = {
    val out = new Array[Int](4)
    if (bc < 3) {
      if (by == 0) { out(0) = 127; out(1) = 127; out(2) = 127; out(3) = 127 }
      else {
        var i = 0
        while (i < 4) { out(i) = plane((by - 1) * stride + bx + 4 + i); i += 1 }
      }
    } else {
      if (my == 0) { out(0) = 127; out(1) = 127; out(2) = 127; out(3) = 127 }
      else if (mx == mbCols - 1) throw Malformed // off-frame above-right
      else {
        val py = my * 16
        val px = mx * 16
        var i = 0
        while (i < 4) { out(i) = plane((py - 1) * stride + px + 16 + i); i += 1 }
      }
    }
    out
  }

  /** 4×4 intra prediction, ALL TEN §12.3 sub-modes (spec ids 0-9:
    * DC/TM/VE/HE/LD/RD/VR/VL/HD/HU), for the subblock at plane position
    * (x, y). Reads only already-reconstructed pixels plus the RFC
    * border fills (127 above row incl. the origin corner, 129 left
    * column); `ar` is the caller-resolved above-right quad
    * ([[bPredAboveRight]]). B_DC is the UNCONDITIONAL 8-pixel
    * border-backed average (§12.3's reference code — unlike the 16×16
    * DC's partial-average special cases, fixed r13). Shared by the
    * decoder and the fixture encoder's reconstruction simulation; the
    * diagonal tap layouts follow the public reference decoder. */
  private def predict4(plane: Array[Int], stride: Int, x: Int, y: Int,
      spec: Int, ar: Array[Int]): Array[Int] = {
    val out = new Array[Int](16)
    val haveA = y > 0
    val haveL = x > 0
    val a = new Array[Int](8)
    var i = 0
    while (i < 4) {
      a(i) = if (haveA) plane((y - 1) * stride + x + i) else 127
      a(4 + i) = ar(i)
      i += 1
    }
    val l = new Array[Int](4)
    i = 0
    while (i < 4) {
      l(i) = if (haveL) plane((y + i) * stride + x - 1) else 129
      i += 1
    }
    // corner fill per the RFC border: 127-row incl. origin, 129-column
    val tl =
      if (haveA && haveL) plane((y - 1) * stride + x - 1)
      else if (haveA) 129 else 127
    @inline def s(r: Int, c: Int, v: Int): Unit = out(r * 4 + c) = v
    @inline def f3(p: Int, q: Int, r: Int): Int = (p + 2 * q + r + 2) >> 2
    @inline def f2(p: Int, q: Int): Int = (p + q + 1) >> 1
    // the 9-pixel clockwise edge L3..L0, P, A0..A3 the RD/VR/HD modes
    // walk (allocated lazily only for those modes)
    def pp: Array[Int] =
      Array(l(3), l(2), l(1), l(0), tl, a(0), a(1), a(2), a(3))
    spec match {
      case 0 => // B_DC: unconditional 8-pixel average over the borders
        var v = 4
        var k = 0
        while (k < 4) { v += a(k) + l(k); k += 1 }
        java.util.Arrays.fill(out, v >> 3)
      case 1 => // B_TM
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { s(r, c, clamp255(l(r) + a(c) - tl)); c += 1 }
          r += 1
        }
      case 2 => // B_VE: filtered vertical (uses P and A4)
        val t = Array(f3(tl, a(0), a(1)), f3(a(0), a(1), a(2)),
          f3(a(1), a(2), a(3)), f3(a(2), a(3), a(4)))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { s(r, c, t(c)); c += 1 }
          r += 1
        }
      case 3 => // B_HE: filtered horizontal, last row doubles L3
        val rows = Array(f3(tl, l(0), l(1)), f3(l(0), l(1), l(2)),
          f3(l(1), l(2), l(3)), f3(l(2), l(3), l(3)))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { s(r, c, rows(r)); c += 1 }
          r += 1
        }
      case 4 => // B_LD: down-left over A0..A7
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = r + c
            s(r, c, if (k == 6) (a(6) + 3 * a(7) + 2) >> 2
              else f3(a(k), a(k + 1), a(k + 2)))
            c += 1
          }
          r += 1
        }
      case 5 => // B_RD: down-right along the clockwise edge
        val e = pp
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = 3 + c - r
            s(r, c, f3(e(k), e(k + 1), e(k + 2)))
            c += 1
          }
          r += 1
        }
      case 6 => // B_VR
        val e = pp
        s(3, 0, f3(e(1), e(2), e(3)))
        s(2, 0, f3(e(2), e(3), e(4)))
        val v31 = f3(e(3), e(4), e(5)); s(3, 1, v31); s(1, 0, v31)
        val v21 = f2(e(4), e(5)); s(2, 1, v21); s(0, 0, v21)
        val v32 = f3(e(4), e(5), e(6)); s(3, 2, v32); s(1, 1, v32)
        val v22 = f2(e(5), e(6)); s(2, 2, v22); s(0, 1, v22)
        val v33 = f3(e(5), e(6), e(7)); s(3, 3, v33); s(1, 2, v33)
        val v23 = f2(e(6), e(7)); s(2, 3, v23); s(0, 2, v23)
        s(1, 3, f3(e(6), e(7), e(8)))
        s(0, 3, f2(e(7), e(8)))
      case 7 => // B_VL over A0..A7
        s(0, 0, f2(a(0), a(1)))
        s(1, 0, f3(a(0), a(1), a(2)))
        val v20 = f2(a(1), a(2)); s(2, 0, v20); s(0, 1, v20)
        val v11 = f3(a(1), a(2), a(3)); s(1, 1, v11); s(3, 0, v11)
        val v21 = f2(a(2), a(3)); s(2, 1, v21); s(0, 2, v21)
        val v31 = f3(a(2), a(3), a(4)); s(3, 1, v31); s(1, 2, v31)
        val v22 = f2(a(3), a(4)); s(2, 2, v22); s(0, 3, v22)
        val v32 = f3(a(3), a(4), a(5)); s(3, 2, v32); s(1, 3, v32)
        s(2, 3, f3(a(4), a(5), a(6)))
        s(3, 3, f3(a(5), a(6), a(7)))
      case 8 => // B_HD
        val e = pp
        s(3, 0, f2(e(0), e(1)))
        s(3, 1, f3(e(0), e(1), e(2)))
        val v20 = f2(e(1), e(2)); s(2, 0, v20); s(3, 2, v20)
        val v21 = f3(e(1), e(2), e(3)); s(2, 1, v21); s(3, 3, v21)
        val v22 = f2(e(2), e(3)); s(2, 2, v22); s(1, 0, v22)
        val v23 = f3(e(2), e(3), e(4)); s(2, 3, v23); s(1, 1, v23)
        val v12 = f2(e(3), e(4)); s(1, 2, v12); s(0, 0, v12)
        val v13 = f3(e(3), e(4), e(5)); s(1, 3, v13); s(0, 1, v13)
        s(0, 2, f3(e(4), e(5), e(6)))
        s(0, 3, f3(e(5), e(6), e(7)))
      case _ => // B_HU (9): horizontal-up over L only
        s(0, 0, f2(l(0), l(1)))
        s(0, 1, f3(l(0), l(1), l(2)))
        val v02 = f2(l(1), l(2)); s(0, 2, v02); s(1, 0, v02)
        val v03 = f3(l(1), l(2), l(3)); s(0, 3, v03); s(1, 1, v03)
        val v12 = f2(l(2), l(3)); s(1, 2, v12); s(2, 0, v12)
        val v13 = f3(l(2), l(3), l(3)); s(1, 3, v13); s(2, 1, v13)
        s(2, 2, l(3)); s(2, 3, l(3))
        s(3, 0, l(3)); s(3, 1, l(3)); s(3, 2, l(3)); s(3, 3, l(3))
    }
    out
  }

  /** 8×8 chroma intra prediction + residual add (RFC 6386 §12.2): the
    * same DC/V/H/TM rules as the 16×16 luma modes at half size, with the
    * same 127-above / 129-left missing-edge fills, predicting from the
    * already-reconstructed (unfiltered) chroma neighbors. Shared by the
    * decoder and the fixture encoder's reconstruction simulation. */
  private def predictReconChroma(plane: Array[Int], stride: Int,
      mx: Int, my: Int, mode: Int, resid: Array[Int]): Unit = {
    val px = mx * 8
    val py = my * 8
    val haveA = my > 0
    val haveL = mx > 0
    val pred = new Array[Int](64)
    mode match {
      case ModeDc =>
        var sum = 0
        var n = 0
        if (haveA) { var i = 0; while (i < 8) { sum += plane((py - 1) * stride + px + i); i += 1 }; n += 8 }
        if (haveL) { var i = 0; while (i < 8) { sum += plane((py + i) * stride + px - 1); i += 1 }; n += 8 }
        val dc = if (n == 0) 128 else (sum + n / 2) >> (if (n == 16) 4 else 3)
        java.util.Arrays.fill(pred, dc)
      case ModeV =>
        var c = 0
        while (c < 8) {
          val v = if (haveA) plane((py - 1) * stride + px + c) else 127
          var r = 0
          while (r < 8) { pred(r * 8 + c) = v; r += 1 }
          c += 1
        }
      case ModeH =>
        var r = 0
        while (r < 8) {
          val v = if (haveL) plane((py + r) * stride + px - 1) else 129
          var c = 0
          while (c < 8) { pred(r * 8 + c) = v; c += 1 }
          r += 1
        }
      case _ => // TM
        val al = if (haveA && haveL) plane((py - 1) * stride + px - 1)
          else if (haveA) 129 else 127 // RFC border: 127-row incl. origin, 129-col
        var r = 0
        while (r < 8) {
          val lv = if (haveL) plane((py + r) * stride + px - 1) else 129
          var c = 0
          while (c < 8) {
            val av = if (haveA) plane((py - 1) * stride + px + c) else 127
            pred(r * 8 + c) = clamp255(lv + av - al)
            c += 1
          }
          r += 1
        }
    }
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        plane((py + r) * stride + px + c) =
          clamp255(pred(r * 8 + c) + resid(r * 8 + c))
        c += 1
      }
      r += 1
    }
  }

  /** 16×16 intra prediction (§12.2): DC with its partial-average edge
    * cases, V/H with the 127/129 missing-edge fills, and TM. Shared by
    * the key-frame decoder/encoder and the inter-frame intra-MB path. */
  private def predict16(plane: Array[Int], stride: Int, mx: Int,
      my: Int, mode: Int): Array[Int] = {
    val px = mx * 16
    val py = my * 16
    val haveA = my > 0
    val haveL = mx > 0
    val pred = new Array[Int](256)
    mode match {
      case ModeDc =>
        var sum = 0
        var n = 0
        if (haveA) { var i = 0; while (i < 16) { sum += plane((py - 1) * stride + px + i); i += 1 }; n += 16 }
        if (haveL) { var i = 0; while (i < 16) { sum += plane((py + i) * stride + px - 1); i += 1 }; n += 16 }
        val dc = if (n == 0) 128 else (sum + n / 2) >> (if (n == 32) 5 else 4)
        java.util.Arrays.fill(pred, dc)
      case ModeV =>
        var c = 0
        while (c < 16) {
          val v = if (haveA) plane((py - 1) * stride + px + c) else 127
          var r = 0
          while (r < 16) { pred(r * 16 + c) = v; r += 1 }
          c += 1
        }
      case ModeH =>
        var r = 0
        while (r < 16) {
          val v = if (haveL) plane((py + r) * stride + px - 1) else 129
          var c = 0
          while (c < 16) { pred(r * 16 + c) = v; c += 1 }
          r += 1
        }
      case _ => // TM
        val al = if (haveA && haveL) plane((py - 1) * stride + px - 1)
          else if (haveA) 129 else 127 // RFC border: 127-row incl. origin, 129-col
        var r = 0
        while (r < 16) {
          val lv = if (haveL) plane((py + r) * stride + px - 1) else 129
          var c = 0
          while (c < 16) {
            val av = if (haveA) plane((py - 1) * stride + px + c) else 127
            pred(r * 16 + c) = clamp255(lv + av - al)
            c += 1
          }
          r += 1
        }
    }
    pred
  }

  /** Inter-MB chroma reconstruction: MC prediction + residual (the
    * intra path lives in [[predictReconChroma]]). */
  private def addResidChroma(plane: Array[Int], stride: Int, mx: Int,
      my: Int, pred: Array[Int], resid: Array[Int]): Unit = {
    val px = mx * 8
    val py = my * 8
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        plane((py + r) * stride + px + c) =
          clamp255(pred(r * 8 + c) + resid(r * 8 + c))
        c += 1
      }
      r += 1
    }
  }

  /** Luma-only view of [[decodeYuv]] (the media-pipeline gray path). */
  private[graft] def decodeLumaGray(bytes: Array[Byte])
      : Option[(Int, Int, Array[Int])] =
    decodeYuv(bytes).map { case (w, h, y, _, _) => (w, h, y) }

  /** Decode a lossy-WebP (RIFF/"VP8 ") key frame in the documented
    * subset — FULL pixel surface since r14: luma AND both chroma planes
    * (4:2:0, so U/V are ⌈w/2⌉×⌈h/2⌉ row-major). Returns
    * (width, height, y, u, v) or None for anything malformed, truncated,
    * or out of subset. */
  // -------------------------------------------------------------------
  // Inter-frame machinery (RFC 6386 §9.7, §16-18): motion-vector
  // entropy, near-MV survey, and sixtap/whole-pel motion compensation.
  // The probability CONSTANT tables here are keyed from the spec but —
  // like DefaultCoeffProbs — cannot be validated against external
  // encoders in this environment; encoder and decoder share them, and
  // bool coding round-trips exactly under any model (the file-header
  // fidelity note applies).
  // -------------------------------------------------------------------

  /** Default MV entropy contexts (2 components × 19 probs): layout
    * [0] is-short, [1] sign, [2..8] short tree (7), [9..18] long bits
    * (10) — entropymv.c in the spec's reference decoder. */
  private val DefaultMvContext: Array[Array[Int]] = Array(
    Array(162, 128, 225, 146, 172, 147, 214, 39, 156,
      128, 129, 132, 75, 145, 178, 206, 239, 254, 254), // row
    Array(164, 128, 204, 170, 119, 235, 140, 230, 228,
      128, 130, 130, 74, 148, 180, 203, 236, 254, 254)) // col

  /** Per-slot update probabilities for the MV contexts (§9.10). */
  private val MvUpdateProbs: Array[Array[Int]] = Array(
    Array(237, 246, 253, 253, 254, 254, 254, 254, 254,
      254, 254, 254, 254, 254, 250, 250, 252, 254, 254),
    Array(231, 243, 245, 253, 254, 254, 254, 254, 254,
      254, 254, 254, 254, 254, 251, 251, 254, 254, 254))

  /** Short-vector tree: 8 magnitudes 0..7 (small_mvtree, §17.2). */
  private val SmallMvTree: Array[Int] = Array(
    2, 8, 4, 6, -0 - 1, -1 - 1, -2 - 1, -3 - 1,
    10, 12, -4 - 1, -5 - 1, -6 - 1, -7 - 1)

  /** Inter MB mode tree over {ZERO, NEAREST, NEAR, NEW, SPLIT} (§16.1);
    * leaf encoding -(id+1) with ids 0..4 in that order. */
  private val MvRefTree: Array[Int] = Array(
    -0 - 1, 2, -1 - 1, 4, -2 - 1, 6, -3 - 1, -4 - 1)
  private[graft] val MvZero = 0
  private[graft] val MvNearest = 1
  private[graft] val MvNear = 2
  private[graft] val MvNew = 3
  private[graft] val MvSplit = 4

  /** Mode-probability contexts indexed by the near-MV survey counts
    * (modecont.c; rows = count value 0..5, cols = tree position). Values
    * clamped into the valid probability range. */
  private val ModeContexts: Array[Array[Int]] = Array(
    Array(7, 1, 1, 143),
    Array(14, 18, 14, 107),
    Array(135, 64, 57, 68),
    Array(60, 56, 128, 65),
    Array(234, 160, 1, 1),
    Array(255, 255, 1, 2))

  /** Inter-frame intra-MB mode coding (§11.2, non-key frames): the
    * ymode tree {-DC, 2, 4, 6, -V, -H, -TM, -B} with updatable default
    * probs, the uv tree (key shape, its own defaults), and the
    * context-FREE 4×4 sub-mode probs. */
  private val YModeTree: Array[Int] = Array(
    -(ModeDc + 1), 2, 4, 6, -(ModeV + 1), -(ModeH + 1),
    -(ModeTm + 1), -(ModeB + 1))
  private val DefaultYModeProb: Array[Int] = Array(112, 86, 140, 37)
  private val UvModeTree: Array[Int] = Array(
    -(ModeDc + 1), 2, -(ModeV + 1), 4, -(ModeH + 1), -(ModeTm + 1))
  private val DefaultUvModeProb: Array[Int] = Array(162, 101, 204)

  /** Context-FREE 4×4 sub-mode probabilities for B_PRED macroblocks on
    * NON-key frames (§11.2 — unlike the key frame's above/left-context
    * table), over the same [[BModeTree]]. */
  private val InterBModeProbs: Array[Int] =
    Array(120, 90, 79, 133, 87, 85, 80, 111, 151)

  /** SPLITMV machinery (§16.2/17.3): the partition-style tree over
    * {16×8, 8×16, 8×8, 4×4} with its probs, the per-style block→
    * partition fill maps, and the sub-MV reference tree
    * {LEFT, ABOVE, ZERO, NEW} with its five survey contexts. */
  private val MbSplitTree: Array[Int] = Array(
    -(3 + 1), 2, -(2 + 1), 4, -(0 + 1), -(1 + 1))
  private val MbSplitProbs: Array[Int] = Array(110, 111, 150)
  private val MbSplits: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1), // two 16×8
    Array(0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1), // two 8×16
    Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3), // four 8×8
    Array.tabulate(16)(identity)) // sixteen 4×4
  private val MbSplitCount: Array[Int] = Array(2, 2, 4, 16)
  private val SubMvLeft = 0
  private val SubMvAbove = 1
  private val SubMvZero = 2
  private val SubMvNew = 3
  private val SubMvRefTree: Array[Int] = Array(
    -(SubMvLeft + 1), 2, -(SubMvAbove + 1), 4,
    -(SubMvZero + 1), -(SubMvNew + 1))
  /** Rows: NORMAL, LEFT_ZED, ABOVE_ZED, LEFT_ABOVE_SAME, LEFT_ABOVE_ZED. */
  private val SubMvRefProbs: Array[Array[Int]] = Array(
    Array(147, 136, 18), Array(106, 145, 1), Array(179, 121, 1),
    Array(223, 1, 34), Array(208, 1, 1))

  /** The sub-MV coding context from the representative block's left and
    * above packed MVs (decodemv.c). */
  private def subMvContext(left: Int, above: Int): Int =
    if (above == left) { if (left == 0) 4 else 3 }
    else if (above == 0) 2
    else if (left == 0) 1
    else 0

  /** The six-tap subpel interpolation filters, 8 phases (filter.c). A
    * phase's taps sum to 128, so constant regions filter to themselves
    * exactly — the closed-form anchor the gate oracles use. */
  private val SixTapFilters: Array[Array[Int]] = Array(
    Array(0, 0, 128, 0, 0, 0),
    Array(0, -6, 123, 12, -1, 0),
    Array(2, -11, 108, 36, -8, 1),
    Array(0, -9, 93, 50, -6, 0),
    Array(3, -16, 77, 77, -16, 3),
    Array(0, -6, 50, 93, -9, 0),
    Array(1, -8, 36, 108, -11, 2),
    Array(0, -1, 12, 123, -6, 0))

  /** Generic token-tree walk with a probability-array offset (the
    * BModeTree convention: internal nodes positive, leaves -(id+1)). */
  private def treeRead(bd: BoolDecoder, tree: Array[Int],
      probs: Array[Int], pOff: Int): Int = {
    var node = 0
    var leaf = -1
    while (leaf < 0) {
      val t = tree(node + bd.bool(probs(pOff + (node >> 1))))
      if (t <= 0) leaf = -t - 1 else node = t
    }
    leaf
  }

  /** One MV component (§17.2): short values 0..7 via [[SmallMvTree]],
    * long values as 10 raw bits in the spec's 0,1,2,9..4 order with the
    * sometimes-implicit bit 3; then an optional sign. Returned in the
    * component's own units (the caller doubles for whole-MB MVs). */
  private def readMvComponent(bd: BoolDecoder, p: Array[Int]): Int = {
    var x = 0
    if (bd.bool(p(0)) == 1) { // long vector
      var i = 0
      while (i < 3) { x += bd.bool(p(9 + i)) << i; i += 1 }
      i = 9
      while (i > 3) { x += bd.bool(p(9 + i)) << i; i -= 1 }
      if ((x & 0xfff0) == 0 || bd.bool(p(9 + 3)) == 1) x += 8
    } else x = treeRead(bd, SmallMvTree, p, 2)
    if (x != 0 && bd.bool(p(1)) == 1) -x else x
  }

  /** Encoder mirror of [[readMvComponent]]. */
  private def writeMvComponent(be: BoolEncoder, p: Array[Int], v: Int): Unit = {
    val x = math.abs(v)
    require(x < 1024, s"mv component $v out of the 10-bit range")
    if (x < 8) {
      be.bool(p(0), 0)
      // short tree: walk to the leaf emitting each branch bit
      writeTree(be, SmallMvTree, p, 2, x)
    } else {
      be.bool(p(0), 1)
      var i = 0
      while (i < 3) { be.bool(p(9 + i), (x >> i) & 1); i += 1 }
      i = 9
      while (i > 3) { be.bool(p(9 + i), (x >> i) & 1); i -= 1 }
      if ((x & 0xfff0) != 0) be.bool(p(9 + 3), (x >> 3) & 1)
    }
    if (x != 0) be.bool(p(1), if (v < 0) 1 else 0)
  }

  /** Emit the branch bits that lead to `leaf` in `tree`. */
  private def writeTree(be: BoolEncoder, tree: Array[Int],
      probs: Array[Int], pOff: Int, leaf: Int): Unit = {
    // depth-first search for the leaf, recording the branch path
    def path(node: Int): List[Int] = {
      var side = 0
      while (side < 2) {
        val t = tree(node + side)
        if (t <= 0) { if (-t - 1 == leaf) return side :: Nil }
        else {
          val sub = path(t)
          if (sub ne null) return side :: sub
        }
        side += 1
      }
      null
    }
    var node = 0
    var p = path(0)
    require(p ne null, s"leaf $leaf not in tree")
    while (p ne Nil) {
      be.bool(probs(pOff + (node >> 1)), p.head)
      val t = tree(node + p.head)
      node = t
      p = p.tail
    }
  }

  /** Packed MV helper (row in the high half for as_int-style equality). */
  @inline private def packMv(row: Int, col: Int): Int =
    (row << 16) | (col & 0xffff)

  /** The near-MV survey (§16.3 / findnearmv.c): census of the left,
    * above, and above-left neighbors with sign-bias correction, distinct-
    * candidate weighting 2/2/1, the near/nearest swap, best-mv selection,
    * and edge clamping (±(16<<3) margins beyond the macroblock's frame
    * edges). Neighbor lookups come from the caller's per-frame arrays
    * (out-of-frame neighbors read as intra). Returns
    * (nearestPacked, nearbyPacked, bestPacked, cnt[4]). */
  private def findNearMvs(mx: Int, my: Int, mbCols: Int, mbRows: Int,
      refIdx: Int, mbRef: Array[Int], mbMode: Array[Int], mbMv: Array[Int],
      signBias: Array[Int]): (Int, Int, Int, Array[Int]) = {
    val cnt = new Array[Int](4)
    val mvs = new Array[Int](4) // slot 0 stays zero (the "intra/zero" slot)
    var nMv = 0 // index of the last distinct candidate in mvs
    var cntIdx = 0
    def refOf(c: Int, r: Int): Int =
      if (c < 0 || r < 0 || c >= mbCols || r >= mbRows) 0
      else mbRef(r * mbCols + c)
    def mvOf(c: Int, r: Int): Int =
      if (c < 0 || r < 0 || c >= mbCols || r >= mbRows) 0
      else mbMv(r * mbCols + c)
    def modeOf(c: Int, r: Int): Int =
      if (c < 0 || r < 0 || c >= mbCols || r >= mbRows) -1
      else mbMode(r * mbCols + c)
    def biased(mv: Int, candRef: Int): Int =
      if (signBias(candRef) != signBias(refIdx))
        packMv(-(mv >> 16), -(mv << 16 >> 16))
      else mv
    def survey(c: Int, r: Int, weight: Int): Unit = {
      val ref = refOf(c, r)
      if (ref != 0) { // inter-coded neighbor
        val raw = mvOf(c, r)
        if (raw != 0) {
          val mv = biased(raw, ref)
          if (nMv == 0 || mv != mvs(nMv)) { nMv += 1; mvs(nMv) = mv; cntIdx += 1 }
          cnt(cntIdx) += weight
        } else cnt(0) += weight
      }
    }
    survey(mx, my - 1, 2) // above
    survey(mx - 1, my, 2) // left
    survey(mx - 1, my - 1, 1) // above-left
    // three distinct candidates where the third equals nearest: bump it
    if (cnt(3) > 0 && mvs(nMv) == mvs(1)) cnt(1) += 1
    cnt(3) = (if (modeOf(mx, my - 1) == MvSplit) 2 else 0) +
      (if (modeOf(mx - 1, my) == MvSplit) 2 else 0) +
      (if (modeOf(mx - 1, my - 1) == MvSplit) 1 else 0)
    if (cnt(2) > cnt(1)) {
      val t = cnt(1); cnt(1) = cnt(2); cnt(2) = t
      val m = mvs(1); mvs(1) = mvs(2); mvs(2) = m
    }
    if (cnt(1) >= cnt(0)) mvs(0) = mvs(1) // best = nearest
    def clampPacked(mv: Int): Int = {
      var row = mv >> 16
      var col = mv << 16 >> 16
      val toLeft = -(mx * 16) << 3
      val toRight = ((mbCols - 1 - mx) * 16) << 3
      val toTop = -(my * 16) << 3
      val toBottom = ((mbRows - 1 - my) * 16) << 3
      if (col < toLeft - 128) col = toLeft - 128
      if (col > toRight + 128) col = toRight + 128
      if (row < toTop - 128) row = toTop - 128
      if (row > toBottom + 128) row = toBottom + 128
      packMv(row, col)
    }
    (clampPacked(mvs(1)), clampPacked(mvs(2)), clampPacked(mvs(0)), cnt)
  }

  /** Whole-pel/subpel block motion compensation: predict a bw×bh block
    * whose top-left is (px, py) from the padded reference plane, MV in
    * 1/8-pel units, sixtap phases (mv & 7), source reads edge-clamped —
    * exactly the spec's 32-pixel replication border for any MV inside
    * the §16.3 clamp range. The 2-pass form with the identity phase-0
    * filter is bit-identical to the reference's 1-pass special cases
    * (taps sum to 128 and (128·t + 64)≫7 = t). */
  private def mcPredict(ref: Array[Int], stride: Int, ph: Int,
      px: Int, py: Int, mvRow: Int, mvCol: Int, bw: Int, bh: Int,
      out: Array[Int], outStride: Int, outOff: Int): Unit = {
    val sx = px + (mvCol >> 3)
    val sy = py + (mvRow >> 3)
    val fx = mvCol & 7
    val fy = mvRow & 7
    val pw = stride
    @inline def src(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= pw) pw - 1 else x
      val cy = if (y < 0) 0 else if (y >= ph) ph - 1 else y
      ref(cy * stride + cx)
    }
    if (fx == 0 && fy == 0) {
      var r = 0
      while (r < bh) {
        var c = 0
        while (c < bw) { out(outOff + r * outStride + c) = src(sx + c, sy + r); c += 1 }
        r += 1
      }
    } else {
      val fh = SixTapFilters(fx)
      val fv = SixTapFilters(fy)
      // first pass: horizontal over bh + 5 rows (2 above, 3 below)
      val tmp = new Array[Int]((bh + 5) * bw)
      var r = 0
      while (r < bh + 5) {
        var c = 0
        while (c < bw) {
          var s = 64
          var k = 0
          while (k < 6) { s += fh(k) * src(sx + c + k - 2, sy + r - 2); k += 1 }
          tmp(r * bw + c) = clamp255(s >> 7)
          c += 1
        }
        r += 1
      }
      // second pass: vertical
      r = 0
      while (r < bh) {
        var c = 0
        while (c < bw) {
          var s = 64
          var k = 0
          while (k < 6) { s += fv(k) * tmp((r + k) * bw + c); k += 1 }
          out(outOff + r * outStride + c) = clamp255(s >> 7)
          c += 1
        }
        r += 1
      }
    }
  }

  /** Persistent VP8 stream state carried across frames: the three
    * reference buffers (last / golden / altref) on the macroblock-padded
    * grid, the saved entropy probabilities that refresh_entropy_probs
    * persists, saved MV contexts, reference sign biases, and the
    * loop-filter delta state (all of which survive from frame to frame
    * per RFC 6386 §9). A fresh instance is the stream-start state. */
  private final class StreamState {
    var w = 0
    var h = 0
    var stride = 0
    var cStride = 0
    var yLast: Array[Int] = null
    var uLast: Array[Int] = null
    var vLast: Array[Int] = null
    var yGold: Array[Int] = null
    var uGold: Array[Int] = null
    var vGold: Array[Int] = null
    var yAlt: Array[Int] = null
    var uAlt: Array[Int] = null
    var vAlt: Array[Int] = null
    var yCur: Array[Int] = null
    var uCur: Array[Int] = null
    var vCur: Array[Int] = null
    var signBiasGold = 0
    var signBiasAlt = 0
    var probs: Array[Array[Array[Array[Int]]]] = null
    var mvProbs: Array[Array[Int]] = null
    var yModeProbs: Array[Int] = null
    var uvModeProbs: Array[Int] = null
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    // segmentation feature data (§9.3; r14): persists across inter
    // frames until update_segment_feature_data, reset on key frames
    // (libvpx init_frame resets segment_feature_data, the abs/delta
    // mode, AND the ref/mode lf deltas together)
    var segAbs = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    /** The key-frame reset of the PERSISTENT per-frame adjustment
      * state (libvpx init_frame): segment feature data back to
      * delta-mode zeros, loop-filter ref/mode deltas back to zero. */
    def resetAdjustments(): Unit = {
      segAbs = false
      java.util.Arrays.fill(segQ, 0)
      java.util.Arrays.fill(segLf, 0)
      java.util.Arrays.fill(refLfDeltas, 0)
      java.util.Arrays.fill(modeLfDeltas, 0)
    }
    resetEntropy()
    /** Key-frame reset: coefficient, MV, and inter-frame intra-mode
      * probabilities back to the spec defaults, sign biases cleared. */
    def resetEntropy(): Unit = {
      probs = Array.tabulate(4, 8, 3, 11) { (t, b, c, l) =>
        DefaultCoeffProbs(t)(b)(c)(l)
      }
      mvProbs = Array.tabulate(2, 19)((c, i) => DefaultMvContext(c)(i))
      yModeProbs = DefaultYModeProb.clone()
      uvModeProbs = DefaultUvModeProb.clone()
      signBiasGold = 0
      signBiasAlt = 0
    }
  }

  /** Decode ONE VP8 frame payload at bytes[p, end) into/from the stream
    * state (planes land in st.yLast/uLast/vLast on the padded grid;
    * reference buffers, entropy persistence, and loop-filter delta
    * state update per the refresh rules). Throws [[Malformed]] for
    * anything malformed, truncated, or out of subset. */
  private def decodeFramePayload(bytes: Array[Byte], p: Int, end: Int,
      st: StreamState): Unit = {
      val tag = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        ((bytes(p + 2) & 0xff) << 16)
      val keyFrame = (tag & 1) == 0
      val firstPartSize = tag >> 5
      var w = st.w
      var h = st.h
      var part1 = p + 3
      if (keyFrame) {
        // a key frame resets the persistent entropy state to defaults,
        // and the persistent adjustment state (segment feature data +
        // lf deltas) to zero, per libvpx init_frame
        st.resetEntropy()
        st.resetAdjustments()
        if ((bytes(p + 3) & 0xff) != 0x9d || (bytes(p + 4) & 0xff) != 0x01 ||
          (bytes(p + 5) & 0xff) != 0x2a) throw Malformed
        w = ((bytes(p + 6) & 0xff) | ((bytes(p + 7) & 0xff) << 8)) & 0x3fff
        h = ((bytes(p + 8) & 0xff) | ((bytes(p + 9) & 0xff) << 8)) & 0x3fff
        if (w <= 0 || h <= 0 || w.toLong * h > 16000000L) throw Malformed
        part1 = p + 10
      } else {
        // inter frame: dims inherit from the stream; there must BE one
        if (st.yLast == null || w <= 0 || h <= 0) throw Malformed
      }
      if (firstPartSize <= 0 || part1 + firstPartSize > end)
        throw Malformed
      val bd1 = new BoolDecoder(bytes, part1, part1 + firstPartSize)
      if (keyFrame) {
        bd1.literal(1) // color space
        bd1.literal(1) // clamping type
      }
      // segmentation (§9.3; r14, previously out of subset): per-segment
      // quantizer and loop-filter features in absolute or delta mode,
      // with an optionally tree-coded per-MB segment map. Feature data
      // persists across inter frames in the stream state; an
      // enabled-but-not-map-updated frame decodes every MB as segment 0
      // (libvpx read_mbinfo's "reset to 0 above by default" — VP8 does
      // not carry the map itself across frames).
      val segEnabled = bd1.literal(1) != 0
      var segUpdateMap = false
      val segTreeProbs = Array(255, 255, 255)
      if (segEnabled) {
        segUpdateMap = bd1.literal(1) != 0
        if (bd1.literal(1) != 0) { // update_segment_feature_data
          // absent per-segment values reset to 0 (libvpx memsets then
          // reads), they do NOT keep their previous values
          st.segAbs = bd1.literal(1) != 0
          var i = 0
          while (i < 8) {
            var v = 0
            if (bd1.literal(1) != 0) {
              v = bd1.literal(if (i < 4) 7 else 6)
              if (bd1.literal(1) != 0) v = -v
            }
            if (i < 4) st.segQ(i) = v else st.segLf(i - 4) = v
            i += 1
          }
        }
        if (segUpdateMap) {
          var i = 0
          while (i < 3) {
            if (bd1.literal(1) != 0) segTreeProbs(i) = bd1.literal(8)
            i += 1
          }
        }
      }
      val filterType = bd1.literal(1) // 0 normal, 1 simple
      val filterLevel = bd1.literal(6)
      val sharpness = bd1.literal(3)
      // loop-filter deltas: for a standalone key frame the persistent
      // delta state starts at zero, so enabled-but-not-updated means
      // deltas 0. Of the 4+4 (ref, mode) slots only INTRA (ref 0) and
      // B_PRED (mode 0) can apply to a key frame's all-intra MBs.
      val lfDeltaEnabled = bd1.literal(1) != 0
      if (lfDeltaEnabled) { // mode_ref_lf_delta_enabled
        if (bd1.literal(1) != 0) { // this frame updates the deltas
          var i = 0
          while (i < 8) {
            if (bd1.literal(1) != 0) {
              var v = bd1.literal(6)
              if (bd1.literal(1) != 0) v = -v
              if (i < 4) st.refLfDeltas(i) = v
              else st.modeLfDeltas(i - 4) = v
            }
            i += 1
          }
        }
      }
      // token partitions (§9.5): 1/2/4/8, macroblock row r reads
      // partition r mod N — the layout real encoders emit for
      // multithreaded decode (r14, previously a one-partition subset)
      val nParts = 1 << bd1.literal(2)
      val yacQi = bd1.literal(7)
      val ydcDelta = bd1.signedLiteralIfFlag(4)
      val y2dcDelta = bd1.signedLiteralIfFlag(4)
      val y2acDelta = bd1.signedLiteralIfFlag(4)
      val uvdcDelta = bd1.signedLiteralIfFlag(4)
      val uvacDelta = bd1.signedLiteralIfFlag(4)
      // reference-buffer refresh plan (§9.7; inter frames only — a key
      // frame refreshes all three implicitly)
      var refreshGold = true
      var refreshAlt = true
      var copyToGold = 0
      var copyToAlt = 0
      var refreshLast = true
      if (!keyFrame) {
        refreshGold = bd1.literal(1) == 1
        refreshAlt = bd1.literal(1) == 1
        if (!refreshGold) copyToGold = bd1.literal(2)
        if (!refreshAlt) copyToAlt = bd1.literal(2)
        st.signBiasGold = bd1.literal(1)
        st.signBiasAlt = bd1.literal(1)
      }
      val refreshEntropy = bd1.literal(1) // refresh entropy probs
      if (!keyFrame) refreshLast = bd1.literal(1) == 1
      val probs = Array.tabulate(4, 8, 3, 11) { (t, b, c, l) =>
        st.probs(t)(b)(c)(l)
      }
      var t = 0
      while (t < 4) {
        var b = 0
        while (b < 8) {
          var c = 0
          while (c < 3) {
            var l = 0
            while (l < 11) {
              if (bd1.bool(CoeffUpdateProbs(t)(b)(c)(l)) == 1)
                probs(t)(b)(c)(l) = bd1.literal(8)
              l += 1
            }
            c += 1
          }
          b += 1
        }
        t += 1
      }
      val mbSkipEnabled = bd1.literal(1) == 1
      val skipProb = if (mbSkipEnabled) bd1.literal(8) else 0
      // inter-frame mode/MV entropy (§9.10-9.11)
      var probIntra = 0
      var probLast = 0
      var probGf = 0
      val mvp = Array.tabulate(2, 19)((c, i) => st.mvProbs(c)(i))
      val ymp = st.yModeProbs.clone()
      val uvmp = st.uvModeProbs.clone()
      if (!keyFrame) {
        probIntra = bd1.literal(8)
        probLast = bd1.literal(8)
        probGf = bd1.literal(8)
        if (bd1.literal(1) == 1) { // intra 16x16 prob update
          var i = 0
          while (i < 4) { ymp(i) = bd1.literal(8); i += 1 }
        }
        if (bd1.literal(1) == 1) { // intra chroma prob update
          var i = 0
          while (i < 3) { uvmp(i) = bd1.literal(8); i += 1 }
        }
        var c = 0
        while (c < 2) {
          var i = 0
          while (i < 19) {
            if (bd1.bool(MvUpdateProbs(c)(i)) == 1) {
              val v = bd1.literal(7)
              mvp(c)(i) = if (v != 0) v << 1 else 1
            }
            i += 1
          }
          c += 1
        }
      }
      if (refreshEntropy == 1) {
        st.probs = probs
        st.mvProbs = mvp
        st.yModeProbs = ymp
        st.uvModeProbs = uvmp
      }
      // residual partitions: after the first (header) partition come
      // (nParts − 1) 3-byte little-endian sizes, then the partitions
      // back-to-back; the LAST partition runs to the end of the chunk
      val part2 = part1 + firstPartSize
      val chunkEnd = end
      val dataStart = part2 + 3 * (nParts - 1)
      if (dataStart > chunkEnd) throw Malformed
      val bds = new Array[BoolDecoder](nParts)
      var partOff = dataStart
      var pi = 0
      while (pi < nParts) {
        val sz =
          if (pi == nParts - 1) chunkEnd - partOff
          else (bytes(part2 + 3 * pi) & 0xff) |
            ((bytes(part2 + 3 * pi + 1) & 0xff) << 8) |
            ((bytes(part2 + 3 * pi + 2) & 0xff) << 16)
        if (sz < 0 || partOff + sz > chunkEnd) throw Malformed
        bds(pi) = new BoolDecoder(bytes, partOff, partOff + sz)
        partOff += sz
        pi += 1
      }
      // quantizers (the Y-block DC quantizer applies to B_PRED's
      // no-Y2 blocks, which decode from coefficient 0) — one set per
      // segment: the segment feature replaces (absolute mode) or
      // offsets (delta mode) the frame's base index, clamped to the
      // table range, and the per-coefficient-type deltas then apply on
      // top of the segment base (§9.6/§14.1; libvpx mb_init_dequantizer)
      val ydcQs = new Array[Int](4)
      val yacQs = new Array[Int](4)
      val y2dcQs = new Array[Int](4)
      val y2acQs = new Array[Int](4)
      val uvdcQs = new Array[Int](4)
      val uvacQs = new Array[Int](4)
      locally {
        var s = 0
        while (s < 4) {
          val base =
            if (!segEnabled) yacQi
            else if (st.segAbs) clampQ(st.segQ(s))
            else clampQ(yacQi + st.segQ(s))
          ydcQs(s) = DcQLookup(clampQ(base + ydcDelta))
          yacQs(s) = AcQLookup(clampQ(base))
          y2dcQs(s) = DcQLookup(clampQ(base + y2dcDelta)) * 2
          y2acQs(s) = math.max(8, AcQLookup(clampQ(base + y2acDelta)) * 155 / 100)
          // chroma quantizers (§14.1: the UV DC factor is capped at 132)
          uvdcQs(s) = math.min(132, DcQLookup(clampQ(base + uvdcDelta)))
          uvacQs(s) = AcQLookup(clampQ(base + uvacDelta))
          s += 1
        }
      }
      val mbCols = (w + 15) / 16
      val mbRows = (h + 15) / 16
      val stride = mbCols * 16
      val plane = new Array[Int](stride * mbRows * 16)
      val cStride = mbCols * 8
      val uPlane = new Array[Int](cStride * mbRows * 8)
      val vPlane = new Array[Int](cStride * mbRows * 8)
      // entropy contexts
      val aY = new Array[Int](mbCols * 4)
      val aU = new Array[Int](mbCols * 2)
      val aV = new Array[Int](mbCols * 2)
      val aY2 = new Array[Int](mbCols)
      // B_PRED sub-mode contexts (spec ids; non-B MBs count as B_DC = 0)
      val aBm = new Array[Int](mbCols * 4)
      val lBm = new Array[Int](4)
      val lY = new Array[Int](4)
      val lU = new Array[Int](2)
      val lV = new Array[Int](2)
      val levels = new Array[Int](16)
      val coeffs = new Array[Int](16)
      // per-MB loop-filter inputs: the delta-adjusted level and whether
      // interior edges filter (B_PRED, or any nonzero coefficient
      // decoded — the eobtotal==0 forced-skip rule)
      val mbLfLevel = new Array[Int](mbCols * mbRows)
      val mbLfInner = new Array[Boolean](mbCols * mbRows)
      // per-MB mode info for the near-MV survey (inter frames): ref
      // frame (0 = intra), inter mode id, packed MV
      val mbRefArr = new Array[Int](mbCols * mbRows)
      val mbModeArr = Array.fill(mbCols * mbRows)(-1)
      val mbMvArr = new Array[Int](mbCols * mbRows)
      // per-4×4-block packed MVs for SPLITMV neighbors (non-SPLIT MBs
      // fall back to their whole-MB MV in the lookup)
      val mbBlockMvs = new Array[Int](mbCols * mbRows * 16)
      val signBias = Array(0, 0, st.signBiasGold, st.signBiasAlt)
      val refPlaneH = mbRows * 16
      var my = 0
      while (my < mbRows) {
        val bd2 = bds(my % nParts) // §9.5 row→partition routing
        java.util.Arrays.fill(lY, 0)
        java.util.Arrays.fill(lU, 0)
        java.util.Arrays.fill(lV, 0)
        java.util.Arrays.fill(lBm, 0)
        var lY2 = 0
        var mx = 0
        while (mx < mbCols) {
          // segment id rides FIRST in the MB header (§10), on the
          // {2, 4, -0, -1, -2, -3} tree; a frame that does not update
          // the map decodes every MB as segment 0
          var segId = 0
          if (segEnabled && segUpdateMap) {
            segId =
              if (bd1.bool(segTreeProbs(0)) == 0) bd1.bool(segTreeProbs(1))
              else 2 + bd1.bool(segTreeProbs(2))
          }
          val ydcQ = ydcQs(segId)
          val yacQ = yacQs(segId)
          val y2dcQ = y2dcQs(segId)
          val y2acQ = y2acQs(segId)
          val uvdcQ = uvdcQs(segId)
          val uvacQ = uvacQs(segId)
          val skip = mbSkipEnabled && bd1.bool(skipProb) == 1
          var ymode = ModeB
          val subModes = new Array[Int](16)
          var uvmode = ModeDc
          var interMb = false
          var refIdx = 0 // 0 intra, 1 last, 2 golden, 3 altref
          var interMode = -1
          var mvRow = 0
          var mvCol = 0
          var splitMvs: Array[Int] = null
          if (!keyFrame && bd1.bool(probIntra) == 0) {
            // intra-coded MB inside an inter frame (§11.2: the non-key
            // trees and updatable probs); B_PRED sub-modes are context-
            // FREE here, unlike the key frame's above/left-context table
            ymode = treeRead(bd1, YModeTree, ymp, 0)
            if (ymode == ModeB) {
              var b = 0
              while (b < 16) {
                subModes(b) = treeRead(bd1, BModeTree, InterBModeProbs, 0)
                b += 1
              }
            }
            uvmode = treeRead(bd1, UvModeTree, uvmp, 0)
            // ref stays intra (0) in the survey arrays; mode/mv defaults
            var b = 0
            while (b < 4) { aBm(mx * 4 + b) = 0; lBm(b) = 0; b += 1 }
          } else if (!keyFrame) {
            interMb = true
            refIdx = if (bd1.bool(probLast) == 0) 1
              else if (bd1.bool(probGf) == 0) 2 else 3
            val (nearest, nearby, best, cnt) = findNearMvs(mx, my,
              mbCols, mbRows, refIdx, mbRefArr, mbModeArr, mbMvArr,
              signBias)
            val mp = new Array[Int](4)
            var j = 0
            while (j < 4) {
              mp(j) = ModeContexts(math.min(cnt(j), 5))(j)
              j += 1
            }
            interMode = treeRead(bd1, MvRefTree, mp, 0)
            interMode match {
              case MvZero =>
              case MvNearest =>
                mvRow = nearest >> 16; mvCol = nearest << 16 >> 16
              case MvNear =>
                mvRow = nearby >> 16; mvCol = nearby << 16 >> 16
              case MvNew =>
                mvRow = readMvComponent(bd1, mvp(0)) * 2 + (best >> 16)
                mvCol = readMvComponent(bd1, mvp(1)) * 2 + (best << 16 >> 16)
                // subset line: a NEWMV outside the §16.3 clamp window
                // would need the need_to_clamp prediction-time variant;
                // rejected, never approximated
                if (mvCol < ((-(mx * 16)) << 3) - 128 ||
                  mvCol > (((mbCols - 1 - mx) * 16) << 3) + 128 ||
                  mvRow < ((-(my * 16)) << 3) - 128 ||
                  mvRow > (((mbRows - 1 - my) * 16) << 3) + 128)
                  throw Malformed
              case _ => // SPLITMV (§16.2/17.3)
                val style = treeRead(bd1, MbSplitTree, MbSplitProbs, 0)
                val fill = MbSplits(style)
                val smvs = new Array[Int](16)
                splitMvs = smvs
                // neighbor block-MV lookups: earlier blocks of THIS MB,
                // else the neighbor MB (whole-MB MV unless it was SPLIT)
                def blockMvAt(c: Int, r: Int, b: Int): Int =
                  if (c < 0 || r < 0) 0
                  else if (c == mx && r == my) smvs(b)
                  else {
                    val mi = r * mbCols + c
                    if (mbModeArr(mi) != MvSplit) mbMvArr(mi)
                    else mbBlockMvs(mi * 16 + b)
                  }
                def leftOf(k: Int): Int =
                  if ((k & 3) != 0) blockMvAt(mx, my, k - 1)
                  else blockMvAt(mx - 1, my, k + 3)
                def aboveOf(k: Int): Int =
                  if (k >= 4) blockMvAt(mx, my, k - 4)
                  else blockMvAt(mx, my - 1, k + 12)
                var j = 0
                while (j < MbSplitCount(style)) {
                  var k = 0
                  while (fill(k) != j) k += 1 // partition representative
                  val l = leftOf(k)
                  val a = aboveOf(k)
                  val p = SubMvRefProbs(subMvContext(l, a))
                  val mv = treeRead(bd1, SubMvRefTree, p, 0) match {
                    case SubMvLeft => l
                    case SubMvAbove => a
                    case SubMvZero => 0
                    case _ =>
                      packMv(
                        readMvComponent(bd1, mvp(0)) * 2 + (best >> 16),
                        readMvComponent(bd1, mvp(1)) * 2 + (best << 16 >> 16))
                  }
                  // subset line: a block MV outside the clamp window
                  // would be prediction-time-clamped by the reference
                  // decoder (need_to_clamp) — rejected, never guessed
                  val bmR = mv >> 16
                  val bmC = mv << 16 >> 16
                  if (bmC < ((-(mx * 16)) << 3) - 128 ||
                    bmC > (((mbCols - 1 - mx) * 16) << 3) + 128 ||
                    bmR < ((-(my * 16)) << 3) - 128 ||
                    bmR > (((mbRows - 1 - my) * 16) << 3) + 128)
                    throw Malformed
                  var kk = 0
                  while (kk < 16) { if (fill(kk) == j) smvs(kk) = mv; kk += 1 }
                  j += 1
                }
                // the MB's MV, as neighbors see it, is block 15's (§16.3)
                mvRow = smvs(15) >> 16
                mvCol = smvs(15) << 16 >> 16
            }
            mbRefArr(my * mbCols + mx) = refIdx
            mbModeArr(my * mbCols + mx) = interMode
            mbMvArr(my * mbCols + mx) = packMv(mvRow, mvCol)
            if (interMode == MvSplit)
              System.arraycopy(splitMvs, 0, mbBlockMvs,
                (my * mbCols + mx) * 16, 16)
            // inter MBs reset the (key-frame-only) B sub-mode contexts
            var b = 0
            while (b < 4) { aBm(mx * 4 + b) = 0; lBm(b) = 0; b += 1 }
          } else {
          // key-frame luma mode
          if (bd1.bool(KfYModeProb(0)) == 1) {
            if (bd1.bool(KfYModeProb(1)) == 0)
              ymode = if (bd1.bool(KfYModeProb(2)) == 0) ModeDc else ModeV
            else
              ymode = if (bd1.bool(KfYModeProb(3)) == 0) ModeH else ModeTm
          }
          // B_PRED: 16 context-coded sub-modes (spec ids), read between
          // ymode and uvmode; out-of-subset sub-modes reject AFTER the
          // walk so rejection never desyncs a conforming stream early
          if (ymode == ModeB) {
            var b = 0
            while (b < 16) {
              val br = b / 4
              val bc = b % 4
              val p = KfBModeProbs(aBm(mx * 4 + bc))(lBm(br))
              var node = 0
              var spec = -1
              while (spec < 0) {
                val t = BModeTree(node + bd1.bool(p(node >> 1)))
                if (t <= 0) spec = -t - 1 else node = t
              }
              subModes(b) = spec
              aBm(mx * 4 + bc) = spec
              lBm(br) = spec
              b += 1
            }
          } else {
            var b = 0
            while (b < 4) { aBm(mx * 4 + b) = 0; lBm(b) = 0; b += 1 }
          }
          // chroma mode (kf tree {-DC, 2, -V, 4, -H, -TM})
          uvmode =
            if (bd1.bool(KfUvModeProb(0)) == 0) ModeDc
            else if (bd1.bool(KfUvModeProb(1)) == 0) ModeV
            else if (bd1.bool(KfUvModeProb(2)) == 0) ModeH
            else ModeTm
          } // end key-frame mode parse
          // loop-filter level for this MB: base + ref delta + mode
          // delta per the mode_lf_lut (B_PRED→slot 0, other intra→no
          // mode delta, ZEROMV→1, NEAREST/NEAR/NEW→2, SPLIT→3),
          // clamped to the 6-bit range
          // segment feature first (absolute replaces, delta offsets,
          // clamped to 0..63 — libvpx vp8_loop_filter_frame_init),
          // then the ref/mode deltas on top with one final clamp
          val segLfBase =
            if (!segEnabled) filterLevel
            else math.max(0, math.min(63,
              if (st.segAbs) st.segLf(segId)
              else filterLevel + st.segLf(segId)))
          mbLfLevel(my * mbCols + mx) =
            if (!lfDeltaEnabled) segLfBase
            else {
              var lvl = segLfBase + st.refLfDeltas(refIdx)
              if (interMb) {
                lvl += (interMode match {
                  case MvZero => st.modeLfDeltas(1)
                  case MvSplit => st.modeLfDeltas(3)
                  case _ => st.modeLfDeltas(2)
                })
              } else if (ymode == ModeB) lvl += st.modeLfDeltas(0)
              math.max(0, math.min(63, lvl))
            }
          var mbAnyNz = false
          val px = mx * 16
          val py = my * 16
          if (!interMb && ymode == ModeB) {
            // B_PRED: no Y2; each 4×4 block decodes type-3 tokens from
            // coefficient 0, predicts from ALREADY-RECONSTRUCTED
            // neighbors (including earlier subblocks of this MB), and
            // lands in the plane immediately — the intra dependency
            // chain 16×16 modes don't have
            var b = 0
            while (b < 16) {
              val br = b / 4
              val bc = b % 4
              val bx = px + bc * 4
              val by = py + br * 4
              var r4: Array[Int] = null
              if (!skip) {
                val ctx = aY(mx * 4 + bc) + lY(br)
                val nz = decodeBlockTokens(bd2, probs(3), 0, ctx, levels)
                if (nz) mbAnyNz = true
                aY(mx * 4 + bc) = if (nz) 1 else 0
                lY(br) = aY(mx * 4 + bc)
                var k = 0
                while (k < 16) {
                  coeffs(k) = levels(k) * (if (k == 0) ydcQ else yacQ)
                  k += 1
                }
                r4 = inverseDct(coeffs)
              }
              val ar =
                if (bModeUsesAr(subModes(b)))
                  bPredAboveRight(plane, stride, mbCols, mx, my, bc, bx, by)
                else DummyAr
              val p4 = predict4(plane, stride, bx, by, subModes(b), ar)
              var rr = 0
              while (rr < 4) {
                var cc = 0
                while (cc < 4) {
                  plane((by + rr) * stride + bx + cc) = clamp255(
                    p4(rr * 4 + cc) + (if (r4 == null) 0 else r4(rr * 4 + cc)))
                  cc += 1
                }
                rr += 1
              }
              b += 1
            }
            if (skip) {
              // skipped B_PRED MB: Y contexts reset (UV reset in the
              // shared chroma section); Y2 contexts are left UNCHANGED —
              // this MB has no Y2 block
              var k = 0
              while (k < 4) { aY(mx * 4 + k) = 0; lY(k) = 0; k += 1 }
            }
          } else if (interMb && interMode == MvSplit) {
            // SPLITMV: no Y2; per-4×4-block MC with the block MVs plus
            // type-3 tokens from coefficient 0 (the B_PRED token shape)
            val refY = refIdx match {
              case 1 => st.yLast
              case 2 => st.yGold
              case _ => st.yAlt
            }
            val p4 = new Array[Int](16)
            var b = 0
            while (b < 16) {
              val br = b / 4
              val bc = b % 4
              val bx = px + bc * 4
              val by = py + br * 4
              val bmv = splitMvs(b)
              mcPredict(refY, stride, refPlaneH, bx, by,
                bmv >> 16, bmv << 16 >> 16, 4, 4, p4, 4, 0)
              var r4: Array[Int] = null
              if (!skip) {
                val ctx = aY(mx * 4 + bc) + lY(br)
                val nz = decodeBlockTokens(bd2, probs(3), 0, ctx, levels)
                if (nz) mbAnyNz = true
                aY(mx * 4 + bc) = if (nz) 1 else 0
                lY(br) = aY(mx * 4 + bc)
                var k = 0
                while (k < 16) {
                  coeffs(k) = levels(k) * (if (k == 0) ydcQ else yacQ)
                  k += 1
                }
                r4 = inverseDct(coeffs)
              }
              var rr = 0
              while (rr < 4) {
                var cc = 0
                while (cc < 4) {
                  plane((by + rr) * stride + bx + cc) = clamp255(
                    p4(rr * 4 + cc) + (if (r4 == null) 0 else r4(rr * 4 + cc)))
                  cc += 1
                }
                rr += 1
              }
              b += 1
            }
            if (skip) {
              // skipped SPLIT MB: Y contexts reset, Y2 untouched
              var k = 0
              while (k < 4) { aY(mx * 4 + k) = 0; lY(k) = 0; k += 1 }
            }
          } else {
          // 16x16 prediction: motion compensation from the selected
          // reference for inter MBs, the four intra modes otherwise
          val pred =
            if (interMb) {
              val out = new Array[Int](256)
              val refY = refIdx match {
                case 1 => st.yLast
                case 2 => st.yGold
                case _ => st.yAlt
              }
              mcPredict(refY, stride, refPlaneH, px, py, mvRow, mvCol,
                16, 16, out, 16, 0)
              out
            } else predict16(plane, stride, mx, my, ymode)
          val resid = new Array[Int](256)
          if (!skip) {
            // Y2
            val ctxY2 = aY2(mx) + lY2
            val nzY2 = decodeBlockTokens(bd2, probs(1), 0, ctxY2, levels)
            if (nzY2) mbAnyNz = true
            aY2(mx) = if (nzY2) 1 else 0
            lY2 = aY2(mx)
            var k = 0
            while (k < 16) {
              coeffs(k) = levels(k) * (if (k == 0) y2dcQ else y2acQ)
              k += 1
            }
            val dcs = inverseWht(coeffs)
            // 16 Y blocks
            var b = 0
            while (b < 16) {
              val br = b / 4
              val bc = b % 4
              val ctx = aY(mx * 4 + bc) + lY(br)
              val nz = decodeBlockTokens(bd2, probs(0), 1, ctx, levels)
              if (nz) mbAnyNz = true
              aY(mx * 4 + bc) = if (nz) 1 else 0
              lY(br) = aY(mx * 4 + bc)
              var k2 = 1
              coeffs(0) = dcs(b)
              while (k2 < 16) { coeffs(k2) = levels(k2) * yacQ; k2 += 1 }
              val r4 = inverseDct(coeffs)
              var rr = 0
              while (rr < 4) {
                var cc = 0
                while (cc < 4) {
                  resid((br * 4 + rr) * 16 + bc * 4 + cc) = r4(rr * 4 + cc)
                  cc += 1
                }
                rr += 1
              }
              b += 1
            }
          } else {
            // skipped MB: Y/Y2 contexts reset (UV reset in the shared
            // chroma section; the MB has Y2 in this subset)
            var i = 0
            while (i < 4) { aY(mx * 4 + i) = 0; lY(i) = 0; i += 1 }
            aY2(mx) = 0
            lY2 = 0
          }
          // reconstruct
          var r = 0
          while (r < 16) {
            var c = 0
            while (c < 16) {
              plane((py + r) * stride + px + c) =
                clamp255(pred(r * 16 + c) + resid(r * 16 + c))
              c += 1
            }
            r += 1
          }
          } // end 16x16 modes
          // chroma (both luma branches; token order per §13: after the
          // 16 Y blocks): type-2 tokens → UV dequant + IDCT residuals →
          // 8×8 intra prediction from reconstructed chroma neighbors
          val residU = new Array[Int](64)
          val residV = new Array[Int](64)
          if (!skip) {
            var pl = 0
            while (pl < 2) {
              val aC = if (pl == 0) aU else aV
              val lC = if (pl == 0) lU else lV
              val residC = if (pl == 0) residU else residV
              var cb = 0
              while (cb < 4) {
                val br = cb / 2
                val bc = cb % 2
                val ctx = aC(mx * 2 + bc) + lC(br)
                val nz = decodeBlockTokens(bd2, probs(2), 0, ctx, levels)
                // chroma coefficients count toward the eobtotal==0
                // interior-filter skip rule exactly like luma's
                if (nz) mbAnyNz = true
                aC(mx * 2 + bc) = if (nz) 1 else 0
                lC(br) = aC(mx * 2 + bc)
                var k = 0
                while (k < 16) {
                  coeffs(k) = levels(k) * (if (k == 0) uvdcQ else uvacQ)
                  k += 1
                }
                val r4 = inverseDct(coeffs)
                var rr = 0
                while (rr < 4) {
                  var cc = 0
                  while (cc < 4) {
                    residC((br * 4 + rr) * 8 + bc * 4 + cc) = r4(rr * 4 + cc)
                    cc += 1
                  }
                  rr += 1
                }
                cb += 1
              }
              pl += 1
            }
          } else {
            var k = 0
            while (k < 2) {
              aU(mx * 2 + k) = 0; lU(k) = 0
              aV(mx * 2 + k) = 0; lV(k) = 0
              k += 1
            }
          }
          if (interMb) {
            val (refU, refV) = refIdx match {
              case 1 => (st.uLast, st.vLast)
              case 2 => (st.uGold, st.vGold)
              case _ => (st.uAlt, st.vAlt)
            }
            val predU = new Array[Int](64)
            val predV = new Array[Int](64)
            if (interMode == MvSplit) {
              // SPLIT chroma: each 4×4 chroma block's MV is the round-
              // away average of its four luma block MVs (reconinter.c)
              var ci = 0
              while (ci < 2) {
                var cj = 0
                while (cj < 2) {
                  val b0 = 2 * ci * 4 + 2 * cj
                  def cavg(sel: Int => Int): Int = {
                    var t = sel(b0) + sel(b0 + 1) + sel(b0 + 4) + sel(b0 + 5)
                    if (t < 0) t -= 4 else t += 4
                    t / 8
                  }
                  val cr2 = cavg(b => splitMvs(b) >> 16)
                  val cc2 = cavg(b => splitMvs(b) << 16 >> 16)
                  val off = ci * 4 * 8 + cj * 4
                  mcPredict(refU, cStride, mbRows * 8, mx * 8 + cj * 4,
                    my * 8 + ci * 4, cr2, cc2, 4, 4, predU, 8, off)
                  mcPredict(refV, cStride, mbRows * 8, mx * 8 + cj * 4,
                    my * 8 + ci * 4, cr2, cc2, 4, 4, predV, 8, off)
                  cj += 1
                }
                ci += 1
              }
            } else {
              // chroma MVs: luma MV halved with round-away-from-zero
              // (reconinter.c), applied at the 8×8 chroma geometry
              val cmvRow = (mvRow + (1 | (mvRow >> 31))) / 2
              val cmvCol = (mvCol + (1 | (mvCol >> 31))) / 2
              mcPredict(refU, cStride, mbRows * 8, mx * 8, my * 8,
                cmvRow, cmvCol, 8, 8, predU, 8, 0)
              mcPredict(refV, cStride, mbRows * 8, mx * 8, my * 8,
                cmvRow, cmvCol, 8, 8, predV, 8, 0)
            }
            addResidChroma(uPlane, cStride, mx, my, predU, residU)
            addResidChroma(vPlane, cStride, mx, my, predV, residV)
          } else {
            predictReconChroma(uPlane, cStride, mx, my, uvmode, residU)
            predictReconChroma(vPlane, cStride, mx, my, uvmode, residV)
          }
          // B_PRED / SPLIT always filter interior edges (§15's skip
          // rule exempts only other modes with zero eobtotal)
          mbLfInner(my * mbCols + mx) =
            (if (interMb) interMode == MvSplit else ymode == ModeB) ||
              mbAnyNz
          mx += 1
        }
        my += 1
      }
      if (filterLevel > 0) {
        loopFilterPlane(plane, stride, mbCols, mbRows, 16, filterType,
          sharpness, mbLfLevel, mbLfInner, keyFrame)
        if (filterType == 0) {
          // §15.1: the simple filter applies to LUMA only
          loopFilterPlane(uPlane, cStride, mbCols, mbRows, 8, 0,
            sharpness, mbLfLevel, mbLfInner, keyFrame)
          loopFilterPlane(vPlane, cStride, mbCols, mbRows, 8, 0,
            sharpness, mbLfLevel, mbLfInner, keyFrame)
        }
      }
      st.w = w
      st.h = h
      st.stride = stride
      st.cStride = cStride
      // reference-buffer refresh (§9.7): copies read the PRE-frame
      // buffers (golden←last / golden←altref etc.), refreshes take the
      // new reconstruction; a key frame refreshes all three. Buffers
      // are shared by reference — each frame reconstructs fresh arrays.
      val (oldYL, oldUL, oldVL) = (st.yLast, st.uLast, st.vLast)
      val (oldYA, oldUA, oldVA) = (st.yAlt, st.uAlt, st.vAlt)
      val (oldYG, oldUG, oldVG) = (st.yGold, st.uGold, st.vGold)
      if (refreshGold) { st.yGold = plane; st.uGold = uPlane; st.vGold = vPlane }
      else if (copyToGold == 1) { st.yGold = oldYL; st.uGold = oldUL; st.vGold = oldVL }
      else if (copyToGold == 2) { st.yGold = oldYA; st.uGold = oldUA; st.vGold = oldVA }
      if (refreshAlt) { st.yAlt = plane; st.uAlt = uPlane; st.vAlt = vPlane }
      else if (copyToAlt == 1) { st.yAlt = oldYL; st.uAlt = oldUL; st.vAlt = oldVL }
      else if (copyToAlt == 2) { st.yAlt = oldYG; st.uAlt = oldUG; st.vAlt = oldVG }
      if (refreshLast) { st.yLast = plane; st.uLast = uPlane; st.vLast = vPlane }
      // the frame's own reconstruction (what a shown frame displays,
      // independent of which reference buffers it refreshed)
      st.yCur = plane
      st.uCur = uPlane
      st.vCur = vPlane
    }

  /** Decode a lossy-WebP (RIFF/"VP8 ") key frame in the documented
    * subset — FULL pixel surface since r14: luma AND both chroma planes
    * (4:2:0, so U/V are ⌈w/2⌉×⌈h/2⌉ row-major). Returns
    * (width, height, y, u, v) or None for anything malformed, truncated,
    * or out of subset. */
  private[graft] def decodeYuv(bytes: Array[Byte])
      : Option[(Int, Int, Array[Int], Array[Int], Array[Int])] =
    try {
      if (bytes.length < 30) return None
      if (new String(bytes, 0, 4, StandardCharsets.US_ASCII) != "RIFF" ||
        new String(bytes, 8, 4, StandardCharsets.US_ASCII) != "WEBP" ||
        new String(bytes, 12, 4, StandardCharsets.US_ASCII) != "VP8 ")
        return None
      def le32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      val chunkSize = le32(16)
      if (chunkSize < 10 || 20 + chunkSize > bytes.length) return None
      val st = new StreamState
      decodeFramePayload(bytes, 20, (20 + chunkSize).toInt, st)
      val w = st.w
      val h = st.h
      val stride = st.stride
      val cStride = st.cStride
      val plane = st.yCur
      val uPlane = st.uCur
      val vPlane = st.vCur
      val g = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { g(y * w + x) = plane(y * stride + x); x += 1 }
        y += 1
      }
      val uw = (w + 1) / 2
      val uh = (h + 1) / 2
      val u = new Array[Int](uw * uh)
      val v = new Array[Int](uw * uh)
      y = 0
      while (y < uh) {
        var x = 0
        while (x < uw) {
          u(y * uw + x) = uPlane(y * cStride + x)
          v(y * uw + x) = vPlane(y * cStride + x)
          x += 1
        }
        y += 1
      }
      Some((w, h, g, u, v))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }


  // -------------------------------------------------------------------
  // Fixture encoder
  // -------------------------------------------------------------------

  /** Build a spec-valid lossy-WebP key frame whose luma is
    * per-macroblock constant: pixel(x, y) = clamp(mbVal(x/16, y/16)).
    * Every macroblock is DC_PRED; a block whose DC prediction already
    * equals its target SKIPS (no residual at all), and the rest plant
    * one Y2 DC coefficient whose dequant → inverse-WHT → inverse-DCT
    * chain lands EXACTLY on the target (qindex 4 ⇒ y2dc quantizer 16;
    * level 4·d ⇒ per-subblock DC 8·d ⇒ pixel delta d, integer-exact for
    * any d ∈ [-255, 255] — the planted-formula contract the driver gate
    * hashes). Chroma rides all-zero (gray). With `filterLevel` > 0 the
    * loop filter smooths across UNEQUAL-neighbor MB edges, so the
    * per-MB-constant contract then holds only away from filtered edges
    * — exactly what the filtered-edge gate query exploits (the edge
    * pixels become closed-form functions of the two MB values). */
  private[graft] def makeWebpLossy(w: Int, h: Int,
      mbVal: (Int, Int) => Int, filterType: Int = 0,
      filterLevel: Int = 0, sharpness: Int = 0,
      nTokenParts: Int = 1): Array[Byte] = {
    // per-MB-constant DC_PRED reconstruction is itself constant, so the
    // decoder's DC prediction is computable from neighbor targets alone
    def tOf(mx: Int, my: Int): Int = clamp255(mbVal(mx, my))
    def predOf(mx: Int, my: Int): Int = {
      val haveA = my > 0
      val haveL = mx > 0
      if (haveA && haveL) (16 * tOf(mx, my - 1) + 16 * tOf(mx - 1, my) + 16) >> 5
      else if (haveA) tOf(mx, my - 1)
      else if (haveL) tOf(mx - 1, my)
      else 128
    }
    val zero = new Array[Int](16)
    makeWebpLossyFrame(w, h,
      mbMode = (_, _) => ModeDc,
      y2Of = (mx, my) => {
        val d = tOf(mx, my) - predOf(mx, my)
        if (d == 0) zero
        else { val a = new Array[Int](16); a(0) = 4 * d; a }
      },
      yOf = (_, _, _) => zero,
      filterType = filterType, filterLevel = filterLevel,
      sharpness = sharpness, nTokenParts = nTokenParts)._1
  }

  /** General spec-valid key-frame fixture: per-MB 16×16 intra mode
    * (0 DC / 1 V / 2 H / 3 TM) plus ARBITRARY planted quantized levels
    * for the Y2 block and each Y block (SCAN order; Y position 0 is
    * owned by Y2 and forced to zero) — the fixture form that drives the
    * AC token machinery end to end: multi-coefficient runs, in-block
    * zero runs (the skip-EOB-after-zero rule both ways), EOB at every
    * position, zigzag placement, band indexing, per-block nonzero
    * context propagation, and the V/H/TM prediction paths with their
    * 127/129 missing-edge fills. Returns (file bytes, expected luma
    * plane w×h) — the expectation is the encoder's own reconstruction
    * simulation, which shares the transforms with the decoder but NONE
    * of the entropy/bitstream path, so a decode comparison verifies the
    * coder, trees, contexts, and dequant wiring exactly. */
  private[graft] def makeWebpLossyFrame(w: Int, h: Int,
      mbMode: (Int, Int) => Int,
      y2Of: (Int, Int) => Array[Int],
      yOf: (Int, Int, Int) => Array[Int],
      bModeOf: (Int, Int, Int) => Int = (_, _, _) => BModeDc,
      filterType: Int = 0, filterLevel: Int = 0, sharpness: Int = 0,
      lfRefDeltaIntra: Int = 0, lfModeDeltaBpred: Int = 0,
      nTokenParts: Int = 1,
      segQIdx: Array[Int] = null, segLfLvl: Array[Int] = null,
      segOf: (Int, Int) => Int = (_, _) => 0)
      : (Array[Byte], Array[Int]) = {
    val (bytes, y, _, _) = makeWebpLossyFrameYuv(w, h, mbMode, y2Of, yOf,
      bModeOf = bModeOf, filterType = filterType, filterLevel = filterLevel,
      sharpness = sharpness, lfRefDeltaIntra = lfRefDeltaIntra,
      lfModeDeltaBpred = lfModeDeltaBpred, nTokenParts = nTokenParts,
      segQIdx = segQIdx, segLfLvl = segLfLvl, segOf = segOf)
    (bytes, y)
  }

  private val ZeroScan16 = new Array[Int](16)

  /** Full-surface fixture encoder (r14): [[makeWebpLossyFrame]] plus
    * planted CHROMA — `uvOf(mx, my, pl, cb)` gives the 16 SCAN-order
    * quantized levels for chroma block cb (0..3, raster within the 8×8
    * MB region) of plane pl (0 = U, 1 = V), and `uvModeOf` the per-MB
    * 8×8 chroma intra mode (0 DC / 1 V / 2 H / 3 TM). Returns
    * (file bytes, expected Y w×h, expected U, expected V) with U/V
    * cropped to ⌈w/2⌉×⌈h/2⌉ — the same reconstruction-simulation
    * contract as the luma form, now over all three planes. */
  private[graft] def makeWebpLossyFrameYuv(w: Int, h: Int,
      mbMode: (Int, Int) => Int,
      y2Of: (Int, Int) => Array[Int],
      yOf: (Int, Int, Int) => Array[Int],
      uvOf: (Int, Int, Int, Int) => Array[Int] = (_, _, _, _) => ZeroScan16,
      uvModeOf: (Int, Int) => Int = (_, _) => ModeDc,
      bModeOf: (Int, Int, Int) => Int = (_, _, _) => BModeDc,
      filterType: Int = 0, filterLevel: Int = 0, sharpness: Int = 0,
      lfRefDeltaIntra: Int = 0, lfModeDeltaBpred: Int = 0,
      nTokenParts: Int = 1,
      segQIdx: Array[Int] = null, segLfLvl: Array[Int] = null,
      segOf: (Int, Int) => Int = (_, _) => 0,
      segDeltaMode: Boolean = false, segCodeMap: Boolean = true)
      : (Array[Byte], Array[Int], Array[Int], Array[Int]) = {
    require(w > 0 && h > 0 && w <= 16383 && h <= 16383)
    require(nTokenParts == 1 || nTokenParts == 2 || nTokenParts == 4 ||
      nTokenParts == 8, s"token partitions must be 1/2/4/8: $nTokenParts")
    require(filterType == 0 || filterType == 1)
    require(filterLevel >= 0 && filterLevel <= 63)
    require(sharpness >= 0 && sharpness <= 7)
    require(math.abs(lfRefDeltaIntra) <= 63 && math.abs(lfModeDeltaBpred) <= 63)
    // segmentation (§9.3): segQIdx non-null enables it — 4 per-segment
    // y_ac quant values and 4 filter-level values (defaulting to the
    // frame level so the filterLevel parameter keeps its meaning),
    // ABSOLUTE by default or SIGNED DELTAS off the frame base with
    // segDeltaMode, and a fully-coded map (all three tree probs
    // written) unless segCodeMap = false — the enabled-but-not-updated
    // layout that decodes every MB as segment 0
    val segOn = segQIdx != null
    require(!segOn || (segQIdx.length == 4 && segQIdx.forall(q =>
      if (segDeltaMode) math.abs(q) <= 127 else q >= 0 && q <= 127)),
      "segment quant values must be 4 indices in 0..127 (abs) or " +
        "deltas in -127..127")
    val segLfL =
      if (!segOn) null
      else if (segLfLvl == null) {
        if (segDeltaMode) new Array[Int](4) else Array.fill(4)(filterLevel)
      } else segLfLvl
    require(segLfL == null || (segLfL.length == 4 && segLfL.forall(l =>
      if (segDeltaMode) math.abs(l) <= 63 else l >= 0 && l <= 63)),
      "segment filter levels must be 4 values in 0..63 (abs) or " +
        "deltas in -63..63")
    val mbCols = (w + 15) / 16
    val mbRows = (h + 15) / 16
    val qi = 4 // dc_qlookup(4) = 8 → y2dc quantizer 16 (segment-off base)
    def qiOf(s: Int): Int =
      if (!segOn) qi
      else if (segDeltaMode) clampQ(qi + segQIdx(s))
      else segQIdx(s)
    val ydcQs = Array.tabulate(4)(s => DcQLookup(qiOf(s)))
    val yacQs = Array.tabulate(4)(s => AcQLookup(qiOf(s)))
    val y2dcQs = Array.tabulate(4)(s => DcQLookup(qiOf(s)) * 2)
    val y2acQs =
      Array.tabulate(4)(s => math.max(8, AcQLookup(qiOf(s)) * 155 / 100))
    // chroma quantizers: zero uv deltas, §14.1 cap on the DC factor
    val uvdcQs = Array.tabulate(4)(s => math.min(132, DcQLookup(qiOf(s))))
    val uvacQs = Array.tabulate(4)(s => AcQLookup(qiOf(s)))
    val be1 = new BoolEncoder
    // header
    be1.literal(0, 1) // color space
    be1.literal(0, 1) // clamping
    if (!segOn) be1.literal(0, 1) // segmentation off
    else {
      be1.literal(1, 1) // segmentation_enabled
      be1.literal(if (segCodeMap) 1 else 0, 1) // update_mb_segmentation_map
      be1.literal(1, 1) // update_segment_feature_data
      be1.literal(if (segDeltaMode) 0 else 1, 1) // feature mode
      var s = 0
      while (s < 4) { // quantizer features, 7-bit magnitude + sign
        be1.literal(1, 1)
        be1.literal(math.abs(segQIdx(s)), 7)
        be1.literal(if (segQIdx(s) < 0) 1 else 0, 1)
        s += 1
      }
      s = 0
      while (s < 4) { // loop-filter features, 6-bit magnitude + sign
        be1.literal(1, 1)
        be1.literal(math.abs(segLfL(s)), 6)
        be1.literal(if (segLfL(s) < 0) 1 else 0, 1)
        s += 1
      }
      if (segCodeMap) {
        s = 0
        while (s < 3) { // mb_segment_tree_probs, all written as 128
          be1.literal(1, 1)
          be1.literal(128, 8)
          s += 1
        }
      }
    }
    be1.literal(filterType, 1)
    be1.literal(filterLevel, 6)
    be1.literal(sharpness, 3)
    if (lfRefDeltaIntra == 0 && lfModeDeltaBpred == 0)
      be1.literal(0, 1) // no lf deltas
    else {
      // delta block: slots 0-3 = ref deltas (0 = INTRA), 4-7 = mode
      // deltas (4 = B_PRED) — the two that apply to all-intra key frames
      be1.literal(1, 1) // mode_ref_lf_delta_enabled
      be1.literal(1, 1) // update this frame
      var i = 0
      while (i < 8) {
        val v = if (i == 0) lfRefDeltaIntra
          else if (i == 4) lfModeDeltaBpred else 0
        if (v == 0) be1.literal(0, 1)
        else {
          be1.literal(1, 1)
          be1.literal(math.abs(v), 6)
          be1.literal(if (v < 0) 1 else 0, 1)
        }
        i += 1
      }
    }
    // token partition count (§9.5): log2, 2 bits
    be1.literal(Integer.numberOfTrailingZeros(nTokenParts), 2)
    be1.literal(qi, 7) // y_ac_qi
    var i = 0
    while (i < 5) { be1.literal(0, 1); i += 1 } // five zero q deltas
    be1.literal(1, 1) // refresh entropy probs
    // no coefficient probability updates
    var t = 0
    while (t < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var l = 0
          while (l < 11) { be1.bool(CoeffUpdateProbs(t)(b)(c)(l), 0); l += 1 }
          c += 1
        }
        b += 1
      }
      t += 1
    }
    be1.literal(1, 1) // mb_no_coeff_skip enabled
    val skipProb = 128
    be1.literal(skipProb, 8)
    val be2s = Array.fill(nTokenParts)(new BoolEncoder)
    val probs = DefaultCoeffProbs
    val aY = new Array[Int](mbCols * 4)
    val aU = new Array[Int](mbCols * 2)
    val aV = new Array[Int](mbCols * 2)
    val aY2 = new Array[Int](mbCols)
    val aBm = new Array[Int](mbCols * 4)
    val lBm = new Array[Int](4)
    val lY = new Array[Int](4)
    val lU = new Array[Int](2)
    val lV = new Array[Int](2)
    // reconstruction simulation — byte-for-byte the decoder's planes, so
    // the returned expectations are exact
    val stride = mbCols * 16
    val plane = new Array[Int](stride * mbRows * 16)
    val cStride = mbCols * 8
    val uPlane = new Array[Int](cStride * mbRows * 8)
    val vPlane = new Array[Int](cStride * mbRows * 8)
    val coeffs = new Array[Int](16)
    // loop-filter inputs mirroring the decoder: delta-adjusted per-MB
    // level, inner = B_PRED or any planted coeff
    val mbLfInner = new Array[Boolean](mbCols * mbRows)
    val mbLfLevel = new Array[Int](mbCols * mbRows)
    var my = 0
    while (my < mbRows) {
      val be2 = be2s(my % nTokenParts) // §9.5 row→partition routing
      java.util.Arrays.fill(lY, 0)
      java.util.Arrays.fill(lU, 0)
      java.util.Arrays.fill(lV, 0)
      java.util.Arrays.fill(lBm, 0)
      var lY2 = 0
      var mx = 0
      while (mx < mbCols) {
        val mode = mbMode(mx, my)
        require(mode >= ModeDc && mode <= ModeB, s"bad luma mode $mode")
        val isB = mode == ModeB
        // a frame that does not code the map decodes as all-segment-0
        val seg = if (segOn && segCodeMap) segOf(mx, my) else 0
        require(seg >= 0 && seg < 4, s"bad segment id $seg")
        val ydcQ = ydcQs(seg)
        val yacQ = yacQs(seg)
        val y2dcQ = y2dcQs(seg)
        val y2acQ = y2acQs(seg)
        val uvdcQ = uvdcQs(seg)
        val uvacQ = uvacQs(seg)
        val y2Scan = if (isB) new Array[Int](16) else y2Of(mx, my).clone()
        require(y2Scan.length == 16)
        val yScans = Array.tabulate(16) { b =>
          val a = yOf(mx, my, b).clone()
          require(a.length == 16)
          if (!isB) a(0) = 0 // Y position 0 is owned by Y2 (non-B only)
          a
        }
        val uvScans = Array.tabulate(2, 4) { (pl, cb) =>
          val a = uvOf(mx, my, pl, cb).clone()
          require(a.length == 16)
          a
        }
        val skip = y2Scan.forall(_ == 0) && yScans.forall(_.forall(_ == 0)) &&
          uvScans.forall(_.forall(_.forall(_ == 0)))
        // inner-edge rule, identically to the decoder: B_PRED always,
        // otherwise iff any coefficient lands (skip ⟺ all-zero plants)
        mbLfInner(my * mbCols + mx) = isB || !skip
        // segment lf base first (absolute replaces, delta offsets,
        // clamped), then the deltas — the decoder's two-step clamp order
        val segLfBase =
          if (!segOn) filterLevel
          else math.max(0, math.min(63,
            if (segDeltaMode) filterLevel + segLfL(seg) else segLfL(seg)))
        mbLfLevel(my * mbCols + mx) = math.max(0, math.min(63,
          segLfBase + lfRefDeltaIntra +
            (if (isB) lfModeDeltaBpred else 0)))
        // segment id rides FIRST in the MB header (§10), before skip
        if (segOn && segCodeMap) {
          be1.bool(128, if (seg >= 2) 1 else 0)
          be1.bool(128, seg & 1)
        }
        be1.bool(skipProb, if (skip) 1 else 0)
        // ymode on the key-frame tree {-B, 2, 4, 6, -DC, -V, -H, -TM}:
        // B=0  DC=1,0,0  V=1,0,1  H=1,1,0  TM=1,1,1
        if (isB) be1.bool(KfYModeProb(0), 0)
        else {
          be1.bool(KfYModeProb(0), 1)
          be1.bool(KfYModeProb(1), if (mode <= ModeV) 0 else 1)
          if (mode <= ModeV) be1.bool(KfYModeProb(2), mode)
          else be1.bool(KfYModeProb(3), mode - ModeH)
        }
        // B_PRED sub-modes: context-coded tree paths, mirroring the
        // decoder's above/left tracking exactly
        val subModes = new Array[Int](16)
        if (isB) {
          var b = 0
          while (b < 16) {
            val br = b / 4
            val bc = b % 4
            val spec = bModeOf(mx, my, b) // SPEC sub-mode ids since r13
            require(spec >= BModeDc && spec <= BModeHu,
              s"bad 4x4 sub-mode $spec")
            require(!(bModeUsesAr(spec) && bc == 3 && my > 0 &&
              mx == mbCols - 1),
              "above-right sub-mode in the rightmost macroblock column " +
                "below the top row: off-frame convention not in subset")
            val p = KfBModeProbs(aBm(mx * 4 + bc))(lBm(br))
            val path = BModePaths(spec)
            var k = 0
            while (k < path.length) {
              val (node, bit) = path(k)
              be1.bool(p(node >> 1), bit)
              k += 1
            }
            subModes(b) = spec
            aBm(mx * 4 + bc) = spec
            lBm(br) = spec
            b += 1
          }
        } else {
          var b = 0
          while (b < 4) { aBm(mx * 4 + b) = 0; lBm(b) = 0; b += 1 }
        }
        // uvmode on the kf chroma tree {-DC, 2, -V, 4, -H, -TM}:
        // DC=0  V=1,0  H=1,1,0  TM=1,1,1
        val uvMode = uvModeOf(mx, my)
        require(uvMode >= ModeDc && uvMode <= ModeTm,
          s"bad chroma mode $uvMode")
        if (uvMode == ModeDc) be1.bool(KfUvModeProb(0), 0)
        else {
          be1.bool(KfUvModeProb(0), 1)
          if (uvMode == ModeV) be1.bool(KfUvModeProb(1), 0)
          else {
            be1.bool(KfUvModeProb(1), 1)
            be1.bool(KfUvModeProb(2), uvMode - ModeH)
          }
        }
        val px = mx * 16
        val py = my * 16
        if (isB) {
          encodeRecoBPred(be2, skip, plane, stride, mbCols, mx, my,
            subModes, yScans, aY, lY, ydcQ, yacQ)
        } else {
        // prediction from the simulated plane (the decoder's exact rules)
        val pred = predict16(plane, stride, mx, my, mode)
        val resid = new Array[Int](256)
        if (!skip) {
          // tokens + residual simulation
          val ctxY2 = aY2(mx) + lY2
          val nzY2 = encodeBlockTokens(be2, probs(1), 0, ctxY2, y2Scan)
          aY2(mx) = if (nzY2) 1 else 0
          lY2 = aY2(mx)
          var k = 0
          while (k < 16) {
            coeffs(Zigzag(k)) = y2Scan(k) * (if (k == 0) y2dcQ else y2acQ)
            k += 1
          }
          val dcs = inverseWht(coeffs)
          var b = 0
          while (b < 16) {
            val br = b / 4
            val bc = b % 4
            val ctx = aY(mx * 4 + bc) + lY(br)
            val nz = encodeBlockTokens(be2, probs(0), 1, ctx, yScans(b))
            aY(mx * 4 + bc) = if (nz) 1 else 0
            lY(br) = aY(mx * 4 + bc)
            java.util.Arrays.fill(coeffs, 0)
            var k2 = 1
            while (k2 < 16) {
              coeffs(Zigzag(k2)) = yScans(b)(k2) * yacQ
              k2 += 1
            }
            coeffs(0) = dcs(b)
            val r4 = inverseDct(coeffs)
            var rr = 0
            while (rr < 4) {
              var cc = 0
              while (cc < 4) {
                resid((br * 4 + rr) * 16 + bc * 4 + cc) = r4(rr * 4 + cc)
                cc += 1
              }
              rr += 1
            }
            b += 1
          }
        } else {
          var k = 0
          while (k < 4) { aY(mx * 4 + k) = 0; lY(k) = 0; k += 1 }
          aY2(mx) = 0
          lY2 = 0
        }
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 16) {
            plane((py + r) * stride + px + c) =
              clamp255(pred(r * 16 + c) + resid(r * 16 + c))
            c += 1
          }
          r += 1
        }
        } // end 16x16 modes
        // chroma (both luma branches, after the 16 Y blocks): planted
        // tokens + residual simulation + 8×8 intra, mirroring the
        // decoder's shared section exactly
        val residU = new Array[Int](64)
        val residV = new Array[Int](64)
        if (!skip) {
          var pl = 0
          while (pl < 2) {
            val aC = if (pl == 0) aU else aV
            val lC = if (pl == 0) lU else lV
            val residC = if (pl == 0) residU else residV
            var cb = 0
            while (cb < 4) {
              val br = cb / 2
              val bc = cb % 2
              val nz = encodeBlockTokens(be2, probs(2), 0,
                aC(mx * 2 + bc) + lC(br), uvScans(pl)(cb))
              aC(mx * 2 + bc) = if (nz) 1 else 0
              lC(br) = aC(mx * 2 + bc)
              java.util.Arrays.fill(coeffs, 0)
              var k = 0
              while (k < 16) {
                coeffs(Zigzag(k)) =
                  uvScans(pl)(cb)(k) * (if (k == 0) uvdcQ else uvacQ)
                k += 1
              }
              val r4 = inverseDct(coeffs)
              var rr = 0
              while (rr < 4) {
                var cc = 0
                while (cc < 4) {
                  residC((br * 4 + rr) * 8 + bc * 4 + cc) = r4(rr * 4 + cc)
                  cc += 1
                }
                rr += 1
              }
              cb += 1
            }
            pl += 1
          }
        } else {
          var k = 0
          while (k < 2) {
            aU(mx * 2 + k) = 0; lU(k) = 0
            aV(mx * 2 + k) = 0; lV(k) = 0
            k += 1
          }
        }
        predictReconChroma(uPlane, cStride, mx, my, uvMode, residU)
        predictReconChroma(vPlane, cStride, mx, my, uvMode, residV)
        mx += 1
      }
      my += 1
    }
    if (filterLevel > 0) {
      loopFilterPlane(plane, stride, mbCols, mbRows, 16, filterType,
        sharpness, mbLfLevel, mbLfInner)
      if (filterType == 0) {
        // §15.1: the simple filter applies to LUMA only
        loopFilterPlane(uPlane, cStride, mbCols, mbRows, 8, 0, sharpness,
          mbLfLevel, mbLfInner)
        loopFilterPlane(vPlane, cStride, mbCols, mbRows, 8, 0, sharpness,
          mbLfLevel, mbLfInner)
      }
    }
    val expected = new Array[Int](w * h)
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) { expected(yy * w + xx) = plane(yy * stride + xx); xx += 1 }
      yy += 1
    }
    val uw = (w + 1) / 2
    val uh = (h + 1) / 2
    val expU = new Array[Int](uw * uh)
    val expV = new Array[Int](uw * uh)
    yy = 0
    while (yy < uh) {
      var xx = 0
      while (xx < uw) {
        expU(yy * uw + xx) = uPlane(yy * cStride + xx)
        expV(yy * uw + xx) = vPlane(yy * cStride + xx)
        xx += 1
      }
      yy += 1
    }
    val p1 = be1.flush()
    val parts = be2s.map(_.flush())
    // first_part_size is a 19-bit field: a partition that outgrows it
    // would silently wrap in the 3-byte tag and emit a corrupt file
    // whose returned expectation matches no decode
    require(p1.length < (1 << 19),
      s"first partition ${p1.length} B overflows the 19-bit frame-tag field")
    // non-last token partition sizes ride 3-byte fields (§9.5)
    parts.dropRight(1).foreach(p => require(p.length < (1 << 24),
      s"token partition ${p.length} B overflows its 3-byte size field"))
    val sizeTableLen = 3 * (nTokenParts - 1)
    val payloadLen = 10 + p1.length + sizeTableLen + parts.map(_.length).sum
    val tag = p1.length << 5 | (1 << 4) // key frame, version 0, shown
    val padded = payloadLen + (payloadLen & 1)
    val bb = java.nio.ByteBuffer.allocate(20 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(12 + padded)
    bb.put("WEBP".getBytes(StandardCharsets.US_ASCII))
    bb.put("VP8 ".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(payloadLen)
    bb.put((tag & 0xff).toByte)
    bb.put(((tag >> 8) & 0xff).toByte)
    bb.put(((tag >> 16) & 0xff).toByte)
    bb.put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
    bb.putShort((w & 0x3fff).toShort)
    bb.putShort((h & 0x3fff).toShort)
    bb.put(p1)
    parts.dropRight(1).foreach { p =>
      bb.put((p.length & 0xff).toByte)
      bb.put(((p.length >> 8) & 0xff).toByte)
      bb.put(((p.length >> 16) & 0xff).toByte)
    }
    parts.foreach(bb.put)
    (bb.array(), expected, expU, expV)
  }

  // -------------------------------------------------------------------
  // IVF container + inter frames (RFC 6386 §9.7/16/17/18)
  // -------------------------------------------------------------------

  /** Decode an IVF-contained VP8 stream ("DKIF"/"VP80" — the public
    * libvpx stream format) in the documented subset: a key frame (the
    * full key-frame surface) followed by inter frames whose MBs are
    * all inter-coded (any reference, ZERO/NEAREST/NEAR/NEW whole-MB
    * modes; SPLIT and intra-in-inter are out of subset), with reference
    * refresh/copy plans, sign biases, entropy persistence, and the loop
    * filter all honored. Returns (w, h, frames as (y, u, v) cropped
    * planes) or None. */
  private[graft] def decodeIvf(bytes: Array[Byte])
      : Option[(Int, Int, Seq[(Array[Int], Array[Int], Array[Int])])] =
    try {
      if (bytes.length < 32) return None
      if (new String(bytes, 0, 4, StandardCharsets.US_ASCII) != "DKIF")
        return None
      def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def le32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      if (le16(4) != 0 || le16(6) != 32) return None // version / hdr size
      if (new String(bytes, 8, 4, StandardCharsets.US_ASCII) != "VP80")
        return None
      val w = le16(12)
      val h = le16(14)
      val nFrames = le32(24)
      if (w <= 0 || h <= 0 || nFrames <= 0 || nFrames > 10000) return None
      val st = new StreamState
      val out = Seq.newBuilder[(Array[Int], Array[Int], Array[Int])]
      var off = 32
      var i = 0L
      while (i < nFrames) {
        if (off + 12 > bytes.length) return None
        val sz = le32(off)
        if (sz <= 0 || off + 12 + sz > bytes.length) return None
        decodeFramePayload(bytes, off + 12, (off + 12 + sz).toInt, st)
        if (st.w != w || st.h != h) return None // dims must match the container
        // crop the frame's own reconstruction
        val g = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { g(y * w + x) = st.yCur(y * st.stride + x); x += 1 }
          y += 1
        }
        val uw = (w + 1) / 2
        val uh = (h + 1) / 2
        val u = new Array[Int](uw * uh)
        val v = new Array[Int](uw * uh)
        y = 0
        while (y < uh) {
          var x = 0
          while (x < uw) {
            u(y * uw + x) = st.uCur(y * st.cStride + x)
            v(y * uw + x) = st.vCur(y * st.cStride + x)
            x += 1
          }
          y += 1
        }
        out += ((g, u, v))
        off += 12 + sz.toInt
        i += 1
      }
      Some((w, h, out.result()))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Header-only IVF frame census: per frame (isKey, payload size) read
    * from the 12-byte frame headers + 3-byte VP8 frame tags alone — no
    * entropy decode, no reconstruction. This is the 100 TB sampling
    * primitive: a corpus-scale video pipeline filters to key frames at
    * container-walk speed (bytes touched = O(frames), not O(pixels))
    * BEFORE spending any decode work. Returns None on a malformed
    * container. */
  private[graft] def ivfFrameMeta(bytes: Array[Byte])
      : Option[Seq[(Boolean, Int)]] =
    try {
      if (bytes.length < 32 ||
        new String(bytes, 0, 4, StandardCharsets.US_ASCII) != "DKIF" ||
        new String(bytes, 8, 4, StandardCharsets.US_ASCII) != "VP80")
        return None
      def le32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      val nFrames = le32(24)
      if (nFrames <= 0 || nFrames > 10000) return None
      val out = Seq.newBuilder[(Boolean, Int)]
      var off = 32
      var i = 0L
      while (i < nFrames) {
        if (off + 12 > bytes.length) return None
        val sz = le32(off)
        if (sz <= 0 || off + 12 + sz > bytes.length) return None
        val isKey = (bytes(off + 12) & 1) == 0
        out += ((isKey, sz.toInt))
        off += 12 + sz.toInt
        i += 1
      }
      Some(out.result())
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Decode ONLY the key frames of an IVF stream, skipping inter-frame
    * payloads entirely (each key frame is self-contained: it resets
    * entropy state and needs no reference — §9.7). Returns
    * (w, h, (frameIndex, luma) per key frame). Sampling caveat,
    * documented: loop-filter DELTA state nominally persists across the
    * skipped frames; a stream whose key frames rely on deltas carried
    * from skipped inter frames is out of this path's subset (key frames
    * that disable deltas or carry their own update decode exactly). */
  private[graft] def decodeIvfKeyFrames(bytes: Array[Byte])
      : Option[(Int, Int, Seq[(Int, Array[Int])])] =
    try {
      val meta = ivfFrameMeta(bytes) match {
        case Some(m) => m
        case None => return None
      }
      def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      val w = le16(12)
      val h = le16(14)
      val out = Seq.newBuilder[(Int, Array[Int])]
      var off = 32
      var idx = 0
      meta.foreach { case (isKey, sz) =>
        if (isKey) {
          val st = new StreamState
          decodeFramePayload(bytes, off + 12, off + 12 + sz, st)
          if (st.w != w || st.h != h) throw Malformed
          val g = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { g(y * w + x) = st.yCur(y * st.stride + x); x += 1 }
            y += 1
          }
          out += ((idx, g))
        }
        off += 12 + sz
        idx += 1
      }
      Some((w, h, out.result()))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Per-MB directive for the inter fixture encoder: the prediction
    * mode ([[MvZero]]/[[MvNearest]]/[[MvNear]]/[[MvNew]]), the reference
    * (1 last / 2 golden / 3 altref), and — for NEW — the absolute MV in
    * 1/8-pel units (components must be even: whole-MB MVs carry a ×2
    * factor per §17.2). */
  private[graft] final case class InterMbSpec(mode: Int, refIdx: Int = 1,
      mvRow: Int = 0, mvCol: Int = 0,
      intraYMode: Int = -1, intraUvMode: Int = 0,
      splitStyle: Int = -1)

  /** Build one spec-valid INTER frame payload against the given
    * reference planes (index 1 last / 2 golden / 3 altref, each on the
    * w×h grid — dims must be multiples of 16 so the padded and cropped
    * grids coincide). Shares [[findNearMvs]] and [[mcPredict]] with the
    * decoder, so NEAREST/NEAR resolve identically and the returned
    * reconstruction simulation is exact. Returns (payload, y, u, v). */
  private[graft] def makeInterFramePayload(w: Int, h: Int,
      refs: Int => (Array[Int], Array[Int], Array[Int]),
      mbOf: (Int, Int) => InterMbSpec,
      y2Of: (Int, Int) => Array[Int],
      yOf: (Int, Int, Int) => Array[Int],
      uvOf: (Int, Int, Int, Int) => Array[Int] = (_, _, _, _) => ZeroScan16,
      bModeOf: (Int, Int, Int) => Int = (_, _, _) => BModeDc,
      splitMvOf: (Int, Int, Int) => (Int, Int) = (_, _, _) => (0, 0),
      filterType: Int = 0, filterLevel: Int = 0, sharpness: Int = 0,
      refreshGold: Boolean = false, refreshAlt: Boolean = false,
      segQIdx: Array[Int] = null, segLfLvl: Array[Int] = null,
      segOf: (Int, Int) => Int = (_, _) => 0,
      segWriteData: Boolean = true)
      : (Array[Byte], Array[Int], Array[Int], Array[Int]) = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
      "inter fixture dims must be multiples of 16")
    // segmentation (§9.3), mirroring the key-frame encoder: absolute
    // feature mode, fully-coded map. With segWriteData = false the
    // frame relies on feature data PERSISTED in the decoder's stream
    // state (a prior frame must have written the same values) — the
    // cross-frame persistence path the decoder implements
    val segOn = segQIdx != null
    require(!segOn ||
      (segQIdx.length == 4 && segQIdx.forall(q => q >= 0 && q <= 127)),
      "segment quant indices must be 4 values in 0..127")
    val segLfL =
      if (!segOn) null
      else if (segLfLvl == null) Array.fill(4)(filterLevel)
      else segLfLvl
    require(segLfL == null ||
      (segLfL.length == 4 && segLfL.forall(l => l >= 0 && l <= 63)),
      "segment filter levels must be 4 values in 0..63")
    val mbCols = w / 16
    val mbRows = h / 16
    val qi = 4
    def qiOf(s: Int): Int = if (segOn) segQIdx(s) else qi
    val ydcQs = Array.tabulate(4)(s => DcQLookup(qiOf(s)))
    val yacQs = Array.tabulate(4)(s => AcQLookup(qiOf(s)))
    val y2dcQs = Array.tabulate(4)(s => DcQLookup(qiOf(s)) * 2)
    val y2acQs =
      Array.tabulate(4)(s => math.max(8, AcQLookup(qiOf(s)) * 155 / 100))
    val uvdcQs = Array.tabulate(4)(s => math.min(132, DcQLookup(qiOf(s))))
    val uvacQs = Array.tabulate(4)(s => AcQLookup(qiOf(s)))
    val be1 = new BoolEncoder
    // inter-frame header (no color space / clamping)
    if (!segOn) be1.literal(0, 1) // segmentation off
    else {
      be1.literal(1, 1) // segmentation_enabled
      be1.literal(1, 1) // update_mb_segmentation_map
      if (!segWriteData) be1.literal(0, 1) // rely on persisted data
      else {
        be1.literal(1, 1) // update_segment_feature_data
        be1.literal(1, 1) // absolute feature mode
        var s = 0
        while (s < 4) {
          be1.literal(1, 1)
          be1.literal(segQIdx(s), 7)
          be1.literal(0, 1)
          s += 1
        }
        s = 0
        while (s < 4) {
          be1.literal(1, 1)
          be1.literal(segLfL(s), 6)
          be1.literal(0, 1)
          s += 1
        }
      }
      var s = 0
      while (s < 3) { // mb_segment_tree_probs
        be1.literal(1, 1)
        be1.literal(128, 8)
        s += 1
      }
    }
    be1.literal(filterType, 1)
    be1.literal(filterLevel, 6)
    be1.literal(sharpness, 3)
    be1.literal(0, 1) // no lf deltas
    be1.literal(0, 2) // one token partition
    be1.literal(qi, 7)
    var i = 0
    while (i < 5) { be1.literal(0, 1); i += 1 } // zero q deltas
    be1.literal(if (refreshGold) 1 else 0, 1)
    be1.literal(if (refreshAlt) 1 else 0, 1)
    if (!refreshGold) be1.literal(0, 2) // no copy to golden
    if (!refreshAlt) be1.literal(0, 2) // no copy to altref
    be1.literal(0, 1) // sign bias golden
    be1.literal(0, 1) // sign bias altref
    be1.literal(1, 1) // refresh entropy probs
    be1.literal(1, 1) // refresh last
    // no coefficient probability updates
    var t = 0
    while (t < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var l = 0
          while (l < 11) { be1.bool(CoeffUpdateProbs(t)(b)(c)(l), 0); l += 1 }
          c += 1
        }
        b += 1
      }
      t += 1
    }
    be1.literal(1, 1) // mb_no_coeff_skip enabled
    val skipProb = 128
    be1.literal(skipProb, 8)
    val probIntra = 128
    val probLast = 128
    val probGf = 128
    be1.literal(probIntra, 8)
    be1.literal(probLast, 8)
    be1.literal(probGf, 8)
    be1.literal(0, 1) // no 16x16 intra prob update
    be1.literal(0, 1) // no chroma prob update
    // no MV probability updates
    var c0 = 0
    while (c0 < 2) {
      var j = 0
      while (j < 19) { be1.bool(MvUpdateProbs(c0)(j), 0); j += 1 }
      c0 += 1
    }
    val mvp = DefaultMvContext
    val be2 = new BoolEncoder
    val probs = DefaultCoeffProbs
    val aY = new Array[Int](mbCols * 4)
    val aU = new Array[Int](mbCols * 2)
    val aV = new Array[Int](mbCols * 2)
    val aY2 = new Array[Int](mbCols)
    val lY = new Array[Int](4)
    val lU = new Array[Int](2)
    val lV = new Array[Int](2)
    val stride = w
    val cStride = w / 2
    val plane = new Array[Int](stride * h)
    val uPlane = new Array[Int](cStride * (h / 2))
    val vPlane = new Array[Int](cStride * (h / 2))
    val coeffs = new Array[Int](16)
    val mbLfInner = new Array[Boolean](mbCols * mbRows)
    val mbLfLevel = new Array[Int](mbCols * mbRows)
    val mbRefArr = new Array[Int](mbCols * mbRows)
    val mbModeArr = Array.fill(mbCols * mbRows)(-1)
    val mbMvArr = new Array[Int](mbCols * mbRows)
    val mbBlockMvs = new Array[Int](mbCols * mbRows * 16)
    val signBias = Array(0, 0, 0, 0)
    var my = 0
    while (my < mbRows) {
      java.util.Arrays.fill(lY, 0)
      java.util.Arrays.fill(lU, 0)
      java.util.Arrays.fill(lV, 0)
      var lY2 = 0
      var mx = 0
      while (mx < mbCols) {
        val spec = mbOf(mx, my)
        val seg = if (segOn) segOf(mx, my) else 0
        require(seg >= 0 && seg < 4, s"bad segment id $seg")
        val ydcQ = ydcQs(seg)
        val yacQ = yacQs(seg)
        val y2dcQ = y2dcQs(seg)
        val y2acQ = y2acQs(seg)
        val uvdcQ = uvdcQs(seg)
        val uvacQ = uvacQs(seg)
        val isIntra = spec.intraYMode >= 0
        val isB = isIntra && spec.intraYMode == ModeB
        if (isIntra)
          require(spec.intraYMode <= ModeB && spec.intraUvMode >= ModeDc &&
            spec.intraUvMode <= ModeTm,
            "bad intra-in-inter fixture mode")
        else {
          require(spec.mode >= MvZero && spec.mode <= MvSplit,
            s"inter fixture mode ${spec.mode} not in subset")
          require(spec.mode != MvSplit ||
            (spec.splitStyle >= 0 && spec.splitStyle <= 3), "bad split style")
          require(spec.refIdx >= 1 && spec.refIdx <= 3, "bad refIdx")
        }
        val isSplit = !isIntra && spec.mode == MvSplit
        val noY2 = isB || isSplit
        val y2Scan = if (noY2) new Array[Int](16) else y2Of(mx, my).clone()
        require(y2Scan.length == 16)
        val yScans = Array.tabulate(16) { b =>
          val a = yOf(mx, my, b).clone()
          require(a.length == 16)
          if (!noY2) a(0) = 0 // owned by Y2 (except B_PRED/SPLIT: no Y2)
          a
        }
        val uvScans = Array.tabulate(2, 4) { (pl, cb) =>
          val a = uvOf(mx, my, pl, cb).clone()
          require(a.length == 16)
          a
        }
        val skip = y2Scan.forall(_ == 0) && yScans.forall(_.forall(_ == 0)) &&
          uvScans.forall(_.forall(_.forall(_ == 0)))
        mbLfInner(my * mbCols + mx) = isB || isSplit || !skip
        mbLfLevel(my * mbCols + mx) =
          if (segOn) segLfL(seg) else filterLevel
        // segment id FIRST in the MB header (§10)
        if (segOn) {
          be1.bool(128, if (seg >= 2) 1 else 0)
          be1.bool(128, seg & 1)
        }
        be1.bool(skipProb, if (skip) 1 else 0)
        be1.bool(probIntra, if (isIntra) 0 else 1)
        var mvRow = 0
        var mvCol = 0
        var splitMvs: Array[Int] = null
        val subModes = new Array[Int](16)
        if (isIntra) {
          // §11.2 non-key intra coding: ymode + uvmode on the inter
          // trees with the default (un-updated) probabilities; B_PRED
          // sub-modes are context-free on non-key frames
          writeTree(be1, YModeTree, DefaultYModeProb, 0, spec.intraYMode)
          if (isB) {
            var b = 0
            while (b < 16) {
              val sm = bModeOf(mx, my, b)
              require(sm >= BModeDc && sm <= BModeHu, s"bad 4x4 sub-mode $sm")
              require(!(bModeUsesAr(sm) && b % 4 == 3 && my > 0 &&
                mx == mbCols - 1),
                "above-right sub-mode in the rightmost macroblock column " +
                  "below the top row: off-frame convention not in subset")
              subModes(b) = sm
              writeTree(be1, BModeTree, InterBModeProbs, 0, sm)
              b += 1
            }
          }
          writeTree(be1, UvModeTree, DefaultUvModeProb, 0, spec.intraUvMode)
          // survey arrays keep their intra defaults (ref 0, mv 0)
        } else {
          if (spec.refIdx == 1) be1.bool(probLast, 0)
          else {
            be1.bool(probLast, 1)
            be1.bool(probGf, if (spec.refIdx == 2) 0 else 1)
          }
          val (nearest, nearby, best, cnt) = findNearMvs(mx, my, mbCols,
            mbRows, spec.refIdx, mbRefArr, mbModeArr, mbMvArr, signBias)
          val mp = new Array[Int](4)
          var j = 0
          while (j < 4) { mp(j) = ModeContexts(math.min(cnt(j), 5))(j); j += 1 }
          writeTree(be1, MvRefTree, mp, 0, spec.mode)
          spec.mode match {
            case MvZero =>
            case MvNearest => mvRow = nearest >> 16; mvCol = nearest << 16 >> 16
            case MvNear => mvRow = nearby >> 16; mvCol = nearby << 16 >> 16
            case MvNew =>
              mvRow = spec.mvRow
              mvCol = spec.mvCol
              val bR = best >> 16
              val bC = best << 16 >> 16
              require((mvRow - bR) % 2 == 0 && (mvCol - bC) % 2 == 0,
                "NEW MV delta must be even (whole-MB ×2 coding)")
              require(mvCol >= ((-(mx * 16)) << 3) - 128 &&
                mvCol <= (((mbCols - 1 - mx) * 16) << 3) + 128 &&
                mvRow >= ((-(my * 16)) << 3) - 128 &&
                mvRow <= (((mbRows - 1 - my) * 16) << 3) + 128,
                "NEW MV outside the clamp window is out of subset")
              writeMvComponent(be1, mvp(0), (mvRow - bR) / 2)
              writeMvComponent(be1, mvp(1), (mvCol - bC) / 2)
            case _ => // SPLITMV: style + per-partition sub-MVs, picking
              // the cheapest legal sub-mode (LEFT/ABOVE/ZERO over NEW)
              // exactly as the decoder resolves them
              writeTree(be1, MbSplitTree, MbSplitProbs, 0, spec.splitStyle)
              val fill = MbSplits(spec.splitStyle)
              val smvs = new Array[Int](16)
              splitMvs = smvs
              def blockMvAt(c: Int, r: Int, b: Int): Int =
                if (c < 0 || r < 0) 0
                else if (c == mx && r == my) smvs(b)
                else {
                  val mi = r * mbCols + c
                  if (mbModeArr(mi) != MvSplit) mbMvArr(mi)
                  else mbBlockMvs(mi * 16 + b)
                }
              def leftOf(k: Int): Int =
                if ((k & 3) != 0) blockMvAt(mx, my, k - 1)
                else blockMvAt(mx - 1, my, k + 3)
              def aboveOf(k: Int): Int =
                if (k >= 4) blockMvAt(mx, my, k - 4)
                else blockMvAt(mx, my - 1, k + 12)
              val bR = best >> 16
              val bC = best << 16 >> 16
              var j = 0
              while (j < MbSplitCount(spec.splitStyle)) {
                var k = 0
                while (fill(k) != j) k += 1
                val l = leftOf(k)
                val a = aboveOf(k)
                val p = SubMvRefProbs(subMvContext(l, a))
                val (tR, tC) = splitMvOf(mx, my, j)
                val target = packMv(tR, tC)
                val sm =
                  if (target == l) SubMvLeft
                  else if (target == a) SubMvAbove
                  else if (target == 0) SubMvZero
                  else SubMvNew
                require(tC >= ((-(mx * 16)) << 3) - 128 &&
                  tC <= (((mbCols - 1 - mx) * 16) << 3) + 128 &&
                  tR >= ((-(my * 16)) << 3) - 128 &&
                  tR <= (((mbRows - 1 - my) * 16) << 3) + 128,
                  "sub-MV outside the clamp window is out of subset")
                writeTree(be1, SubMvRefTree, p, 0, sm)
                if (sm == SubMvNew) {
                  require((tR - bR) % 2 == 0 && (tC - bC) % 2 == 0,
                    "sub-MV delta must be even")
                  writeMvComponent(be1, mvp(0), (tR - bR) / 2)
                  writeMvComponent(be1, mvp(1), (tC - bC) / 2)
                }
                var kk = 0
                while (kk < 16) { if (fill(kk) == j) smvs(kk) = target; kk += 1 }
                j += 1
              }
              mvRow = smvs(15) >> 16
              mvCol = smvs(15) << 16 >> 16
          }
          mbRefArr(my * mbCols + mx) = spec.refIdx
          mbModeArr(my * mbCols + mx) = spec.mode
          mbMvArr(my * mbCols + mx) = packMv(mvRow, mvCol)
          if (isSplit)
            System.arraycopy(splitMvs, 0, mbBlockMvs,
              (my * mbCols + mx) * 16, 16)
        }
        // prediction: MC from the selected reference, or 16×16 intra
        // from the frame's own reconstruction
        val px = mx * 16
        val py = my * 16
        val (refY, refU, refV) = refs(if (isIntra) 1 else spec.refIdx)
        require(refY.length == w * h, "reference plane geometry mismatch")
        if (isB) {
          // B_PRED: no Y2, type-3 tokens interleaved with 4×4 intra
          // prediction — the shared encoder/recon helper
          encodeRecoBPred(be2, skip, plane, stride, mbCols, mx, my,
            subModes, yScans, aY, lY, ydcQ, yacQ)
        } else if (isSplit) {
          // SPLITMV: per-4×4-block MC + type-3 tokens (decoder's twin)
          val p4 = new Array[Int](16)
          var b = 0
          while (b < 16) {
            val br = b / 4
            val bc = b % 4
            val bx = px + bc * 4
            val by = py + br * 4
            val bmv = splitMvs(b)
            mcPredict(refY, stride, h, bx, by, bmv >> 16, bmv << 16 >> 16,
              4, 4, p4, 4, 0)
            var r4: Array[Int] = null
            if (!skip) {
              val ctx = aY(mx * 4 + bc) + lY(br)
              val nz = encodeBlockTokens(be2, probs(3), 0, ctx, yScans(b))
              aY(mx * 4 + bc) = if (nz) 1 else 0
              lY(br) = aY(mx * 4 + bc)
              java.util.Arrays.fill(coeffs, 0)
              var k = 0
              while (k < 16) {
                coeffs(Zigzag(k)) = yScans(b)(k) * (if (k == 0) ydcQ else yacQ)
                k += 1
              }
              r4 = inverseDct(coeffs)
            }
            var rr = 0
            while (rr < 4) {
              var cc = 0
              while (cc < 4) {
                plane((by + rr) * stride + bx + cc) = clamp255(
                  p4(rr * 4 + cc) + (if (r4 == null) 0 else r4(rr * 4 + cc)))
                cc += 1
              }
              rr += 1
            }
            b += 1
          }
          if (skip) {
            var k = 0
            while (k < 4) { aY(mx * 4 + k) = 0; lY(k) = 0; k += 1 }
          }
        } else {
        val pred =
          if (isIntra) predict16(plane, stride, mx, my, spec.intraYMode)
          else {
            val out = new Array[Int](256)
            mcPredict(refY, stride, h, px, py, mvRow, mvCol, 16, 16, out, 16, 0)
            out
          }
        val resid = new Array[Int](256)
        if (!skip) {
          val ctxY2 = aY2(mx) + lY2
          val nzY2 = encodeBlockTokens(be2, probs(1), 0, ctxY2, y2Scan)
          aY2(mx) = if (nzY2) 1 else 0
          lY2 = aY2(mx)
          var k = 0
          while (k < 16) {
            coeffs(Zigzag(k)) = y2Scan(k) * (if (k == 0) y2dcQ else y2acQ)
            k += 1
          }
          val dcs = inverseWht(coeffs)
          var b = 0
          while (b < 16) {
            val br = b / 4
            val bc = b % 4
            val ctx = aY(mx * 4 + bc) + lY(br)
            val nz = encodeBlockTokens(be2, probs(0), 1, ctx, yScans(b))
            aY(mx * 4 + bc) = if (nz) 1 else 0
            lY(br) = aY(mx * 4 + bc)
            java.util.Arrays.fill(coeffs, 0)
            var k2 = 1
            while (k2 < 16) { coeffs(Zigzag(k2)) = yScans(b)(k2) * yacQ; k2 += 1 }
            coeffs(0) = dcs(b)
            val r4 = inverseDct(coeffs)
            var rr = 0
            while (rr < 4) {
              var cc = 0
              while (cc < 4) {
                resid((br * 4 + rr) * 16 + bc * 4 + cc) = r4(rr * 4 + cc)
                cc += 1
              }
              rr += 1
            }
            b += 1
          }
        } else {
          var k = 0
          while (k < 4) { aY(mx * 4 + k) = 0; lY(k) = 0; k += 1 }
          aY2(mx) = 0
          lY2 = 0
        }
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 16) {
            plane((py + r) * stride + px + c) =
              clamp255(pred(r * 16 + c) + resid(r * 16 + c))
            c += 1
          }
          r += 1
        }
        } // end non-B luma path
        // chroma: MC pred (inter) or 8×8 intra (intra-in-inter), with
        // planted residuals
        val cmvRow = (mvRow + (1 | (mvRow >> 31))) / 2
        val cmvCol = (mvCol + (1 | (mvCol >> 31))) / 2
        val predU = new Array[Int](64)
        val predV = new Array[Int](64)
        if (isSplit) {
          // split chroma: round-away average of the four luma block MVs
          var ci = 0
          while (ci < 2) {
            var cj = 0
            while (cj < 2) {
              val b0 = 2 * ci * 4 + 2 * cj
              def cavg(sel: Int => Int): Int = {
                var t = sel(b0) + sel(b0 + 1) + sel(b0 + 4) + sel(b0 + 5)
                if (t < 0) t -= 4 else t += 4
                t / 8
              }
              val cr2 = cavg(b => splitMvs(b) >> 16)
              val cc2 = cavg(b => splitMvs(b) << 16 >> 16)
              val off = ci * 4 * 8 + cj * 4
              mcPredict(refU, cStride, h / 2, mx * 8 + cj * 4,
                my * 8 + ci * 4, cr2, cc2, 4, 4, predU, 8, off)
              mcPredict(refV, cStride, h / 2, mx * 8 + cj * 4,
                my * 8 + ci * 4, cr2, cc2, 4, 4, predV, 8, off)
              cj += 1
            }
            ci += 1
          }
        } else if (!isIntra) {
          mcPredict(refU, cStride, h / 2, mx * 8, my * 8, cmvRow, cmvCol,
            8, 8, predU, 8, 0)
          mcPredict(refV, cStride, h / 2, mx * 8, my * 8, cmvRow, cmvCol,
            8, 8, predV, 8, 0)
        }
        val residU = new Array[Int](64)
        val residV = new Array[Int](64)
        if (!skip) {
          var pl = 0
          while (pl < 2) {
            val aC = if (pl == 0) aU else aV
            val lC = if (pl == 0) lU else lV
            val residC = if (pl == 0) residU else residV
            var cb = 0
            while (cb < 4) {
              val br = cb / 2
              val bc = cb % 2
              val nz = encodeBlockTokens(be2, probs(2), 0,
                aC(mx * 2 + bc) + lC(br), uvScans(pl)(cb))
              aC(mx * 2 + bc) = if (nz) 1 else 0
              lC(br) = aC(mx * 2 + bc)
              java.util.Arrays.fill(coeffs, 0)
              var k = 0
              while (k < 16) {
                coeffs(Zigzag(k)) =
                  uvScans(pl)(cb)(k) * (if (k == 0) uvdcQ else uvacQ)
                k += 1
              }
              val r4 = inverseDct(coeffs)
              var rr = 0
              while (rr < 4) {
                var cc = 0
                while (cc < 4) {
                  residC((br * 4 + rr) * 8 + bc * 4 + cc) = r4(rr * 4 + cc)
                  cc += 1
                }
                rr += 1
              }
              cb += 1
            }
            pl += 1
          }
        } else {
          var k = 0
          while (k < 2) {
            aU(mx * 2 + k) = 0; lU(k) = 0
            aV(mx * 2 + k) = 0; lV(k) = 0
            k += 1
          }
        }
        if (isIntra) {
          predictReconChroma(uPlane, cStride, mx, my, spec.intraUvMode, residU)
          predictReconChroma(vPlane, cStride, mx, my, spec.intraUvMode, residV)
        } else {
          addResidChroma(uPlane, cStride, mx, my, predU, residU)
          addResidChroma(vPlane, cStride, mx, my, predV, residV)
        }
        mx += 1
      }
      my += 1
    }
    if (filterLevel > 0) {
      // inter frame ⇒ the §15.2 non-key hev-threshold table
      loopFilterPlane(plane, stride, mbCols, mbRows, 16, filterType,
        sharpness, mbLfLevel, mbLfInner, keyFrame = false)
      if (filterType == 0) {
        loopFilterPlane(uPlane, cStride, mbCols, mbRows, 8, 0,
          sharpness, mbLfLevel, mbLfInner, keyFrame = false)
        loopFilterPlane(vPlane, cStride, mbCols, mbRows, 8, 0,
          sharpness, mbLfLevel, mbLfInner, keyFrame = false)
      }
    }
    val p1 = be1.flush()
    val p2 = be2.flush()
    require(p1.length < (1 << 19), "first partition overflows the tag")
    val payload = new Array[Byte](3 + p1.length + p2.length)
    val tag = (p1.length << 5) | (1 << 4) | 1 // inter, version 0, shown
    payload(0) = (tag & 0xff).toByte
    payload(1) = ((tag >> 8) & 0xff).toByte
    payload(2) = ((tag >> 16) & 0xff).toByte
    System.arraycopy(p1, 0, payload, 3, p1.length)
    System.arraycopy(p2, 0, payload, 3 + p1.length, p2.length)
    (payload, plane, uPlane, vPlane)
  }

  /** B_PRED per-subblock tokens + predict + reconstruct for the
    * ENCODER simulations (key and inter frames share it; the decoder's
    * twin lives inline in decodeFramePayload): type-3 tokens from
    * coefficient 0, interleaved with prediction in the decoder's exact
    * order (later subblocks predict from earlier ones). Skipped MBs
    * reset the Y contexts and leave Y2 untouched (no Y2 on B_PRED). */
  private def encodeRecoBPred(be2: BoolEncoder, skip: Boolean,
      plane: Array[Int], stride: Int, mbCols: Int, mx: Int, my: Int,
      subModes: Array[Int], yScans: Array[Array[Int]],
      aY: Array[Int], lY: Array[Int], ydcQ: Int, yacQ: Int): Unit = {
    val px = mx * 16
    val py = my * 16
    val coeffs = new Array[Int](16)
    var b = 0
    while (b < 16) {
      val br = b / 4
      val bc = b % 4
      val bx = px + bc * 4
      val by = py + br * 4
      var r4: Array[Int] = null
      if (!skip) {
        val ctx = aY(mx * 4 + bc) + lY(br)
        val nz = encodeBlockTokens(be2, DefaultCoeffProbs(3), 0, ctx, yScans(b))
        aY(mx * 4 + bc) = if (nz) 1 else 0
        lY(br) = aY(mx * 4 + bc)
        java.util.Arrays.fill(coeffs, 0)
        var k = 0
        while (k < 16) {
          coeffs(Zigzag(k)) = yScans(b)(k) * (if (k == 0) ydcQ else yacQ)
          k += 1
        }
        r4 = inverseDct(coeffs)
      }
      val ar =
        if (bModeUsesAr(subModes(b)))
          bPredAboveRight(plane, stride, mbCols, mx, my, bc, bx, by)
        else DummyAr
      val p4 = predict4(plane, stride, bx, by, subModes(b), ar)
      var rr = 0
      while (rr < 4) {
        var cc = 0
        while (cc < 4) {
          plane((by + rr) * stride + bx + cc) = clamp255(
            p4(rr * 4 + cc) + (if (r4 == null) 0 else r4(rr * 4 + cc)))
          cc += 1
        }
        rr += 1
      }
      b += 1
    }
    if (skip) {
      var k = 0
      while (k < 4) { aY(mx * 4 + k) = 0; lY(k) = 0; k += 1 }
    }
  }

  /** Wrap VP8 frame payloads in an IVF container (DKIF/VP80). */
  private[graft] def makeIvf(w: Int, h: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 32 + frames.map(12 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("DKIF".getBytes(StandardCharsets.US_ASCII))
    bb.putShort(0) // version
    bb.putShort(32) // header size
    bb.put("VP80".getBytes(StandardCharsets.US_ASCII))
    bb.putShort(w.toShort)
    bb.putShort(h.toShort)
    bb.putInt(30) // framerate numerator
    bb.putInt(1) // denominator
    bb.putInt(frames.length)
    bb.putInt(0) // unused
    var pts = 0L
    frames.foreach { f =>
      bb.putInt(f.length)
      bb.putLong(pts)
      bb.put(f)
      pts += 1
    }
    bb.array()
  }

  /** The VP8 payload of a lossy-WebP file (container bytes stripped) —
    * how the IVF fixtures source their key frame from the existing
    * key-frame encoder. */
  private[graft] def webpVp8Payload(webp: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOfRange(webp, 20, webp.length)

}
