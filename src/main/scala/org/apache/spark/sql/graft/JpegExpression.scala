package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Baseline-JPEG (8-bit grayscale) encode/decode kernels — the r17
  * verdict's #2 ask: PNG gave the multimodal family one real compressed
  * decoder, but "real crawled image corpora are overwhelmingly JPEG", and
  * header parsing (`mm_decode_jpeg`) without entropy decode cannot
  * fingerprint actual JPEG pixels. Scope is deliberately bounded and
  * fully implemented, the [[PngKernel]] precedent applied to a LOSSY
  * entropy-coded format: baseline sequential DCT (SOF0), 8-bit, ONE
  * component (grayscale), no restart intervals — marker walk, DQT/DHT
  * table management (any table the stream defines, not just Annex K),
  * canonical Huffman decode, byte-unstuffing, DC prediction, AC
  * run-length, dequantization, dezigzag, separable IDCT, level shift,
  * edge-block clipping. Everything else — progressive (SOF2), chroma,
  * 12-bit, arithmetic coding, DRI/RSTn — and every malformed byte decodes
  * to NULL, never a misread pixel.
  *
  * Lossiness and the oracle: JPEG quantizes DCT coefficients, so decode ∘
  * encode is NOT the identity on arbitrary pixels — but it IS exactly the
  * identity on images whose 8×8 blocks are each CONSTANT (a constant
  * block's FDCT is a single integer DC coefficient, 8·(v−128), with every
  * AC exactly 0; quantization at step 1 rounds nothing away and the IDCT
  * of a lone DC is exact). The perceptual fixture exploits this: each
  * logical ground-truth pixel becomes one constant 8×8 block of a 64×64
  * image, so decode → per-block mean (the aHash downsample step real
  * pipelines run on large images) reproduces the ground-truth 8×8 grid
  * bit-exactly and the near-dup pairs must equal the BMP/PNG families'.
  * General (non-constant) blocks exercise the full AC path in the specs
  * with a bounded-error roundtrip and an independent direct-IDCT check.
  *
  * Public references: ITU-T T.81 (the JPEG spec): marker syntax (B.2),
  * Huffman canonical code construction and DECODE (C.2, F.2.2), EXTEND
  * (F.2.2.1), zigzag (A.3.6), typical Huffman tables (Annex K.3 — used by
  * the FIXTURE encoder; the decoder builds whatever DHT carries). */
object JpegKernel {

  /** Same decoder memory bound as [[PngKernel.MaxDim]]: a hostile SOF0
    * must never size an allocation. */
  private val MaxDim = 1024

  // zigzag position -> raster index (T.81 A.3.6)
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3.1/K.3.2 typical luminance tables (fixture ENCODER side)
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // cos((2x+1)·u·π/16) — shared by FDCT and IDCT
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16)
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ---------------------------------------------------------------- encode

  /** Canonical Huffman codes from (BITS, HUFFVAL) for the ENCODER:
    * returns (codeBySymbol, sizeBySymbol), 256-wide, size 0 = absent. */
  private def buildEncTable(bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        codes(vals(k)) = code; sizes(vals(k)) = l
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    (codes, sizes)
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, size: Int): Unit = {
      var i = size - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing (B.1.1.5)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (F.1.2.3). */
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** Magnitude category of a coefficient/difference (F.1.2.1.1). */
  private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** FDCT of one level-shifted block (raster order), separable. */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: g(u, y)
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * Cos(x)(u); x += 1 }
        tmp(y * 8 + u) = s * 0.5 * (if (u == 0) InvSqrt2 else 1.0)
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) { // columns
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(yy)(v); yy += 1 }
        out(v * 8 + u) = s * 0.5 * (if (v == 0) InvSqrt2 else 1.0)
        u += 1
      }
      v += 1
    }
  }

  /** IDCT to raster pixels (still level-shifted), separable. */
  private def idct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows of the coefficient block: g(x, v)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += (if (u == 0) InvSqrt2 else 1.0) * in(v * 8 + u) * Cos(x)(u)
          u += 1
        }
        tmp(v * 8 + x) = 0.5 * s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          s += (if (vv == 0) InvSqrt2 else 1.0) * tmp(vv * 8 + x) * Cos(y)(vv)
          vv += 1
        }
        out(y * 8 + x) = 0.5 * s
        x += 1
      }
      y += 1
    }
  }

  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  /** FIXTURE encoder: a real, spec-conformant baseline grayscale JPEG —
    * SOI, COM (the per-doc varying metadata the decode family's fixtures
    * pin, so constant-offset cheating fails), DQT (all-ones table: the
    * "quality 100" that makes constant blocks roundtrip EXACTLY), SOF0,
    * DHT (the Annex K typical luminance pair), SOS, entropy-coded data
    * with byte stuffing, EOI. Edge blocks replicate edge pixels (the
    * standard pad choice; the decoder clips them back). Deterministic:
    * pure function of its arguments. */
  def encodeGray8(w: Int, h: Int, pixels: Array[Byte],
                  comment: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim, s"bad dims ${w}x$h")
    require(pixels.length == w * h, s"expected ${w * h} pixels, got ${pixels.length}")
    require(comment.length <= 512, "fixture comment too long")
    val out = new java.io.ByteArrayOutputStream(pixels.length / 2 + 256)
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); out.write(be16(body.length + 2)); out.write(body)
    }
    marker(0xD8) // SOI
    seg(0xFE, comment) // COM
    seg(0xDB, Array.fill[Byte](65)(1).patch(0, Array(0x00.toByte), 1)) // DQT: Pq/Tq=0, 64×1
    seg(0xC0, Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](1, 1, 0x11, 0)) // SOF0: 1 component, H/V=1/1, Tq=0
    seg(0xC4, // DHT: DC class-0 id-0 + AC class-1 id-0 in one segment
      (Array[Byte](0x00) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte)) ++
        (Array[Byte](0x10) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte)))
    seg(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS: Ss=0 Se=63 Ah/Al=0
    val (dcCodes, dcSizes) = buildEncTable(DcBits, DcVals)
    val (acCodes, acSizes) = buildEncTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val freq = new Array[Double](64)
    val zz = new Array[Int](64)
    var pred = 0
    val bYs = (h + 7) / 8
    val bXs = (w + 7) / 8
    var by = 0
    while (by < bYs) {
      var bx = 0
      while (bx < bXs) {
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, h - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, w - 1)
            block(y * 8 + x) = (pixels(sy * w + sx) & 0xFF) - 128.0
            x += 1
          }
          y += 1
        }
        fdct(block, freq)
        var i = 0
        while (i < 64) {
          // T.81 F.1.1.4: 8-bit-precision DCT coefficients lie in
          // [-1023, 1023] (the Annex K AC table has no size-11 symbols);
          // the mathematical FDCT max is ±1024 on adversarial blocks, so
          // clamp — at most ±1 of coefficient error on a pattern no
          // natural image produces, and the stream stays well-formed.
          val q = math.round(freq(Zigzag(i))).toInt
          zz(i) = if (i == 0) q else math.max(-1023, math.min(1023, q))
          i += 1
        }
        // DC difference
        val diff = zz(0) - pred
        pred = zz(0)
        val t = category(diff)
        bw.put(dcCodes(t), dcSizes(t))
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC run-length
        var k = 1
        var run = 0
        while (k < 64) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) { bw.put(acCodes(0xF0), acSizes(0xF0)); run -= 16 }
            val s = category(zz(k))
            val rs = (run << 4) | s
            bw.put(acCodes(rs), acSizes(rs))
            bw.put(if (zz(k) < 0) zz(k) + (1 << s) - 1 else zz(k), s)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(acCodes(0x00), acSizes(0x00)) // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Block-constant fixture form: an (8·wB)×(8·hB) image whose block
    * (r, c) is the constant `blockVals(r*wB + c)` — the shape whose JPEG
    * roundtrip is exactly lossless (see the object scaladoc), expanded
    * HERE so the query ships 64 ints per doc, not 4096. The encoder
    * underneath is the fully general one. */
  def encodeGray8Blocks(wB: Int, hB: Int, blockVals: Array[Int],
                        comment: Array[Byte]): Array[Byte] = {
    require(wB > 0 && hB > 0 && wB * 8 <= MaxDim && hB * 8 <= MaxDim,
      s"bad block dims ${wB}x$hB")
    require(blockVals.length == wB * hB,
      s"expected ${wB * hB} block values, got ${blockVals.length}")
    val w = wB * 8
    val px = new Array[Byte](w * hB * 8)
    var r = 0
    while (r < hB * 8) {
      var c = 0
      while (c < w) {
        px(r * w + c) = (blockVals((r / 8) * wB + (c / 8)) & 0xFF).toByte
        c += 1
      }
      r += 1
    }
    encodeGray8(w, hB * 8, px, comment)
  }

  // ---------------------------------------------------------------- decode

  /** Canonical Huffman DECODER tables (T.81 F.2.2.3): per code length,
    * mincode/maxcode (−1 = no codes) and the value pointer. */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.nextBit()
      var l = 1
      while (maxcode(l) < 0 || code > maxcode(l)) {
        if (l == 16) fail()
        code = (code << 1) | br.nextBit()
        l += 1
      }
      vals(valptr(l) + code - mincode(l))
    }
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing; ANY real marker
    * inside the scan (this decoder supports no restart intervals) is
    * malformed. `pos` after the last consumed byte is where the trailer
    * check resumes. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def nextBit(): Int = {
      if (n == 0) {
        if (pos >= b.length) fail()
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length || (b(pos) & 0xFF) != 0x00) fail()
          pos += 1 // stuffed zero
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(t: Int): Int = {
      var v = 0
      var i = 0
      while (i < t) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
  }

  /** EXTEND (F.2.2.1): map a t-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode a baseline grayscale JPEG to raw row-major top-down pixels,
    * or NULL for anything outside the supported envelope or malformed in
    * any byte: bad SOI/marker framing, segment overruns, non-baseline
    * SOF, multi-component images, 16-bit quant tables, undefined
    * Huffman/quant table references, restart intervals, invalid Huffman
    * codes, coefficient index overruns, a truncated entropy stream, a
    * missing EOI, or trailing bytes after it. A false NULL costs one
    * skipped record; a misread would poison a fingerprint index. */
  def decodeGray8(jpeg: Array[Byte]): Array[Byte] = {
    if (jpeg == null || jpeg.length < 4) return null
    try {
      if ((jpeg(0) & 0xFF) != 0xFF || (jpeg(1) & 0xFF) != 0xD8) return null
      var pos = 2
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffDec](4)
      val acTabs = new Array[HuffDec](4)
      var w = -1
      var h = -1
      var compQ = -1
      def need(n: Int): Unit = if (pos + n > jpeg.length) fail()
      def u8(i: Int): Int = jpeg(i) & 0xFF
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      while (true) {
        need(2)
        if (u8(pos) != 0xFF) fail()
        val m = u8(pos + 1)
        pos += 2
        if (m == 0xD9) fail() // EOI before any scan: no image
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) fail() // stray TEM/RSTn
        need(2)
        val len = u16(pos)
        if (len < 2) fail()
        need(len)
        val end = pos + len
        m match {
          case 0xDB => // DQT: one or more tables
            var p = pos + 2
            while (p < end) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 15
              if (pq != 0 || tq > 3 || p + 65 > end) fail() // 8-bit only
              val q = new Array[Int](64)
              var i = 0
              while (i < 64) { q(i) = u8(p + 1 + i); if (q(i) == 0) fail(); i += 1 }
              quant(tq) = q
              p += 65
            }
            if (p != end) fail()
          case 0xC4 => // DHT: one or more tables
            var p = pos + 2
            while (p < end) {
              if (p + 17 > end) fail()
              val tc = u8(p) >> 4
              val th = u8(p) & 15
              if (tc > 1 || th > 3) fail()
              val bits = Array.tabulate(16)(i => u8(p + 1 + i))
              val nv = bits.sum
              if (nv == 0 || nv > 256 || p + 17 + nv > end) fail()
              val vals = Array.tabulate(nv)(i => u8(p + 17 + i))
              val t = new HuffDec(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + nv
            }
            if (p != end) fail()
          case 0xC0 => // SOF0 — baseline sequential
            if (w >= 0) fail() // two frames
            if (len != 11) fail() // 1 component exactly
            if (u8(pos + 2) != 8) fail() // precision
            h = u16(pos + 3); w = u16(pos + 5)
            if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) fail()
            if (u8(pos + 7) != 1) fail() // Nf
            if (u8(pos + 9) != 0x11) fail() // H/V sampling 1x1
            compQ = u8(pos + 10)
            if (compQ > 3) fail()
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            fail() // every non-baseline frame type: out of scope, never misread
          case 0xDD => fail() // DRI: restart intervals unsupported
          case 0xDA => // SOS — decode the single scan and finish
            if (w < 0) fail()
            if (len != 8 || u8(pos + 2) != 1) fail()
            val td = u8(pos + 4) >> 4
            val ta = u8(pos + 4) & 15
            if (u8(pos + 5) != 0 || u8(pos + 6) != 63 || u8(pos + 7) != 0) fail()
            if (td > 3 || ta > 3) fail()
            val dc = dcTabs(td)
            val ac = acTabs(ta)
            val q = quant(compQ)
            if (dc == null || ac == null || q == null) fail()
            val br = new BitReader(jpeg, end)
            val out = new Array[Byte](w * h)
            val coefZ = new Array[Int](64)
            val freq = new Array[Double](64)
            val pix = new Array[Double](64)
            var pred = 0
            val bYs = (h + 7) / 8
            val bXs = (w + 7) / 8
            var by = 0
            while (by < bYs) {
              var bx = 0
              while (bx < bXs) {
                java.util.Arrays.fill(coefZ, 0)
                val t = dc.decode(br)
                if (t > 11) fail()
                pred += extend(br.receive(t), t)
                coefZ(0) = pred
                var k = 1
                while (k < 64) {
                  val rs = ac.decode(br)
                  val r = rs >> 4
                  val s = rs & 15
                  if (s == 0) {
                    if (rs == 0xF0) { k += 16 }
                    else if (rs == 0x00) { k = 64 }
                    else fail()
                  } else {
                    k += r
                    if (k > 63) fail()
                    coefZ(k) = extend(br.receive(s), s)
                    k += 1
                  }
                }
                var i = 0
                while (i < 64) { freq(Zigzag(i)) = (coefZ(i) * q(i)).toDouble; i += 1 }
                idct(freq, pix)
                var y = 0
                while (y < 8) {
                  val py = by * 8 + y
                  if (py < h) {
                    var x = 0
                    while (x < 8) {
                      val px = bx * 8 + x
                      if (px < w) {
                        val v = math.round(pix(y * 8 + x)).toInt + 128
                        out(py * w + px) =
                          (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                      }
                      x += 1
                    }
                  }
                  y += 1
                }
                bx += 1
              }
              by += 1
            }
            // strict trailer: EOI immediately after the (byte-aligned)
            // entropy data, and NOTHING after it (the PNG tail rule)
            if (br.pos + 2 != jpeg.length) fail()
            if (u8(br.pos) != 0xFF || u8(br.pos + 1) != 0xD9) fail()
            return out
          case x if x == 0xFE || (x >= 0xE0 && x <= 0xEF) =>
            () // COM / APPn: skipped (length-checked above)
          case _ => fail() // anything else in the table stream
        }
        pos = end
      }
      null // unreachable
    } catch {
      case _: Malformed => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** Floor-mean of each full 8×8 block of a gray image, row-major block
    * order — the downsample step of a perceptual hash over real-size
    * images (aHash resizes to 8×8 before thresholding). NULL unless the
    * buffer matches w×h exactly and both dims are multiples of 8 — a
    * defensive contract, since the input is decoder output. */
  def blockMeans(pix: Array[Byte], w: Int, h: Int): Array[Int] = {
    if (pix == null || w <= 0 || h <= 0 || w % 8 != 0 || h % 8 != 0 ||
        pix.length != w * h) return null
    val wB = w / 8
    val hB = h / 8
    val out = new Array[Int](wB * hB)
    var bY = 0
    while (bY < hB) {
      var bX = 0
      while (bX < wB) {
        var s = 0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { s += pix((bY * 8 + y) * w + bX * 8 + x) & 0xFF; x += 1 }
          y += 1
        }
        out(bY * wB + bX) = s / 64
        bX += 1
      }
      bY += 1
    }
    out
  }
}

/** `jpeg_decode_gray8(payload)` → raw gray pixels (binary, row-major
  * top-down), or NULL for any malformed/unsupported input — the codegen'd
  * product expression (the [[PngDecodeGray8]] pattern for the lossy
  * entropy-coded format). */
case class JpegDecodeGray8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_decode_gray8"

  override def nullSafeEval(b: Any): Any =
    JpegKernel.decodeGray8(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      byte[] ${ev.value}_r = org.apache.spark.sql.graft.JpegKernel.decodeGray8($b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `jpeg_encode_gray8_blocks(wB, hB, blockVals array<int>, comment)` →
  * baseline-JPEG bytes of the (8·wB)×(8·hB) block-constant image — the
  * FIXTURE encoder as an expression ([[PngEncodeGray8]] discipline:
  * payload synthesis stays distributed and codegen'd; construction bugs
  * error loudly, never decode to NULL). The comment string is the
  * per-doc-varying metadata segment. */
case class JpegEncodeGray8Blocks(first: Expression, second: Expression,
                                 third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, IntegerType, ArrayType(IntegerType), StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_encode_gray8_blocks"

  private def encode(wB: Int, hB: Int, arr: ArrayData, com: UTF8String): Array[Byte] = {
    val n = arr.numElements()
    val vals = new Array[Int](n)
    var i = 0
    while (i < n) { vals(i) = arr.getInt(i); i += 1 }
    JpegKernel.encodeGray8Blocks(wB, hB, vals, com.getBytes)
  }

  override def nullSafeEval(w: Any, h: Any, a: Any, c: Any): Any =
    encode(w.asInstanceOf[Int], h.asInstanceOf[Int],
      a.asInstanceOf[ArrayData], c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jpegEnc", this, classOf[JpegEncodeGray8Blocks].getName)
    nullSafeCodeGen(ctx, ev, (w, h, a, c) =>
      s"${ev.value} = (byte[]) $self.kernelCall($w, $h, $a, $c);")
  }

  /** Codegen entry (the [[PngEncodeGray8.kernelCall]] bridge pattern). */
  def kernelCall(w: Int, h: Int, a: Any, c: Any): Array[Byte] =
    encode(w, h, a.asInstanceOf[ArrayData], c.asInstanceOf[UTF8String])

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** `gray_block_means(pixels, w, h)` → array<int> of per-8×8-block floor
  * means in row-major block order — the perceptual hash's downsample
  * step as a codegen'd expression (NULL on any shape mismatch, the
  * defensive side of consuming decoder output). */
case class GrayBlockMeans(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gray_block_means"

  private def means(p: Array[Byte], w: Int, h: Int): GenericArrayData = {
    val m = JpegKernel.blockMeans(p, w, h)
    if (m == null) null else new GenericArrayData(m)
  }

  override def nullSafeEval(p: Any, w: Any, h: Any): Any =
    means(p.asInstanceOf[Array[Byte]], w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("blockMeans", this, classOf[GrayBlockMeans].getName)
    nullSafeCodeGen(ctx, ev, (p, w, h) => s"""
      org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value}_r =
        (org.apache.spark.sql.catalyst.util.GenericArrayData) $self.kernelCall($p, $w, $h);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }

  def kernelCall(p: Any, w: Int, h: Int): Any =
    means(p.asInstanceOf[Array[Byte]], w, h)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object JpegFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.classic.ExpressionUtils

  def jpeg_decode_gray8(payload: Column): Column =
    ExpressionUtils.column(JpegDecodeGray8(ExpressionUtils.expression(payload)))

  def jpeg_encode_gray8_blocks(wB: Column, hB: Column, blockVals: Column,
                               comment: Column): Column =
    ExpressionUtils.column(JpegEncodeGray8Blocks(
      ExpressionUtils.expression(wB), ExpressionUtils.expression(hB),
      ExpressionUtils.expression(blockVals), ExpressionUtils.expression(comment)))

  def gray_block_means(pixels: Column, w: Column, h: Column): Column =
    ExpressionUtils.column(GrayBlockMeans(
      ExpressionUtils.expression(pixels), ExpressionUtils.expression(w),
      ExpressionUtils.expression(h)))

  /** SQL-text descriptors (the vec_dot discipline; see
    * [[PngFunctions.descriptions]]). */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    (new FunctionIdentifier("jpeg_decode_gray8"),
      new ExpressionInfo(classOf[JpegDecodeGray8].getName, "jpeg_decode_gray8"),
      cs => { require(cs.length == 1, s"jpeg_decode_gray8 expects 1 arg, got ${cs.length}")
        JpegDecodeGray8(cs.head) }),
    (new FunctionIdentifier("jpeg_encode_gray8_blocks"),
      new ExpressionInfo(classOf[JpegEncodeGray8Blocks].getName, "jpeg_encode_gray8_blocks"),
      cs => { require(cs.length == 4, s"jpeg_encode_gray8_blocks expects 4 args, got ${cs.length}")
        JpegEncodeGray8Blocks(cs(0), cs(1), cs(2), cs(3)) }),
    (new FunctionIdentifier("gray_block_means"),
      new ExpressionInfo(classOf[GrayBlockMeans].getName, "gray_block_means"),
      cs => { require(cs.length == 3, s"gray_block_means expects 3 args, got ${cs.length}")
        GrayBlockMeans(cs(0), cs(1), cs(2)) }))

  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (ident, info, builder) =>
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
