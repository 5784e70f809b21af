package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Baseline-JPEG (8-bit) encode/decode kernels — the r17 verdict's #2
  * ask (grayscale entropy decode), widened by the r18 verdict's #1 ask
  * (real crawled corpora are overwhelmingly 3-component YCbCr baseline):
  * the [[PngKernel]] precedent applied to a LOSSY entropy-coded format.
  * Fully implemented: baseline sequential DCT (SOF0), 8-bit, grayscale
  * OR 3-component YCbCr at 4:4:4/4:2:2/4:2:0 with DRI/RSTn restart
  * markers ([[JpegKernel.decodeLuma8]] — the Y plane only, which is all
  * a perceptual hash needs; [[JpegKernel.decodeGray8]] keeps the r18
  * strict single-component envelope) — marker walk, DQT/DHT table
  * management (any table the stream defines, not just Annex K),
  * canonical Huffman decode with code-space validation, byte-unstuffing,
  * interleaved-MCU walk, per-component DC prediction, AC run-length,
  * dequantization, dezigzag, separable IDCT, level shift, edge-block
  * clipping. Everything else — progressive (SOF2), 12-bit, arithmetic
  * coding, 4-component CMYK, non-{1x1,2x1,2x2} luma sampling — and every
  * malformed byte decodes to NULL, never a misread pixel.
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
  // Annex K.3.3.1/K.3.3.2 typical chrominance tables (color fixture
  // encoder side; the DECODER builds whatever the stream's DHT carries,
  // so encoder/decoder consistency is by construction, not by Annex K)
  private val DcBitsC = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcValsC = (0 to 11).toArray
  private val AcBitsC = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val AcValsC: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
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
                  comment: Array[Byte]): Array[Byte] =
    encodeGray8(w, h, pixels, comment, 0)

  /** One encoder Huffman table pair (codes + sizes, 256-wide). */
  private final class EncTables(dcBits: Array[Int], dcVals: Array[Int],
                                acBits: Array[Int], acVals: Array[Int]) {
    val (dcCodes, dcSizes) = buildEncTable(dcBits, dcVals)
    val (acCodes, acSizes) = buildEncTable(acBits, acVals)
  }

  /** FDCT + quantize(1) + DC-diff + AC run-length encode of ONE
    * level-shifted raster block; returns the new DC predictor. The
    * scratch arrays are caller-owned (one set per encode call). */
  private def encodeBlock(bw: BitWriter, block: Array[Double],
                          freq: Array[Double], zz: Array[Int],
                          pred: Int, t8: EncTables): Int = {
    fdct(block, freq)
    var i = 0
    while (i < 64) {
      // T.81 F.1.1.4: 8-bit-precision DCT coefficients lie in
      // [-1023, 1023] (the Annex K AC tables have no size-11 symbols);
      // the mathematical FDCT max is ±1024 on adversarial blocks, so
      // clamp — at most ±1 of coefficient error on a pattern no
      // natural image produces, and the stream stays well-formed.
      val q = math.round(freq(Zigzag(i))).toInt
      zz(i) = if (i == 0) q else math.max(-1023, math.min(1023, q))
      i += 1
    }
    // DC difference
    val diff = zz(0) - pred
    val t = category(diff)
    bw.put(t8.dcCodes(t), t8.dcSizes(t))
    if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    // AC run-length
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { bw.put(t8.acCodes(0xF0), t8.acSizes(0xF0)); run -= 16 }
        val s = category(zz(k))
        val rs = (run << 4) | s
        bw.put(t8.acCodes(rs), t8.acSizes(rs))
        bw.put(if (zz(k) < 0) zz(k) + (1 << s) - 1 else zz(k), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(t8.acCodes(0x00), t8.acSizes(0x00)) // EOB
    zz(0)
  }

  /** Grayscale fixture encoder, optionally with a DRI restart interval
    * (`ri` MCUs; 0 = none — the r18 stream, byte-identical). Restart
    * markers follow T.81 E.1.4: pad-to-byte, RST(m) with m cycling 0..7,
    * DC predictor reset; no marker after the final interval. */
  def encodeGray8(w: Int, h: Int, pixels: Array[Byte],
                  comment: Array[Byte], ri: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim, s"bad dims ${w}x$h")
    require(pixels.length == w * h, s"expected ${w * h} pixels, got ${pixels.length}")
    require(comment.length <= 512, "fixture comment too long")
    require(ri >= 0 && ri <= 0xFFFF, s"bad restart interval $ri")
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
    if (ri > 0) seg(0xDD, be16(ri)) // DRI
    seg(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS: Ss=0 Se=63 Ah/Al=0
    val tabs = new EncTables(DcBits, DcVals, AcBits, AcVals)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val freq = new Array[Double](64)
    val zz = new Array[Int](64)
    var pred = 0
    var rstM = 0
    var mcu = 0
    val bYs = (h + 7) / 8
    val bXs = (w + 7) / 8
    var by = 0
    while (by < bYs) {
      var bx = 0
      while (bx < bXs) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          bw.flush()
          marker(0xD0 + rstM)
          rstM = (rstM + 1) & 7
          pred = 0
        }
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
        pred = encodeBlock(bw, block, freq, zz, pred, tabs)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** COLOR fixture encoder (r18 verdict #1's fixture side): a real,
    * spec-conformant 3-component YCbCr baseline JPEG. The Y plane is the
    * caller's arbitrary w×h pixel plane (general AC path, edge-replicated
    * partial MCUs); the chroma planes are block-constant values DERIVED
    * from `chromaSeed` (per-doc varying, so a decoder that mis-walks the
    * interleaved MCU stream desyncs instead of accidentally agreeing).
    * `mode`: 0 = 4:4:4 (luma 1x1), 1 = 4:2:2 (2x1), 2 = 4:2:0 (2x2);
    * chroma is always 1x1 per MCU. `ri` > 0 writes a DRI segment and
    * RSTn markers every `ri` MCUs. Two quant tables (both all-ones —
    * lossless on constant blocks), the Annex K luminance AND chrominance
    * Huffman pairs, multi-segment DQT/DHT. */
  def encodeColor(w: Int, h: Int, yPixels: Array[Byte], mode: Int,
                  ri: Int, chromaSeed: Int,
                  comment: Array[Byte]): Array[Byte] = {
    require(mode >= 0 && mode <= 2, s"bad sampling mode $mode")
    val h1 = if (mode == 0) 1 else 2
    val v1 = if (mode == 2) 2 else 1
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim, s"bad dims ${w}x$h")
    require(yPixels.length == w * h, s"expected ${w * h} pixels, got ${yPixels.length}")
    require(comment.length <= 512, "fixture comment too long")
    require(ri >= 0 && ri <= 0xFFFF, s"bad restart interval $ri")
    val out = new java.io.ByteArrayOutputStream(yPixels.length / 2 + 512)
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); out.write(be16(body.length + 2)); out.write(body)
    }
    marker(0xD8) // SOI
    seg(0xFE, comment) // COM
    // two all-ones quant tables, one DQT segment each (multi-segment path)
    seg(0xDB, Array.fill[Byte](65)(1).patch(0, Array(0x00.toByte), 1)) // Tq=0 (Y)
    seg(0xDB, Array.fill[Byte](65)(1).patch(0, Array(0x01.toByte), 1)) // Tq=1 (C)
    seg(0xC0, Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](3,
      1, ((h1 << 4) | v1).toByte, 0, // Y: id 1, sampling, Tq 0
      2, 0x11, 1, // Cb: id 2, 1x1, Tq 1
      3, 0x11, 1)) // Cr: id 3, 1x1, Tq 1
    seg(0xC4, // DHT: luminance DC0 + AC0
      (Array[Byte](0x00) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte)) ++
        (Array[Byte](0x10) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte)))
    seg(0xC4, // DHT: chrominance DC1 + AC1 (separate segment)
      (Array[Byte](0x01) ++ DcBitsC.map(_.toByte) ++ DcValsC.map(_.toByte)) ++
        (Array[Byte](0x11) ++ AcBitsC.map(_.toByte) ++ AcValsC.map(_.toByte)))
    if (ri > 0) seg(0xDD, be16(ri)) // DRI
    seg(0xDA, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS
    val tabsY = new EncTables(DcBits, DcVals, AcBits, AcVals)
    val tabsC = new EncTables(DcBitsC, DcValsC, AcBitsC, AcValsC)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val freq = new Array[Double](64)
    val zz = new Array[Int](64)
    val preds = new Array[Int](3)
    def constBlock(v: Int): Unit =
      java.util.Arrays.fill(block, (v & 0xFF) - 128.0)
    // per-MCU chroma block values: deterministic per (seed, MCU position)
    def cbVal(my: Int, mx: Int): Int =
      java.lang.Math.floorMod(chromaSeed + 97 * my + 31 * mx, 256)
    def crVal(my: Int, mx: Int): Int =
      java.lang.Math.floorMod(3 * chromaSeed + 53 * my + 17 * mx + 128, 256)
    // partial MCUs replicate edge pixels (gray-encoder rule; the decoder
    // clips the out-of-image region back)
    val mcusX = (w + 8 * h1 - 1) / (8 * h1)
    val mcusY = (h + 8 * v1 - 1) / (8 * v1)
    var rstM = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          bw.flush()
          marker(0xD0 + rstM)
          rstM = (rstM + 1) & 7
          java.util.Arrays.fill(preds, 0)
        }
        var v = 0
        while (v < v1) {
          var hh = 0
          while (hh < h1) {
            var y = 0
            while (y < 8) {
              val sy = math.min((my * v1 + v) * 8 + y, h - 1)
              var x = 0
              while (x < 8) {
                val sx = math.min((mx * h1 + hh) * 8 + x, w - 1)
                block(y * 8 + x) = (yPixels(sy * w + sx) & 0xFF) - 128.0
                x += 1
              }
              y += 1
            }
            preds(0) = encodeBlock(bw, block, freq, zz, preds(0), tabsY)
            hh += 1
          }
          v += 1
        }
        constBlock(cbVal(my, mx))
        preds(1) = encodeBlock(bw, block, freq, zz, preds(1), tabsC)
        constBlock(crVal(my, mx))
        preds(2) = encodeBlock(bw, block, freq, zz, preds(2), tabsC)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Block-constant color fixture form (the [[encodeGray8Blocks]]
    * discipline): expand the wB×hB Y block grid to pixels, delegate to
    * the general [[encodeColor]]. */
  def encodeColorBlocks(wB: Int, hB: Int, yVals: Array[Int], mode: Int,
                        ri: Int, chromaSeed: Int,
                        comment: Array[Byte]): Array[Byte] = {
    require(wB > 0 && hB > 0 && wB * 8 <= MaxDim && hB * 8 <= MaxDim,
      s"bad block dims ${wB}x$hB")
    require(yVals.length == wB * hB,
      s"expected ${wB * hB} block values, got ${yVals.length}")
    val w = wB * 8
    val px = new Array[Byte](w * hB * 8)
    var r = 0
    while (r < hB * 8) {
      var c = 0
      while (c < w) {
        px(r * w + c) = (yVals((r / 8) * wB + (c / 8)) & 0xFF).toByte
        c += 1
      }
      r += 1
    }
    encodeColor(w, hB * 8, px, mode, ri, chromaSeed, comment)
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
    * mincode/maxcode (−1 = no codes) and the value pointer. Construction
    * VALIDATES the code space (ADVICE r18): canonical codes of length l
    * live in [0, 2^l), so after assigning BITS(l) codes the running code
    * must not exceed 2^l (T.81 C.2's constraint) — an oversubscribed
    * BITS vector (e.g. three 1-bit codes) is malformed and must decode
    * to NULL, never to garbage pixels. */
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
          if (code > (1 << l)) fail() // oversubscribed code space
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
    /** Consume the RSTm marker at a restart-interval boundary: discard
      * the padding bits of the current byte (the encoder pads the final
      * partial byte with 1-bits before the marker, F.1.2.3 — that byte
      * was already pulled when its data bits were read, so `pos` sits
      * exactly at the marker) and require the EXPECTED modulo-8 marker
      * (E.1.4: RST0..RST7 cycle); a missing, misplaced, or out-of-order
      * restart marker is malformed, never resynchronized-over. */
    def restart(m: Int): Unit = {
      acc = 0; n = 0
      if (pos + 2 > b.length) fail()
      if ((b(pos) & 0xFF) != 0xFF || (b(pos + 1) & 0xFF) != (0xD0 + m)) fail()
      pos += 2
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
    * skipped record; a misread would poison a fingerprint index.
    *
    * This is the r18 STRICT envelope, kept verbatim (specs pin DRI and
    * multi-component to NULL here); [[decodeLuma8]] is the widened
    * decoder real crawled corpora need. */
  def decodeGray8(jpeg: Array[Byte]): Array[Byte] = decodeCore(jpeg, strictGray = true)

  /** Decode the LUMA plane of a baseline JPEG — grayscale OR 3-component
    * YCbCr (4:4:4, 4:2:2, 4:2:0), with DRI/RSTn restart-marker handling
    * (r18 verdict #1: real crawled corpora are overwhelmingly
    * 3-component baseline with restart intervals, and the Y channel is
    * all a perceptual hash needs). Output is the full-resolution w×h Y
    * plane, row-major top-down: chroma subsampling only shrinks the Cb/Cr
    * planes, so Y reconstructs identically across all three samplings;
    * the chroma blocks are entropy-DECODED (the interleaved MCU stream
    * cannot be skipped over) but never dequantized or transformed.
    * Everything else — progressive, 12-bit, arithmetic coding, 4-component
    * CMYK, non-{1x1,2x1,2x2} luma sampling, subsampled-chroma-≠-1x1 — and
    * every malformed byte decodes to NULL, never a misread pixel. */
  def decodeLuma8(jpeg: Array[Byte]): Array[Byte] = decodeCore(jpeg, strictGray = false)

  private def decodeCore(jpeg: Array[Byte], strictGray: Boolean): Array[Byte] = {
    if (jpeg == null || jpeg.length < 4) return null
    try {
      if ((jpeg(0) & 0xFF) != 0xFF || (jpeg(1) & 0xFF) != 0xD8) return null
      var pos = 2
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffDec](4)
      val acTabs = new Array[HuffDec](4)
      var w = -1
      var h = -1
      var nf = 0
      val compId = new Array[Int](3)
      val compHV = new Array[Int](3) // (H << 4) | V per component
      val compTq = new Array[Int](3)
      var ri = 0 // restart interval in MCUs; 0 = none
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
          case 0xC0 => // SOF0 — baseline sequential, 1 or 3 components
            if (w >= 0) fail() // two frames
            if (u8(pos + 2) != 8) fail() // precision
            h = u16(pos + 3); w = u16(pos + 5)
            if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) fail()
            nf = u8(pos + 7)
            if (nf != 1 && (strictGray || nf != 3)) fail()
            if (len != 8 + 3 * nf) fail()
            var ci = 0
            while (ci < nf) {
              compId(ci) = u8(pos + 8 + 3 * ci)
              compHV(ci) = u8(pos + 9 + 3 * ci)
              compTq(ci) = u8(pos + 10 + 3 * ci)
              if (compTq(ci) > 3) fail()
              ci += 1
            }
            if (nf == 1) {
              if (compHV(0) != 0x11) fail() // gray: 1x1 only
            } else {
              // luma (1,1)/(2,1)/(2,2) = 4:4:4 / 4:2:2 / 4:2:0; chroma 1x1
              if (compHV(0) != 0x11 && compHV(0) != 0x21 && compHV(0) != 0x22) fail()
              if (compHV(1) != 0x11 || compHV(2) != 0x11) fail()
              if (compId(0) == compId(1) || compId(0) == compId(2) ||
                  compId(1) == compId(2)) fail()
            }
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            fail() // every non-baseline frame type: out of scope, never misread
          case 0xDD => // DRI
            if (strictGray) fail() // r18 gray contract: unsupported there
            if (len != 4) fail()
            ri = u16(pos + 2)
          case 0xDA => // SOS — decode the single interleaved scan and finish
            if (w < 0) fail()
            val ns = u8(pos + 2)
            if (ns != nf || len != 6 + 2 * ns) fail()
            val dcT = new Array[HuffDec](nf)
            val acT = new Array[HuffDec](nf)
            var ci = 0
            while (ci < nf) {
              // scan component order must equal frame order (the baseline
              // interleave this decoder supports)
              if (u8(pos + 3 + 2 * ci) != compId(ci)) fail()
              val td = u8(pos + 4 + 2 * ci) >> 4
              val ta = u8(pos + 4 + 2 * ci) & 15
              if (td > 3 || ta > 3) fail()
              dcT(ci) = dcTabs(td)
              acT(ci) = acTabs(ta)
              // every referenced table — incl. the chroma quant table the
              // luma path never multiplies by — must be DEFINED
              if (dcT(ci) == null || acT(ci) == null || quant(compTq(ci)) == null) fail()
              ci += 1
            }
            val ssAt = pos + 3 + 2 * ns
            if (u8(ssAt) != 0 || u8(ssAt + 1) != 63 || u8(ssAt + 2) != 0) fail()
            val qY = quant(compTq(0))
            val h1 = compHV(0) >> 4
            val v1 = compHV(0) & 15
            val br = new BitReader(jpeg, end)
            val out = new Array[Byte](w * h)
            val coefZ = new Array[Int](64)
            val freq = new Array[Double](64)
            val pix = new Array[Double](64)
            val preds = new Array[Int](3)
            val mcusX = (w + 8 * h1 - 1) / (8 * h1)
            val mcusY = (h + 8 * v1 - 1) / (8 * v1)
            var rstNext = 0 // next expected RSTm index (mod 8)
            var mcu = 0
            // decode one 8x8 block of component `c`; reconstruct into the
            // Y plane at block (by, bx) iff c == 0 (chroma advances the
            // entropy stream and the DC predictor, nothing else)
            def block(c: Int, by: Int, bx: Int): Unit = {
              java.util.Arrays.fill(coefZ, 0)
              val t = dcT(c).decode(br)
              if (t > 11) fail()
              preds(c) += extend(br.receive(t), t)
              coefZ(0) = preds(c)
              var k = 1
              while (k < 64) {
                val rs = acT(c).decode(br)
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
              if (c == 0) {
                var i = 0
                while (i < 64) { freq(Zigzag(i)) = (coefZ(i) * qY(i)).toDouble; i += 1 }
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
              }
            }
            var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                if (ri > 0 && mcu > 0 && mcu % ri == 0) {
                  br.restart(rstNext)
                  rstNext = (rstNext + 1) & 7
                  java.util.Arrays.fill(preds, 0)
                }
                var v = 0
                while (v < v1) {
                  var hh = 0
                  while (hh < h1) {
                    block(0, my * v1 + v, mx * h1 + hh)
                    hh += 1
                  }
                  v += 1
                }
                var c = 1
                while (c < nf) { block(c, 0, 0); c += 1 }
                mcu += 1
                mx += 1
              }
              my += 1
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

/** `jpeg_decode_luma8(payload)` → the full-resolution Y plane (binary,
  * row-major top-down) of a baseline JPEG — grayscale or 3-component
  * YCbCr (4:4:4/4:2:2/4:2:0) with restart markers — or NULL for any
  * malformed/unsupported input ([[JpegKernel.decodeLuma8]]). */
case class JpegDecodeLuma8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_decode_luma8"

  override def nullSafeEval(b: Any): Any =
    JpegKernel.decodeLuma8(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      byte[] ${ev.value}_r = org.apache.spark.sql.graft.JpegKernel.decodeLuma8($b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `jpeg_encode_color_blocks(wB, hB, opts_and_yvals, comment)` → 3-component
  * YCbCr baseline-JPEG bytes. The array argument packs the fixture
  * options ahead of the Y block values — `[mode, ri, chromaSeed] ++
  * yVals` (mode 0/1/2 = 4:4:4/4:2:2/4:2:0; ri = restart interval in
  * MCUs, 0 = none; chromaSeed drives the per-doc block-constant chroma
  * planes) — keeping the expression at the same arity and codegen shape
  * as [[JpegEncodeGray8Blocks]]. Construction bugs error loudly, never
  * decode to NULL. */
case class JpegEncodeColorBlocks(first: Expression, second: Expression,
                                 third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(IntegerType, IntegerType, ArrayType(IntegerType), StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_encode_color_blocks"

  private def encode(wB: Int, hB: Int, arr: ArrayData, com: UTF8String): Array[Byte] = {
    val n = arr.numElements()
    require(n == 3 + wB * hB,
      s"expected [mode, ri, chromaSeed] ++ ${wB * hB} block values, got $n elements")
    val vals = new Array[Int](n - 3)
    var i = 3
    while (i < n) { vals(i - 3) = arr.getInt(i); i += 1 }
    JpegKernel.encodeColorBlocks(wB, hB, vals, arr.getInt(0), arr.getInt(1),
      arr.getInt(2), com.getBytes)
  }

  override def nullSafeEval(w: Any, h: Any, a: Any, c: Any): Any =
    encode(w.asInstanceOf[Int], h.asInstanceOf[Int],
      a.asInstanceOf[ArrayData], c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jpegEncC", this, classOf[JpegEncodeColorBlocks].getName)
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

  def jpeg_decode_luma8(payload: Column): Column =
    ExpressionUtils.column(JpegDecodeLuma8(ExpressionUtils.expression(payload)))

  def jpeg_encode_color_blocks(wB: Column, hB: Column, optsAndY: Column,
                               comment: Column): Column =
    ExpressionUtils.column(JpegEncodeColorBlocks(
      ExpressionUtils.expression(wB), ExpressionUtils.expression(hB),
      ExpressionUtils.expression(optsAndY), ExpressionUtils.expression(comment)))

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
    (new FunctionIdentifier("jpeg_decode_luma8"),
      new ExpressionInfo(classOf[JpegDecodeLuma8].getName, "jpeg_decode_luma8"),
      cs => { require(cs.length == 1, s"jpeg_decode_luma8 expects 1 arg, got ${cs.length}")
        JpegDecodeLuma8(cs.head) }),
    (new FunctionIdentifier("jpeg_encode_color_blocks"),
      new ExpressionInfo(classOf[JpegEncodeColorBlocks].getName, "jpeg_encode_color_blocks"),
      cs => { require(cs.length == 4, s"jpeg_encode_color_blocks expects 4 args, got ${cs.length}")
        JpegEncodeColorBlocks(cs(0), cs(1), cs(2), cs(3)) }),
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
