package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{PngFunctions, PngKernel}

/** The PNG gray8 encode/decode kernels and the compressed-format
  * perceptual pipeline ([[Multimodal.mmPhashPng]]). The contracts:
  * encode→decode is the identity over every filter type and shape
  * (including the edge geometries where Sub/Average/Paeth degenerate),
  * every class of malformed input decodes to NULL (never a misread
  * pixel), and the PNG fingerprint path equals the BMP path bit for bit
  * — the property that lets the family share one ground-truth oracle. */
class PngSpec extends SparkSpec {
  import spark.implicits._

  private def pix(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => (((i * 31 + seed * 17) % 251) & 0xFF).toByte)

  test("encode→decode identity across shapes (all five filters exercised)") {
    // 8 rows → filters 0..4 all used (r % 5); w=1 degenerates left/ul to
    // 0 in Sub/Average/Paeth; h=1 degenerates up; non-square shapes too
    for ((w, h) <- Seq((8, 8), (1, 8), (8, 1), (5, 3), (3, 7), (1, 1), (64, 64))) {
      val p = pix(w * h, w * 100 + h)
      val png = PngKernel.encodeGray8(w, h, p)
      val back = PngKernel.decodeGray8(png)
      assert(back != null, s"decode failed for ${w}x$h")
      assert(back.toSeq === p.toSeq, s"round trip broke pixels at ${w}x$h")
    }
  }

  test("the fixture is a REAL multi-IDAT png: signature, chunk set, two IDATs") {
    val png = PngKernel.encodeGray8(8, 8, pix(64, 1))
    assert(png.take(8).toSeq ===
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunkTypes(b: Array[Byte]): Seq[String] = {
      var off = 8
      val out = Seq.newBuilder[String]
      while (off + 12 <= b.length) {
        val len = ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
          ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
        out += new String(b, off + 4, 4, "US-ASCII")
        off += 12 + len
      }
      out.result()
    }
    assert(chunkTypes(png) === Seq("IHDR", "IDAT", "IDAT", "IEND"),
      "the zlib stream must span two IDAT chunks (concatenation is load-bearing)")
  }

  test("malformed inputs decode to NULL, never a misread: the full taxonomy") {
    val good = PngKernel.encodeGray8(8, 8, pix(64, 2))
    assert(PngKernel.decodeGray8(good) != null)
    // truncation at every structural boundary
    for (cut <- Seq(4, 8, 20, 40, good.length - 1))
      assert(PngKernel.decodeGray8(good.take(cut)) === null, s"truncated at $cut")
    // bad signature
    val badSig = good.clone(); badSig(0) = 0x88.toByte
    assert(PngKernel.decodeGray8(badSig) === null)
    // flipped byte inside IDAT data: the chunk CRC must catch it
    val badCrc = good.clone()
    badCrc(8 + 12 + 13 + 12) = (badCrc(8 + 12 + 13 + 12) ^ 0x55).toByte
    assert(PngKernel.decodeGray8(badCrc) === null, "a CRC mismatch must not decode")
    // wrong color type (RGB) with a FIXED-UP CRC: rejected on the header
    val rgb = good.clone()
    rgb(8 + 8 + 9) = 2
    val c = new java.util.zip.CRC32; c.update(rgb, 12, 17)
    val crc = c.getValue.toInt
    rgb(8 + 8 + 13) = (crc >>> 24).toByte; rgb(8 + 8 + 14) = (crc >>> 16).toByte
    rgb(8 + 8 + 15) = (crc >>> 8).toByte; rgb(8 + 8 + 16) = crc.toByte
    assert(PngKernel.decodeGray8(rgb) === null, "non-gray8 must be refused, not misread")
    // garbage where the zlib stream should be (framing + CRC valid)
    assert(PngKernel.decodeGray8(hostile(zlib = Array.fill[Byte](20)(0x7F))) === null)
    assert(PngKernel.decodeGray8(null) === null)
    assert(PngKernel.decodeGray8(Array.emptyByteArray) === null)
    // trailing bytes after IEND (r17 ADVICE): strictly malformed
    assert(PngKernel.decodeGray8(good :+ 0x00.toByte) === null,
      "bytes after IEND must be refused, not ignored")
  }

  /** A CRC-valid chunk with a small (< 256 B) payload. */
  private def chunkOf(tpe: String, data: Array[Byte]): Array[Byte] = {
    val t = tpe.getBytes("US-ASCII")
    val out = new Array[Byte](12 + data.length)
    out(0) = 0; out(1) = 0; out(2) = 0; out(3) = data.length.toByte
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val c = new java.util.zip.CRC32; c.update(out, 4, 4 + data.length)
    val v = c.getValue.toInt
    out(8 + data.length) = (v >>> 24).toByte
    out(9 + data.length) = (v >>> 16).toByte
    out(10 + data.length) = (v >>> 8).toByte
    out(11 + data.length) = v.toByte
    out
  }

  /** A structurally valid 8x8 gray8 png whose IDAT carries `zlib`. */
  private def hostile(zlib: Array[Byte]): Array[Byte] = {
    val ihdr = new Array[Byte](13)
    ihdr(3) = 8; ihdr(7) = 8; ihdr(8) = 8
    Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunkOf("IHDR", ihdr) ++ chunkOf("IDAT", zlib) ++
      chunkOf("IEND", Array.emptyByteArray)
  }

  test("oversized declared dimensions are refused (decoder memory bound)") {
    // a CRC-VALID header declaring 1048576x8: the refusal must come from
    // the dimension bound itself, before any allocation
    val ihdr = new Array[Byte](13)
    ihdr(1) = 0x10; ihdr(7) = 8; ihdr(8) = 8 // width 0x00100000
    val big = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunkOf("IHDR", ihdr) ++ chunkOf("IDAT", Array.emptyByteArray) ++
      chunkOf("IEND", Array.emptyByteArray)
    assert(PngKernel.decodeGray8(big) === null)
  }

  test("the expressions run codegen'd over a frame; malformed rows filter, not fail") {
    val good = (0 until 64).toArray
    val df = Seq(1L, 2L).toDF("doc_id")
      .withColumn("payload", PngFunctions.png_encode_gray8(lit(8), lit(8),
        typedLit(good)))
    val corrupted = df.withColumn("payload",
      when(col("doc_id") === 2L, expr("substring(payload, 1, 30)"))
        .otherwise(col("payload")))
    val out = corrupted
      .withColumn("pix", PngFunctions.png_decode_gray8(col("payload")))
    assert(out.where(col("pix").isNotNull).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L),
      "the truncated payload must decode to NULL inside the query, not error")
    val bytes = out.where(col("doc_id") === 1L)
      .selectExpr("transform(sequence(0,63), i -> " +
        "cast(conv(hex(substring(pix, i + 1, 1)), 16, 10) AS INT))")
      .as[Seq[Int]].head()
    assert(bytes === good.toSeq)
  }

  test("the codec is callable from raw SQL text (the GraftExtensions surface)") {
    org.apache.spark.sql.graft.PngFunctions.registerSql(spark)
    Seq((1L, (0 until 64).toList)).toDF("doc_id", "px")
      .createOrReplaceTempView("png_sql_src")
    val n = spark.sql(
      "SELECT octet_length(png_decode_gray8(png_encode_gray8(8, 8, px))) AS n " +
        "FROM png_sql_src").as[Int].head()
    assert(n === 64)
  }

  test("the plan inflates each payload ONCE per join side (no optimizer re-inlining)") {
    // without the Generate barrier in pngAHash, predicate pushdown
    // substituted the pix alias back into decode(payload) and each
    // payload was inflated three times per side (validity conjuncts +
    // projection) — pin the executed-plan occurrence count
    val plan = Multimodal.mmPhashPng(spark, sf)
      .queryExecution.executedPlan.toString
    val n = "png_decode_gray8".r.findAllMatchIn(plan).length
    assert(n === 2, s"png_decode_gray8 must appear once per self-join side, got $n")
  }

  test("PNG fingerprints equal BMP fingerprints bit for bit (shared-oracle property)") {
    val png = Multimodal.mmPhashPng(spark, sf)
      .as[(Long, Long, Int)].collect().toSeq
    val viaBmp = Multimodal.mmPhashNeardup(spark, sf)
      .as[(Long, Long, Int)].collect().toSeq
    assert(png === viaBmp,
      "deflate→inflate→defilter→parse must be the identity, or pairs diverge")
    assert(png.nonEmpty, "the planted near-dups must surface (non-vacuous)")
  }
}
