package graft

import graft.functions.TextAnalytics
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {

  test("token counts: distinct ≤ total, chars consistent with single-space join") {
    val t = TextAnalytics.tokenCount(spark, sf)
    assert(t.filter(col("n_distinct_tokens") > col("n_tokens")).count() === 0)
    assert(t.filter(col("n_tokens") < 1).count() === 0)
  }

  test("word_freq totals equal the corpus token count") {
    // corpus is tiny-vocab so top-100 covers every word
    val freqSum = TextAnalytics.wordFreq(spark, sf).agg(sum("freq")).first().getLong(0)
    val tokens  = TextAnalytics.tokenCount(spark, sf).agg(sum("n_tokens")).first().getLong(0)
    assert(freqSum === tokens)
  }

  test("quality: ratios bounded, score deterministic across runs") {
    val q1 = TextAnalytics.qualityScore(spark, sf)
    assert(q1.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    val a = q1.orderBy("doc_id").collect()
    val b = TextAnalytics.qualityScore(spark, sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("fingerprints: md5 is 32 hex chars; bag_md5 is word-order invariant") {
    import spark.implicits._
    val fp = TextAnalytics.fingerprint(spark, sf)
    assert(fp.filter(length(col("content_md5")) =!= 32).count() === 0)
    // same bag of words, different order → same bag_md5
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"))
      .toDF("doc_id", "text")
    val bags = df.select(md5(concat_ws(" ",
      array_sort(array_distinct(split(lower(col("text")), " "))))).as("bag"))
      .distinct()
    assert(bags.count() === 1)
  }

  test("typed decodeMedia: cardinality, determinism, and unknown-format totality") {
    // text-byte payloads are no recognized container: the decoder must
    // classify them 'unknown' and still return a total row per record
    val recs = Multimodal.mediaRecords(spark, sf)
    val f1 = Multimodal.decodeMedia(recs).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeMedia(recs).collect().sortBy(_.doc_id)
    assert(f1.length === recs.count())
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(f => f.format == "unknown" && f.width.isEmpty && f.byte_len > 0))
  }

  test("decodeMedia parses golden real-format bytes exactly") {
    import spark.implicits._
    // PNG: the canonical 1x1 RGBA header (real signature, real IHDR)
    val png = ("89504E470D0A1A0A" + "0000000D49484452" +
      "00000001" + "00000001" + "0806000000" + "1F15C489").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    // WAV: canonical 44-byte header written independently via ByteBuffer
    // (LITTLE_ENDIAN), 2ch 16-bit 44100 Hz, 10 samples of real zeros
    val dataSize = 10 * 2 * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    val recs = Seq(
      Multimodal.MediaRecord(1L, png, "image/png", "xx", 0L),
      Multimodal.MediaRecord(2L, bb.array(), "audio/wav", "xx", 0L)).toDS()
    val out = Multimodal.decodeMedia(recs).collect().sortBy(_.doc_id)
    assert(out(0) === Multimodal.MediaMeta(1L, "png", png.length,
      Some(1), Some(1), None, None, None))
    assert(out(1) === Multimodal.MediaMeta(2L, "wav", 44 + dataSize,
      None, None, Some(2), Some(44100), Some(10L)))
  }

  test("JPEG marker walk parses golden bytes; SOF past the unroll yields null, never wrong") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // golden: a real minimal JPEG header stream — SOI, JFIF APP0, one
    // 3-byte comment, SOF0 declaring 17x33, 3 components
    val golden = hx("FFD8" +
      "FFE000104A46494600010100004800480000" +
      "FFFE0005414141" +
      "FFC0001108" + "0011" + "0021" + "03011100021101031101" +
      "FFD9")
    // adversarial: SOF sits behind MORE metadata segments than the
    // unroll depth — contract is null dimensions, never misreads
    val deep = hx("FFD8" +
      ("FFFE0005414141" * (Multimodal.JpegWalkDepth + 1)) +
      "FFC0001108" + "0011" + "0021" + "03011100021101031101" +
      "FFD9")
    // corrupt A: a non-marker word (no 0xFF prefix) precedes a perfectly
    // plausible SOF0 — an unvalidated walk would stride the fake segment
    // and "find" 99x100; the contract is null, never a misread
    val badPrefix = hx("FFD8" + "ABCD0002" +
      "FFC0001108" + "0063" + "0064" + "03011100021101031101" + "FFD9")
    // corrupt B: a COM segment whose BE16 length (1) cannot cover itself —
    // advancing by it would desynchronize the walk onto payload bytes
    val badLen = hx("FFD8" + "FFFE0001" +
      "FFC0001108" + "0011" + "0021" + "03011100021101031101" + "FFD9")
    val out = Multimodal.jpegDecodeFrom(
        Seq((1L, golden), (2L, deep), (3L, "not a jpeg".getBytes("US-ASCII")),
            (4L, badPrefix), (5L, badLen))
          .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val g = out(1L)
    assert(g.getAs[String]("format") == "jpeg")
    assert(g.getAs[Int]("height") == 17 && g.getAs[Int]("width") == 33)
    assert(g.getAs[Int]("precision") == 8 && g.getAs[Int]("n_components") == 3)
    val d = out(2L)
    assert(d.getAs[String]("format") == "jpeg")
    assert(d.isNullAt(d.fieldIndex("height")) && d.isNullAt(d.fieldIndex("width")),
      "SOF beyond the walk depth must parse as null, not a misread")
    assert(out(3L).getAs[String]("format") == "unknown")
    Seq(4L -> "invalid marker prefix", 5L -> "length below 2").foreach { case (id, why) =>
      val r = out(id)
      assert(r.getAs[String]("format") == "jpeg") // SOI is intact; body is corrupt
      assert(r.isNullAt(r.fieldIndex("height")) && r.isNullAt(r.fieldIndex("width")),
        s"corrupt stream ($why) must terminate the walk with null dims, got a misread")
    }
  }

  test("SQL parser and typed decoder agree on every fixture payload") {
    import spark.implicits._
    val typed = Multimodal.decodeMedia(
      Multimodal.mediaPayloads(spark, sf)
        .select(col("doc_id"), col("payload"), lit("application/octet-stream").as("mime"),
          lit("xx").as("lang"), lit(0L).as("n_chars"))
        .as[Multimodal.MediaRecord])
      .collect().map(m => m.doc_id ->
        (m.format, m.byte_len, m.width, m.height, m.channels,
          m.sample_rate, m.n_samples)).toMap
    val sql = Multimodal.mmDecodeMeta(spark, sf).collect()
    assert(sql.nonEmpty)
    sql.foreach { r =>
      def optInt(c: String) = Option(r.getAs[Any](c)).map(_.asInstanceOf[Int])
      val got = (r.getAs[String]("format"), r.getAs[Int]("byte_len"),
        optInt("width"), optInt("height"), optInt("channels"),
        optInt("sample_rate"),
        Option(r.getAs[Any]("n_samples")).map(_.asInstanceOf[Long]))
      assert(typed(r.getAs[Long]("doc_id")) === got, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("mm_features header_hex matches the payload's leading bytes") {
    val r = Multimodal.mmFeatures(spark, sf).limit(1).collect()(0)
    val doc = Tables.documents(spark, sf).orderBy("doc_id").limit(1).collect()(0)
    val expected = doc.getString(doc.fieldIndex("text")).getBytes("UTF-8")
      .take(8).map("%02X".format(_)).mkString
    assert(r.getString(r.fieldIndex("header_hex")) === expected)
  }
}
