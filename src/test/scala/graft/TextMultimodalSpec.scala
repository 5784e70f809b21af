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

  test("BMP aHash parses golden bytes exactly; malformed input yields NO fingerprint") {
    import spark.implicits._
    // golden: a real 8x8 24-bit BMP written independently via ByteBuffer
    // (LITTLE_ENDIAN), known pixel ramp, bottom-up rows like the spec says
    val pix = Array.tabulate(64)(i => (i * 37 + 11) % 200)
    def buildBmp(w: Int = 8, h: Int = 8, bpp: Short = 24, comp: Int = 0,
                 off: Int = 54): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(246)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(246).putInt(0).putInt(off)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(bpp)
        .putInt(comp).putInt(192).putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (stor <- 0 until 8; c <- 0 until 8) {
        val v = pix((7 - stor) * 8 + c).toByte
        bb.put(v).put(v).put(v)
      }
      bb.array()
    }
    val mean = pix.sum / 64
    val expected = (0 until 60).map(b => if (pix(b) >= mean) 1L << b else 0L).sum
    val out = Multimodal.bmpAHash(Seq((1L, buildBmp())).toDF("doc_id", "payload"))
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == expected,
      s"golden aHash mismatch: got ${out.headOption.map(_.getLong(1))}, want $expected")

    // adversarial: every malformed shape must yield ZERO rows — a
    // fingerprint from garbage would poison the near-dup pair set
    val malformed = Seq(
      2L -> Array.empty[Byte],                          // empty
      3L -> buildBmp().take(50),                        // truncated header
      4L -> buildBmp().take(200),                       // truncated pixels
      5L -> ("89504E470D0A1A0A" + "00" * 238).grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray,   // PNG magic
      6L -> buildBmp(w = 16),                           // wrong width
      7L -> buildBmp(bpp = 8),                          // palette form
      8L -> buildBmp(comp = 1),                         // RLE-compressed
      9L -> buildBmp(off = 60))                         // nonstandard offset
    val bad = Multimodal.bmpAHash(malformed.toDF("doc_id", "payload")).collect()
    assert(bad.isEmpty, s"malformed BMPs produced fingerprints: ${bad.mkString(",")}")

    // planted structure survives the whole query: every fixture group of
    // four consecutive doc_ids yields its near-dup pairs, all intra-group
    val pairs = Multimodal.mmPhashNeardup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty, "no near-dup pairs found in the planted fixture")
    assert(pairs.forall { case (d1, d2, ham) => ham <= 8 && d1 < d2 })
    val intra = pairs.count { case (d1, d2, _) => d1 / 4 == d2 / 4 }
    assert(intra * 10 >= pairs.length * 9,
      s"expected ≥90% intra-group pairs, got $intra of ${pairs.length}")
  }

  test("WAV energy hash parses golden bytes exactly; malformed input yields NO fingerprint") {
    import spark.implicits._
    // golden: a real 240-sample mono 16-bit WAV written independently via
    // ByteBuffer (LITTLE_ENDIAN), known sample ramp incl. negatives
    val samples = Array.tabulate(240)(t => ((t * 131 + 77) % 1601 - 800).toShort)
    def buildWav(fmt: Short = 1, ch: Short = 1, bits: Short = 16,
                 dataSize: Int = 480, truncateTo: Int = 524): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(524)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 480)
        .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(fmt).putShort(ch).putInt(8000).putInt(16000)
        .putShort(2).putShort(bits)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(bb.putShort(_))
      bb.array().take(truncateTo)
    }
    // independent reference: |s| per 4-sample chunk vs exact-integer mean
    val chunkE = samples.grouped(4).map(_.map(s => math.abs(s.toInt)).sum).toArray
    val total = chunkE.sum.toLong
    val expected = (0 until 60)
      .map(c => if (chunkE(c) * 60L >= total) 1L << c else 0L).sum
    val out = Multimodal.wavEnergyHash(
      Seq((1L, buildWav())).toDF("doc_id", "payload")).collect()
    assert(out.length == 1 && out(0).getLong(1) == expected,
      s"golden energy hash mismatch: got ${out.headOption.map(_.getLong(1))}, want $expected")

    val malformed = Seq(
      2L -> Array.empty[Byte],
      3L -> buildWav(truncateTo = 40),          // truncated header
      4L -> buildWav(truncateTo = 500),         // truncated samples
      5L -> buildWav(fmt = 3),                  // float PCM
      6L -> buildWav(ch = 2),                   // stereo
      7L -> buildWav(bits = 8),                 // 8-bit
      8L -> buildWav(dataSize = 400))           // size lies
    val bad = Multimodal.wavEnergyHash(malformed.toDF("doc_id", "payload")).collect()
    assert(bad.isEmpty, s"malformed WAVs produced fingerprints: ${bad.mkString(",")}")

    // planted structure end-to-end: near-dup pairs exist and are
    // overwhelmingly intra-group
    val pairs = Multimodal.mmAudioNeardup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty, "no audio near-dup pairs in the planted fixture")
    assert(pairs.forall { case (d1, d2, ham) => ham <= 8 && d1 < d2 })
    val intra = pairs.count { case (d1, d2, _) => d1 / 4 == d2 / 4 }
    assert(intra * 10 >= pairs.length * 9,
      s"expected ≥90% intra-group pairs, got $intra of ${pairs.length}")
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

  test("MP3 decode: golden ID3v2+frame bytes parse exactly; malformed → null, never wrong") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // golden: hand-written ID3v2.3 header with a 130-byte tag (syncsafe
    // 130 = 0x01,0x02 across the 7-bit boundary), then an MPEG1 Layer III
    // frame header: 128 kbps (idx 9), 44100 Hz (idx 0), joint stereo
    val golden = hx("494433030000" + "00000102" + ("00" * 130) +
      "FFFB" + "9040" + "00" * 4)
    // MPEG2 golden: 64 kbps for V2L3 is idx 8, 16000 Hz is idx 2, mono
    val golden2 = hx("494433030000" + "00000000" +
      "FFF3" + "88C0" + "00" * 4)
    // adversarial A: tag size points past a broken sync (0xFE) — an
    // unvalidated parse would still emit fields from the garbage bytes
    val badSync = hx("494433030000" + "00000000" + "FEFB9040")
    // adversarial B: reserved bitrate index 15 — defined sync, bad field
    val badBitrate = hx("494433030000" + "00000000" + "FFFB" + "F040")
    // adversarial C: reserved samplerate index 3
    val badRate = hx("494433030000" + "00000000" + "FFFB" + "9C40")
    val out = Multimodal.mp3DecodeFrom(
        Seq((1L, golden), (2L, golden2), (3L, badSync), (4L, badBitrate),
            (5L, badRate), (6L, "not an mp3".getBytes("US-ASCII")))
          .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val g = out(1L)
    assert(g.getAs[String]("format") == "mp3" && g.getAs[Int]("tag_size") == 130)
    assert(g.getAs[String]("mpeg_version") == "1" && g.getAs[Int]("layer") == 3)
    assert(g.getAs[Int]("bitrate_kbps") == 128 && g.getAs[Int]("sample_rate_hz") == 44100)
    assert(g.getAs[String]("channel_mode") == "joint_stereo")
    val g2 = out(2L)
    assert(g2.getAs[String]("mpeg_version") == "2" &&
      g2.getAs[Int]("bitrate_kbps") == 64 &&
      g2.getAs[Int]("sample_rate_hz") == 16000 &&
      g2.getAs[String]("channel_mode") == "mono")
    Seq(3L -> "broken sync", 4L -> "reserved bitrate", 5L -> "reserved samplerate")
      .foreach { case (id, why) =>
        val r = out(id)
        assert(r.getAs[String]("format") == "mp3") // ID3 magic is intact
        assert(r.isNullAt(r.fieldIndex("bitrate_kbps")) &&
          r.isNullAt(r.fieldIndex("sample_rate_hz")),
          s"malformed frame header ($why) must decode null fields, got a misread")
      }
    assert(out(6L).getAs[String]("format") == "unknown")
  }

  test("EXIF decode: both byte orders parse golden bytes; corrupt TIFF → null, never wrong") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // golden LE: SOI, 3-byte COM, APP1/Exif, II TIFF, IFD0 with one dummy
    // entry BEFORE orientation=6 (so the scan walks past a non-matching tag)
    val tiffLe = "49492A00" + "08000000" + "0200" +
      "0E0102000000000000000000" +                    // dummy entry
      "12010300" + "01000000" + "06000000" +          // orientation 6
      "00000000"
    val goldenLe = hx("FFD8" + "FFFE0005414141" +
      "FFE1" + "%04X".format(2 + 6 + tiffLe.length / 2) + "457869660000" +
      tiffLe + "FFD9")
    // golden BE: MM TIFF, orientation 3, no dummy entries
    val tiffBe = "4D4D002A" + "00000008" + "0001" +
      "01120003" + "00000001" + "00030000" +
      "00000000"
    val goldenBe = hx("FFD8" +
      "FFE1" + "%04X".format(2 + 6 + tiffBe.length / 2) + "457869660000" +
      tiffBe + "FFD9")
    // adversarial A: APP1 present but the Exif id is wrong — a sloppy
    // parser would read the XMP body as a TIFF header
    val badId = hx("FFD8" + "FFE1" + "0010" + "687474703A2F2F00" +
      "49492A0008000000" + "FFD9")
    // adversarial B: unknown byte-order mark
    val badBo = hx("FFD8" + "FFE1" + "%04X".format(2 + 6 + tiffBe.length / 2) +
      "457869660000" + "5858002A" + tiffBe.drop(8) + "FFD9")
    // adversarial C: IFD has entries but none is Orientation
    val tiffNone = "49492A00" + "08000000" + "0100" +
      "0E0102000000000000000000" + "00000000"
    val noOrient = hx("FFD8" + "FFE1" + "%04X".format(2 + 6 + tiffNone.length / 2) +
      "457869660000" + tiffNone + "FFD9")
    // adversarial D: the APP1 length truncates the segment right after
    // the TIFF header, and entry-shaped bytes sit just PAST the segment
    // where the declared IFD offset lands — an unbounded walk would read
    // them as a genuine orientation=5 entry
    val ifdPastSeg = hx("FFD8" + "FFE1" + "0010" + "457869660000" +
      "49492A00" + "08000000" +                       // segment ends here
      "0100" + "12010300" + "01000000" + "05000000" + // fake IFD outside it
      "00000000" + "FFD9")
    val out = Multimodal.exifDecodeFrom(
        Seq((1L, goldenLe), (2L, goldenBe), (3L, badId), (4L, badBo),
            (5L, noOrient), (6L, "not a jpeg".getBytes("US-ASCII")),
            (7L, ifdPastSeg))
          .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val past = out(7L)
    assert(past.isNullAt(past.fieldIndex("orientation")) &&
      past.isNullAt(past.fieldIndex("byte_order")),
      "an IFD landing outside the APP1 segment must parse null, not read stray bytes")
    val le = out(1L)
    assert(le.getAs[String]("byte_order") == "II" &&
      le.getAs[Int]("n_ifd_entries") == 2 && le.getAs[Int]("orientation") == 6)
    val be = out(2L)
    assert(be.getAs[String]("byte_order") == "MM" &&
      be.getAs[Int]("n_ifd_entries") == 1 && be.getAs[Int]("orientation") == 3)
    Seq(3L -> "wrong Exif id", 4L -> "unknown byte order").foreach { case (id, why) =>
      val r = out(id)
      assert(r.isNullAt(r.fieldIndex("byte_order")) &&
        r.isNullAt(r.fieldIndex("orientation")),
        s"corrupt TIFF ($why) must parse null, got a misread")
    }
    val no = out(5L)
    assert(no.getAs[String]("byte_order") == "II" &&
      no.getAs[Int]("n_ifd_entries") == 1 &&
      no.isNullAt(no.fieldIndex("orientation")),
      "IFD without an orientation tag must yield null orientation")
    assert(out(6L).getAs[String]("format") == "unknown")
  }

  test("MP4 box walk: golden v0/v1 mvhd parse exactly; corrupt sizes → null, never wrong") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // golden v0: ftyp, a 5-byte free box, moov whose mvhd declares
    // timescale 600, duration 1800 (3 s -> 3000 ms)
    val mvhd0 = "0000006C" + "6D766864" + "00000000" +
      "00000000" + "00000000" + "00000258" + "00000708" + "00" * 80
    val g0 = hx("00000010" + "66747970" + "69736F6D" + "00000000" +
      "0000000D" + "66726565" + "0000000000" +
      "00000074" + "6D6F6F76" + mvhd0)
    // golden v1: 64-bit times, timescale 1000, duration 1500 -> 1500 ms
    val mvhd1 = "00000078" + "6D766864" + "01000000" +
      "0000000000000000" + "0000000000000000" +
      "000003E8" + "00000000000005DC" + "00" * 80
    val g1 = hx("00000010" + "66747970" + "69736F6D" + "00000000" +
      "00000080" + "6D6F6F76" + mvhd1)
    // adversarial A: a box size below 8 before moov — advancing by it
    // would loop in place or misalign; the walk must terminate null
    val badSize = hx("00000010" + "66747970" + "69736F6D" + "00000000" +
      "00000004" + "66726565" +
      "00000074" + "6D6F6F76" + mvhd0)
    // adversarial B: moov's first child is not mvhd
    val noMvhd = hx("00000010" + "66747970" + "69736F6D" + "00000000" +
      "00000074" + "6D6F6F76" + mvhd0.replace("6D766864", "75647461"))
    val out = Multimodal.mp4DecodeFrom(
        Seq((1L, g0), (2L, g1), (3L, badSize), (4L, noMvhd),
            (5L, "not an mp4".getBytes("US-ASCII")))
          .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = out(1L)
    assert(a.getAs[String]("format") == "mp4" && a.getAs[String]("major_brand") == "isom")
    assert(a.getAs[Int]("mvhd_version") == 0 && a.getAs[Int]("timescale") == 600)
    assert(a.getAs[Long]("duration") == 1800L && a.getAs[Long]("duration_ms") == 3000L)
    val b = out(2L)
    assert(b.getAs[Int]("mvhd_version") == 1 && b.getAs[Int]("timescale") == 1000)
    assert(b.getAs[Long]("duration") == 1500L && b.getAs[Long]("duration_ms") == 1500L)
    Seq(3L -> "size < 8", 4L -> "first child not mvhd").foreach { case (id, why) =>
      val r = out(id)
      assert(r.getAs[String]("format") == "mp4") // ftyp intact; body corrupt
      assert(r.isNullAt(r.fieldIndex("timescale")) &&
        r.isNullAt(r.fieldIndex("duration_ms")),
        s"corrupt stream ($why) must parse null, got a misread")
    }
    assert(out(5L).getAs[String]("format") == "unknown")
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

  test("bm25 ranking: tf saturation, length normalization, rare-term weight") {
    import spark.implicits._
    // four 10-token docs, query = {apple, pear}: apple is common (3 docs),
    // pear rare (1 doc). Fillers unique per doc so df is exactly as built.
    def doc(id: Long, terms: String*) = {
      val fill = (terms.size until 10).map(i => s"f_${id}_$i")
      (id, (terms ++ fill).mkString(" "))
    }
    val docs = Seq(
      doc(1, "apple"),                          // tf(apple)=1, dl=10
      doc(2, "apple", "apple", "apple"),        // tf(apple)=3, dl=10
      doc(3, "pear"),                           // tf(pear)=1,  dl=10
      doc(4, "apple")                           // like doc 1
    ).toDF("doc_id", "text")
    val got = TextAnalytics.bm25From(docs, Seq("apple", "pear"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(2L) > got(1L), "higher tf at equal length must score higher")
    assert(got(2L) < 3 * got(1L), "saturation: tf=3 must be worth less than 3x tf=1")
    assert(got(3L) > got(1L), "the rarer term (df=1 vs 3) must outweigh at equal tf")
    assert(got(1L) === got(4L), "identical tf/dl/df must tie exactly")
    // equal-length corpus ⇒ length normalization is inert here; prove it
    // bites: same tf in a LONGER doc scores lower
    val docs2 = Seq(
      doc(5, "apple"),
      (6L, ("apple" +: (1 until 30).map(i => s"g_$i")).mkString(" ")),
      doc(7, "apple") // second apple doc so df>0 context stays comparable
    ).toDF("doc_id", "text")
    val got2 = TextAnalytics.bm25From(docs2, Seq("apple"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2(6L) < got2(5L), "same tf in a longer doc must score lower")
  }
}
