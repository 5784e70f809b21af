package graft

import graft.operators.Multimodal
import graft.streaming.PhashStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming perceptual image near-dup ([[PhashStream]]): stream ==
  * one-shot after every micro-batch (including cross-batch planted
  * pairs), malformed images admitted as no-ops, replay idempotence. */
class PhashStreamSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def pairSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("d1", "d2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def oneShot(payloads: DataFrame): Set[(Long, Long, Int)] = {
    val chunks = Multimodal.ahashChunks(Multimodal.bmpAHash(payloads))
    pairSet(Multimodal.phashPairs(chunks, chunks))
  }

  test("stream equals one-shot after every micro-batch; malformed and replay are no-ops") {
    val st = tmp("phash-stream")
    val all = Multimodal.bmpPayloads(spark, sf).localCheckpoint(true)
    // split group members ACROSS batches (doc_id % 3) so near-dup pairs
    // must be found cross-batch, not just within one
    val batches = (0 until 3).map(k => all.filter(col("doc_id") % 3 === k))
    val garbage = "not an image at all".getBytes("US-ASCII")

    // batch 1 carries a malformed image; batch 2 re-sends the same
    // doc_id (must be a seen no-op, not a re-admit)
    val inputs = batches.zipWithIndex.map { case (b, i) =>
      if (i >= 1) {
        import spark.implicits._
        b.unionByName(Seq((900001L, garbage)).toDF("doc_id", "payload"))
      } else b
    }
    var seen = all.filter(lit(false))
    inputs.zipWithIndex.foreach { case (withBad, i) =>
      PhashStream.processBatch(spark, withBad, st, i.toLong)
      seen = seen.unionByName(batches(i))
      val streamed = pairSet(PhashStream.pairs(spark, st))
      val expected = oneShot(seen)
      assert(streamed == expected,
        s"after batch $i: stream ${streamed.size} pairs vs one-shot ${expected.size}")
    }
    // the split really exercised cross-batch discovery: at least one
    // final pair's members arrived in different batches
    val finalPairs = pairSet(PhashStream.pairs(spark, st))
    assert(finalPairs.nonEmpty)
    assert(finalPairs.exists { case (d1, d2, _) => d1 % 3 != d2 % 3 },
      "no cross-batch pair — the fixture split is degenerate")
    // the malformed doc was admitted (seen-ness) but produced nothing
    assert(spark.read.parquet(s"$st/docs").filter(col("doc_id") === 900001L).count() == 1)
    assert(finalPairs.forall { case (d1, d2, _) => d1 != 900001L && d2 != 900001L })

    // replay idempotence + partial-state convergence: drop two of the
    // three stores' batch-1 partitions and replay batch 1
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$st/chunks/batch=1")).deleteRecursively()
    new Directory(new java.io.File(s"$st/pairs/batch=1")).deleteRecursively()
    PhashStream.processBatch(spark, inputs(1), st, 1L)
    assert(pairSet(PhashStream.pairs(spark, st)) == finalPairs,
      "replay after losing two of three batch partitions must converge")
  }

  test("audio twin: WAV stream equals one-shot through the same machinery; malformed WAV is a seen no-op") {
    val st = tmp("audio-stream")
    val all = Multimodal.wavTonePayloads(spark, sf).localCheckpoint(true)
    def oneShotAudio(payloads: DataFrame): Set[(Long, Long, Int)] = {
      val ch = Multimodal.ahashChunks(Multimodal.wavEnergyHash(payloads))
      pairSet(Multimodal.phashPairs(ch, ch))
    }
    val batches = (0 until 3).map(k => all.filter(col("doc_id") % 3 === k))
    val garbage = "RIFFnot really a wav".getBytes("US-ASCII")
    var seen = all.filter(lit(false))
    batches.zipWithIndex.foreach { case (b, i) =>
      val input = if (i == 1) {
        import spark.implicits._
        b.unionByName(Seq((900002L, garbage)).toDF("doc_id", "payload"))
      } else b
      PhashStream.processAudioBatch(spark, input, st, i.toLong)
      seen = seen.unionByName(b)
      val streamed = pairSet(PhashStream.pairs(spark, st))
      val expected = oneShotAudio(seen)
      assert(streamed == expected,
        s"audio after batch $i: stream ${streamed.size} vs one-shot ${expected.size}")
    }
    val finalPairs = pairSet(PhashStream.pairs(spark, st))
    assert(finalPairs.nonEmpty)
    assert(finalPairs.exists { case (d1, d2, _) => d1 % 3 != d2 % 3 },
      "no cross-batch audio pair — the fixture split is degenerate")
    assert(spark.read.parquet(s"$st/docs").filter(col("doc_id") === 900002L).count() == 1)
    assert(finalPairs.forall { case (d1, d2, _) => d1 != 900002L && d2 != 900002L })
  }

  test("JPEG twin: compressed stream equals one-shot; a truncated JPEG is a seen no-op") {
    val st = tmp("jpeg-stream")
    val all = Multimodal.jpegPhashPayloads(spark, sf).localCheckpoint(true)
    def oneShotJpeg(payloads: DataFrame): Set[(Long, Long, Int)] = {
      val ch = Multimodal.ahashChunks(Multimodal.jpegAHash(payloads))
      pairSet(Multimodal.phashPairs(ch, ch))
    }
    val batches = (0 until 3).map(k => all.filter(col("doc_id") % 3 === k))
    // a REAL jpeg truncated mid-scan: the decoder must refuse it, the
    // stream must admit it as seen and never fingerprint it
    val truncated = {
      import spark.implicits._
      val full = all.limit(1).select("payload").as[Array[Byte]].head()
      full.take(full.length - 8)
    }
    var seen = all.filter(lit(false))
    batches.zipWithIndex.foreach { case (b, i) =>
      val input = if (i == 1) {
        import spark.implicits._
        b.unionByName(Seq((900003L, truncated)).toDF("doc_id", "payload"))
      } else b
      PhashStream.processJpegBatch(spark, input, st, i.toLong)
      seen = seen.unionByName(b)
      val streamed = pairSet(PhashStream.pairs(spark, st))
      val expected = oneShotJpeg(seen)
      assert(streamed == expected,
        s"jpeg after batch $i: stream ${streamed.size} vs one-shot ${expected.size}")
    }
    val finalPairs = pairSet(PhashStream.pairs(spark, st))
    assert(finalPairs.nonEmpty)
    assert(finalPairs.exists { case (d1, d2, _) => d1 % 3 != d2 % 3 },
      "no cross-batch jpeg pair — the fixture split is degenerate")
    // the streamed JPEG pairs also equal the BMP family's one-shot pairs
    // over the same corpus — the shared-oracle property holds ONLINE too
    assert(finalPairs == oneShot(Multimodal.bmpPayloads(spark, sf)),
      "streamed JPEG fingerprints must match the BMP ground truth")
    assert(spark.read.parquet(s"$st/docs").filter(col("doc_id") === 900003L).count() == 1)
    assert(finalPairs.forall { case (d1, d2, _) => d1 != 900003L && d2 != 900003L })
    // replay idempotence with partial state loss (the BMP test's rule)
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$st/chunks/batch=1")).deleteRecursively()
    PhashStream.processJpegBatch(spark, batches(1), st, 1L)
    assert(pairSet(PhashStream.pairs(spark, st)) == finalPairs,
      "replay after losing a batch partition must converge")
  }

  test("color-JPEG twin: 3-component stream equals one-shot; a truncated color JPEG is a seen no-op") {
    val st = tmp("jpegc-stream")
    val all = Multimodal.jpegColorPayloads(spark, sf).localCheckpoint(true)
    def oneShotColor(payloads: DataFrame): Set[(Long, Long, Int)] = {
      val ch = Multimodal.ahashChunks(Multimodal.jpegColorAHash(payloads))
      pairSet(Multimodal.phashPairs(ch, ch))
    }
    val batches = (0 until 3).map(k => all.filter(col("doc_id") % 3 === k))
    // the batch split by doc_id % 3 is ALSO the sampling-mode split, so
    // each micro-batch arrives in a single chroma subsampling — and the
    // truncated payload is a 4:2:0 stream cut inside the entropy scan
    val truncated = {
      import spark.implicits._
      val full = all.filter(col("doc_id") % 3 === 2).limit(1)
        .select("payload").as[Array[Byte]].head()
      full.take(full.length - 8)
    }
    var seen = all.filter(lit(false))
    batches.zipWithIndex.foreach { case (b, i) =>
      val input = if (i == 1) {
        import spark.implicits._
        b.unionByName(Seq((900004L, truncated)).toDF("doc_id", "payload"))
      } else b
      PhashStream.processJpegColorBatch(spark, input, st, i.toLong)
      seen = seen.unionByName(b)
      val streamed = pairSet(PhashStream.pairs(spark, st))
      val expected = oneShotColor(seen)
      assert(streamed == expected,
        s"color jpeg after batch $i: stream ${streamed.size} vs one-shot ${expected.size}")
    }
    val finalPairs = pairSet(PhashStream.pairs(spark, st))
    assert(finalPairs.nonEmpty)
    assert(finalPairs.exists { case (d1, d2, _) => d1 % 3 != d2 % 3 },
      "no cross-sampling-mode pair — the luma planes must band identically " +
        "across 4:4:4/4:2:2/4:2:0")
    // shared-oracle property online: color-JPEG pairs == BMP pairs
    assert(finalPairs == oneShot(Multimodal.bmpPayloads(spark, sf)),
      "streamed color-JPEG fingerprints must match the BMP ground truth")
    assert(spark.read.parquet(s"$st/docs").filter(col("doc_id") === 900004L).count() == 1)
    assert(finalPairs.forall { case (d1, d2, _) => d1 != 900004L && d2 != 900004L })
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$st/chunks/batch=1")).deleteRecursively()
    PhashStream.processJpegColorBatch(spark, batches(1), st, 1L)
    assert(pairSet(PhashStream.pairs(spark, st)) == finalPairs,
      "replay after losing a batch partition must converge")
  }
}
