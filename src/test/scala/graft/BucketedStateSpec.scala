package graft

import graft.operators.Dedup
import graft.streaming.{BucketedState, LshStream, SpanStream}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** The VERDICT r12 ask-#4 contract: a micro-batch's reads of the
  * accumulated streaming state scale with the buckets its keys touch,
  * not with the corpus. Measured, not asserted structurally — the task
  * input-bytes metric counts what the scans actually read, so a
  * regression to full-store scans (or a filter that stops pruning at
  * the listing) fails these tests even if results stay correct. */
class BucketedStateSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Total task input bytes during `f`, drained from the async listener
    * bus by polling until the counter is stable (no fixed sleep). */
  private def bytesReadDuring[T](f: => T): (T, Long) = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          acc.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) {
        Thread.sleep(100); waited += 1
        val now = acc.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      (r, acc.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("readBuckets reads only the requested buckets' bytes") {
    import spark.implicits._
    val root = tmp("bucketed") + "/t"
    (0L to 2L).foreach { b =>
      val df = (0 until 4096)
        .map(i => (b * 10000L + i, i.toLong)).toDF("doc_id", "h")
      BucketedState.overwriteBatchBucketed(df, root, b, "hb", col("h"))
    }
    def empty = Seq.empty[(Long, Long)].toDF("doc_id", "h")
    val (rows, prunedBytes) = bytesReadDuring {
      BucketedState.readBuckets(spark, root, 3L, "hb", Seq(3, 7), empty).collect()
    }
    // 4096 rows over 256 buckets = 16/bucket/batch; 2 buckets x 3 batches
    assert(rows.length == 2 * 3 * 16, s"got ${rows.length} rows")
    assert(rows.forall(r => Seq(3L, 7L).contains(((r.getLong(1) % 256) + 256) % 256)))
    val (allRows, fullBytes) = bytesReadDuring {
      spark.read.parquet(root).collect()
    }
    assert(allRows.length == 3 * 4096)
    assert(prunedBytes > 0 && fullBytes > 0)
    assert(prunedBytes < fullBytes / 20,
      s"2-of-256-bucket read cost $prunedBytes bytes vs full $fullBytes — not pruned at the listing")
  }

  // a seeded corpus whose window/shingle hashes spread over ~all 256
  // buckets, plus one short doc whose duplicate will arrive later
  private def seedDocs(n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      val len = if (i == 0) 20 else 40
      (i.toLong, Seq.fill(len)("w" + rnd.nextInt(5000)).mkString(" "))
    }
  }

  test("SpanStream micro-batch input bytes scale with touched buckets, not the store") {
    import spark.implicits._
    val st = tmp("spanbuck")
    val seed = seedDocs(400)
    SpanStream.processBatch(spark, seed.toDF("doc_id", "text"), st, 0L)
    // full accumulated wins store, one scan each layout — the corpus bar
    val (_, fullBytes) = bytesReadDuring {
      spark.read.parquet(s"$st/wins_hb").collect()
      spark.read.parquet(s"$st/wins_db").collect()
      spark.read.parquet(s"$st/docs").collect()
    }
    // batch 1: ONE doc duplicating the short seed doc — touches ~11
    // window-hash buckets of 256
    val dup = Seq(10000L -> seed.head._2).toDF("doc_id", "text")
    val (_, batchBytes) = bytesReadDuring {
      SpanStream.processBatch(spark, dup, st, 1L)
    }
    assert(batchBytes > 0 && fullBytes > 0)
    assert(batchBytes < fullBytes / 2,
      s"batch read $batchBytes bytes vs one full-store scan $fullBytes — " +
        "per-batch I/O is corpus-sized again")
    // and the result is still right: the dup pair's spans exist for both
    val spans = SpanStream.spans(spark, st)
      .filter(col("doc_id").isin(0L, 10000L)).collect()
    assert(spans.nonEmpty, "duplicate doc produced no spans")
  }

  test("LshStream micro-batch input bytes scale with touched buckets, not the store") {
    import spark.implicits._
    val st = tmp("lshbuck")
    val seed = seedDocs(400)
    LshStream.processBatch(spark, seed.toDF("doc_id", "text"), st, 0L)
    val (_, fullBytes) = bytesReadDuring {
      spark.read.parquet(s"$st/corpus").collect()
      spark.read.parquet(s"$st/bands").collect()
      spark.read.parquet(s"$st/sigs").collect()
    }
    val dup = Seq(10000L -> seed.head._2).toDF("doc_id", "text")
    val (_, batchBytes) = bytesReadDuring {
      LshStream.processBatch(spark, dup, st, 1L)
    }
    assert(batchBytes > 0 && fullBytes > 0)
    assert(batchBytes < fullBytes / 2,
      s"batch read $batchBytes bytes vs one full-store scan $fullBytes — " +
        "per-batch I/O is corpus-sized again")
    // the cross-batch near-dup pair was still found
    val pairs = LshStream.pairs(spark, st)
      .filter(col("d1") === 0L && col("d2") === 10000L).count()
    assert(pairs == 1L, "cross-batch duplicate pair not detected under pruned reads")
  }
}
