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

  /** Total parquet FILES scanned during `f` — the DETERMINISTIC pruning
    * measure (advice r13): input-bytes ratios include footer/metadata
    * reads that vary with Spark version, codec, and file sizing, but the
    * file count a scan selects after partition pruning is a pure function
    * of the store layout and the pushed filters. Summed from every
    * FileSourceScanExec's numFiles metric across the executions `f`
    * triggers (AQE stages and Spark 4's WriteFilesExec subtrees
    * included), drained from the async listener by polling-to-stable. */
  private def filesScannedDuring[T](f: => T): (T, Long) = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case s: FileSourceScanExec    =>
          s.metrics.get("numFiles").foreach(m => acc.addAndGet(m.value))
        case other                    => other.children.foreach(walk)
      }
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        walk(qe.executedPlan)
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
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
    } finally spark.listenerManager.unregister(listener)
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
    val ((rows, prunedBytes), prunedFiles) = filesScannedDuring {
      bytesReadDuring {
        BucketedState.readBuckets(spark, root, 3L, "hb", Seq(3, 7), empty).collect()
      }
    }
    // 4096 rows over 256 buckets = 16/bucket/batch; 2 buckets x 3 batches
    assert(rows.length == 2 * 3 * 16, s"got ${rows.length} rows")
    assert(rows.forall(r => Seq(3L, 7L).contains(((r.getLong(1) % 256) + 256) % 256)))
    val ((allRows, fullBytes), fullFiles) = filesScannedDuring {
      bytesReadDuring {
        spark.read.parquet(root).collect()
      }
    }
    assert(allRows.length == 3 * 4096)
    // DETERMINISTIC pruning proof (advice r13): the pruned scan selects
    // EXACTLY the on-disk part-files under the two requested buckets'
    // directories — a pure function of layout + pushed filters, immune
    // to the footer/metadata byte noise the ratio bounds below absorb.
    def partFiles(pred: java.nio.file.Path => Boolean): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try s.filter(p => p.toString.endsWith(".parquet") && pred(p)).count()
      finally s.close()
    }
    val onDiskPruned = partFiles(p =>
      p.toString.contains("hb=3/") || p.toString.contains("hb=7/"))
    val onDiskAll = partFiles(_ => true)
    assert(prunedFiles == onDiskPruned,
      s"pruned scan touched $prunedFiles files, expected the $onDiskPruned under hb=3/hb=7")
    assert(fullFiles == onDiskAll && onDiskPruned < onDiskAll)
    // byte ratio stays as a LOOSE sanity bound only
    assert(prunedBytes > 0 && fullBytes > 0)
    assert(prunedBytes < fullBytes / 2,
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
    val (_, fullFiles) = filesScannedDuring {
      spark.read.parquet(s"$st/wins_hb").collect()
      spark.read.parquet(s"$st/wins_db").collect()
      spark.read.parquet(s"$st/docs").collect()
    }
    // batch 1: ONE doc duplicating the short seed doc — touches ~11
    // window-hash buckets of 256
    val dup = Seq(10000L -> seed.head._2).toDF("doc_id", "text")
    val ((_, batchBytes), batchFiles) = filesScannedDuring {
      bytesReadDuring {
        SpanStream.processBatch(spark, dup, st, 1L)
      }
    }
    // deterministic measure (advice r13): files selected after pruning
    assert(batchFiles > 0 && fullFiles > 0)
    assert(batchFiles < fullFiles / 2,
      s"batch scanned $batchFiles files vs full-store $fullFiles — " +
        "reads no longer prune at the file listing")
    // byte ratio kept only as a loose sanity bound (footer/metadata noise)
    assert(batchBytes > 0 && batchBytes < fullBytes,
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
    val (_, fullFiles) = filesScannedDuring {
      spark.read.parquet(s"$st/corpus").collect()
      spark.read.parquet(s"$st/bands").collect()
      spark.read.parquet(s"$st/sigs").collect()
    }
    val dup = Seq(10000L -> seed.head._2).toDF("doc_id", "text")
    val ((_, batchBytes), batchFiles) = filesScannedDuring {
      bytesReadDuring {
        LshStream.processBatch(spark, dup, st, 1L)
      }
    }
    assert(batchFiles > 0 && fullFiles > 0)
    assert(batchFiles < fullFiles / 2,
      s"batch scanned $batchFiles files vs full-store $fullFiles — " +
        "reads no longer prune at the file listing")
    assert(batchBytes > 0 && batchBytes < fullBytes,
      s"batch read $batchBytes bytes vs one full-store scan $fullBytes — " +
        "per-batch I/O is corpus-sized again")
    // the cross-batch near-dup pair was still found
    val pairs = LshStream.pairs(spark, st)
      .filter(col("d1") === 0L && col("d2") === 10000L).count()
    assert(pairs == 1L, "cross-batch duplicate pair not detected under pruned reads")
  }
}
