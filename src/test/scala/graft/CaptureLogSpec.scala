package graft

import graft.operators.Komodo
import graft.sources.{CommitLog, Ingest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** ONE table layer, not two (VERDICT r15 item 2): the reference-parity
  * capture lifecycle re-based onto the commit log. `streamCapturesLog`
  * lands micro-batches through the `graft-commitlog` sink, so the
  * capture fact table gets the ACID contract — txn-marker exactly-once,
  * OCC maintenance CONCURRENT with the live appender (no maintenance
  * window), per-file session bounds for listing-time pruning — while
  * the reference analytics read it UNCHANGED through [[CommitLog.read]].
  */
class CaptureLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def captureJson(session: Int, seq: Int): String = {
    val ts = 1630443513898L + seq
    s"""{"capture_id":"${session}_$ts","session_id":$session,"client_id":${seq % 5},""" +
      s""""type":"sync","ts":$ts,"seq":$seq,""" +
      s""""message":{"clientId":${seq % 5},"entityType":${seq % 4},"interactionType":1,""" +
      s""""pos":{"x":$seq.0,"y":2.0,"z":3.0},"strokeType":null,"strokeId":null}}"""
  }

  test("commit-log capture ingest: lands once, restart does not reprocess, sessions prune (T2 twin)") {
    val in = tmp("clog_in"); val table = tmp("clog_tbl"); val ck = tmp("clog_ck")
    Files.writeString(Paths.get(s"$in/c1.json"),
      (1 to 20).map(captureJson(126, _)).mkString("\n"))

    val q1 = Ingest.streamCapturesLog(spark, in, table, ck, trigger = Trigger.AvailableNow())
    q1.awaitTermination()
    assert(CommitLog.read(spark, table).count() === 20)

    // restart over the same checkpoint: nothing new -> still exactly 20,
    // and no new commit version (txn marker + engine checkpoint agree)
    val tip = CommitLog.latestVersion(table)
    val q2 = Ingest.streamCapturesLog(spark, in, table, ck, trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    assert(CommitLog.read(spark, table).count() === 20)
    assert(CommitLog.latestVersion(table) === tip, "a restart must not re-commit")

    // a second session lands; per-file session_id bounds prune reads
    Files.writeString(Paths.get(s"$in/c2.json"),
      (1 to 10).map(captureJson(300, _)).mkString("\n"))
    val q3 = Ingest.streamCapturesLog(spark, in, table, ck, trigger = Trigger.AvailableNow())
    q3.awaitTermination()
    assert(CommitLog.read(spark, table).count() === 30)
    assert(CommitLog.readWhere(spark, table, "session_id", 300d, 300d)
      .count() === 10, "session-scoped read through the recorded bounds")
    assert(CommitLog.prunedFiles(table, 300d, 300d).size <
      CommitLog.snapshot(table).files.size,
      "a session predicate must prune files at listing time")
    // the typed struct round-trips through the log's schema authority
    assert(CommitLog.read(spark, table)
      .where(col("session_id") === 126 && col("seq") === 1)
      .selectExpr("message.pos.x").as[Double].head() === 1.0)
  }

  test("OCC maintenance runs against the LIVE capture stream: compact mid-stream, no loss, no window") {
    val in = tmp("clogm_in"); val table = tmp("clogm_tbl"); val ck = tmp("clogm_ck")
    def writeBatch(b: Int): Unit =
      Files.writeString(Paths.get(s"$in/b$b.json"),
        (0 until 500).map(i => captureJson(b, b * 1000 + i)).mkString("\n"))

    val q = spark.readStream
      .schema(Ingest.captureSchema)
      .option("maxFilesPerTrigger", "1") // one micro-batch per file: real fragmentation
      .json(in)
      .writeStream
      .format("graft-commitlog")
      .option("table", table).option("appId", "captures")
      .option("indexCol", "session_id")
      .option("checkpointLocation", ck)
      .start()
    try {
      (0 until 3).foreach(writeBatch)
      q.processAllAvailable()
      val filesBefore = CommitLog.snapshot(table).files.size
      assert(CommitLog.read(spark, table).count() === 1500L)
      assert(filesBefore >= 3, s"expected fragment files, got $filesBefore")

      // compaction with the stream STILL RUNNING — under OCC a racing
      // append commutes with the rewrite, so no maintenance window, no
      // single-writer contract; this is the line docs/SCALE.md §Writers
      // used to draw between the capture table and the ACID layer
      CommitLog.compact(spark, table, targetFiles = 1)
      assert(CommitLog.read(spark, table).count() === 1500L, "compaction lost rows")

      writeBatch(3); writeBatch(4)
      q.processAllAvailable()
      assert(CommitLog.read(spark, table).count() === 2500L, "stream disrupted by compaction")
      assert(CommitLog.read(spark, table)
        .select("session_id", "seq").distinct().count() === 2500L,
        "duplicate rows after post-compaction append")
    } finally q.stop()
    // vacuum with retention behaves like any commit-log table
    CommitLog.vacuum(table, retainVersions = 0, minAgeMs = 0L)
    assert(CommitLog.read(spark, table).count() === 2500L)
  }

  test("two capture pipelines into one table need distinct appIds; both land fully") {
    val inA = tmp("clog2_a"); val inB = tmp("clog2_b")
    val table = tmp("clog2_tbl")
    val ckA = tmp("clog2_cka"); val ckB = tmp("clog2_ckb")
    Files.writeString(Paths.get(s"$inA/a.json"),
      (1 to 8).map(captureJson(1, _)).mkString("\n"))
    Files.writeString(Paths.get(s"$inB/b.json"),
      (1 to 6).map(captureJson(2, _)).mkString("\n"))
    // engine batch ids restart at 0 per checkpoint: with a SHARED appId
    // pipeline B's batch 0 would collide with A's high-water and be
    // silently skipped — distinct appIds give each its own txn ledger row
    val qa = Ingest.streamCapturesLog(spark, inA, table, ckA,
      appId = "captures-a", trigger = Trigger.AvailableNow())
    qa.awaitTermination()
    val qb = Ingest.streamCapturesLog(spark, inB, table, ckB,
      appId = "captures-b", trigger = Trigger.AvailableNow())
    qb.awaitTermination()
    assert(CommitLog.read(spark, table).count() === 14,
      "both pipelines' rows must land — no txn-marker collision")
    assert(CommitLog.txnHighWater(table, "captures-a") === 0L)
    assert(CommitLog.txnHighWater(table, "captures-b") === 0L)
  }

  test("all five reference analytics read the commit-log fact table unchanged") {
    val table = tmp("clog_events")
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts_ms", "k", "x", "y", "z", "props", "value")
    CommitLog.appendIndexed(spark, table,
      ev.repartitionByRange(4, col("user_id")), "user_id")
    val logged = CommitLog.read(spark, table)

    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    assert(rows(Komodo.aggInteractionFrom(logged)) ===
      rows(Komodo.aggInteraction(spark, sf)), "agg_interaction")
    assert(rows(Komodo.aggUserFrom(logged)) ===
      rows(Komodo.aggUser(spark, sf)), "agg_user")
    assert(rows(Komodo.userEnergyFrom(logged)) ===
      rows(Komodo.userEnergy(spark, sf)), "user_energy")
    assert(rows(Komodo.drawingPatternFrom(logged)) ===
      rows(Komodo.drawingPattern(spark, sf)), "drawing_pattern")
    assert(rows(Komodo.userProximityFrom(logged)) ===
      rows(Komodo.userProximity(spark, sf)), "user_proximity")
  }
}
