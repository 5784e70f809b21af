package graft

import graft.sources.{CommitLog, FencedStore}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The object-store commit protocol ([[graft.sources.FencedStore]]:
  * blind-PUT data plane + claim-if-absent arbiter + read repair) carries
  * the SAME multi-writer guarantees the POSIX store proves — the racing
  * suites re-run through it — plus the one guarantee POSIX never needed:
  * a writer crashing between its claim and its publish loses nothing,
  * because any later reader/lister/loser completes the commit from the
  * staged payload. */
class FencedStoreSpec extends SparkSpec {
  import spark.implicits._

  private val store = new FencedStore()

  private def freshTable(): String =
    Files.createTempDirectory("fenced").toString

  test("putIfAbsent contract: exactly one concurrent claimant wins per version") {
    val t = freshTable()
    Files.createDirectories(Paths.get(t))
    val target = Paths.get(t, "v000000000000.json")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        gate.await()
        if (new FencedStore().putIfAbsent(target, s"writer$i")) wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(wins.get() === 1, s"exactly one writer may own a version, got ${wins.get()}")
    // and the published content is the winner's, whole, for every reader
    val content = store.read(target)
    assert(content.matches("writer\\d"), s"partial or corrupt publish: $content")
  }

  test("8 racing appenders through the object-store protocol: dense log, no loss") {
    val t = freshTable()
    val writers = 8
    val perWriter = 3
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          gate.await()
          (0 until perWriter).foreach { i =>
            val df = Seq((w.toLong, i.toLong)).toDF("writer", "seq")
            CommitLog.append(spark, t, df, store = new FencedStore())
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
    val rows = CommitLog.read(spark, t, store = store)
      .groupBy("writer", "seq").count().as[(Long, Long, Long)].collect()
    assert(rows.length === writers * perWriter)
    assert(rows.forall(_._3 === 1L), "a commit was applied twice")
    assert(CommitLog.latestVersion(t, store) === writers * perWriter - 1L)
  }

  test("appendOnce: a retry racing the original is exactly-once through the store") {
    val t = freshTable()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val landed = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val racers = (1 to 2).map { _ =>
      new Thread(() => {
        try {
          gate.await()
          if (CommitLog.appendOnce(spark, t, Seq(7L).toDF("id"), "app", 0L,
            store = new FencedStore()) >= 0L) landed.incrementAndGet()
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    racers.foreach(_.start()); gate.countDown(); racers.foreach(_.join())
    assert(errs.isEmpty, s"racer failed: ${Option(errs.peek()).map(_.toString)}")
    assert(landed.get() === 1, "exactly one racing duplicate may commit")
    assert(CommitLog.read(spark, t, store = store).as[Long].collect().toSeq === Seq(7L))
  }

  test("racing rewrites: the typed conflict survives the store swap") {
    val t = freshTable()
    CommitLog.append(spark, t,
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "s"), store = store)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 2).map { n =>
      new Thread(() => {
        try { gate.await()
          CommitLog.compact(spark, t, targetFiles = n, store = new FencedStore()); ()
        } catch {
          case _: CommitLog.ConcurrentRewriteException =>
            conflicts.incrementAndGet(); ()
          case e: Throwable => errs.add(e)
        }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(errs.isEmpty, s"unexpected failure: ${Option(errs.peek())}")
    // both may serialize cleanly (the second re-read after the first
    // committed — then rewriting the rewrite is legal); a true same-
    // snapshot race must conflict on exactly one side, never both
    assert(conflicts.get() <= 1,
      s"racing compactions must never both conflict, got ${conflicts.get()}")
    assert(CommitLog.read(spark, t, store = store).count() === 100L)
  }

  test("crash between claim and publish: a fresh store repairs and the log continues") {
    val t = freshTable()
    val df = (1 to 50).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    CommitLog.append(spark, t, df, store = store) // v0, healthy
    // v1 claimed but never published — the crash window opened on purpose
    val crashed = new FencedStore(crashBeforePublish = true)
    val v1 = CommitLog.append(spark, t,
      Seq((1000L, "late")).toDF("id", "s"), store = crashed)
    assert(v1 === 1L)
    assert(!Files.exists(Paths.get(t, "_log", f"v${1L}%012d.json")),
      "fixture must leave the commit unpublished (claim only)")
    // a FRESH store (another node) sees the tip, reads the commit, and
    // the next writer lands AFTER it — nothing lost, nothing overwritten
    val fresh = new FencedStore()
    assert(CommitLog.latestVersion(t, fresh) === 1L,
      "read repair must surface the claimed-but-unpublished tip")
    assert(CommitLog.read(spark, t, store = fresh).count() === 51L)
    val v2 = CommitLog.append(spark, t,
      Seq((2000L, "later")).toDF("id", "s"), store = fresh)
    assert(v2 === 2L)
    assert(CommitLog.read(spark, t, store = fresh)
      .agg(count(lit(1))).as[Long].head() === 52L)
  }

  test("repair is idempotent under racing repairers") {
    val t = freshTable()
    Files.createDirectories(Paths.get(t))
    val target = Paths.get(t, "v000000000005.json")
    new FencedStore(crashBeforePublish = true).putIfAbsent(target, "payload")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        try { gate.await(); assert(new FencedStore().read(target) === "payload") }
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing repair failed: ${Option(errs.peek())}")
    assert(store.read(target) === "payload")
  }

  test("claim GC drops published claims only; the protocol survives it") {
    val t = freshTable()
    CommitLog.append(spark, t, Seq((1L, "a")).toDF("k", "s"), store = store)
    CommitLog.append(spark, t, Seq((2L, "b")).toDF("k", "s"), store = store)
    // open a crash window at v2: claim exists, object does not
    CommitLog.append(spark, t, Seq((3L, "c")).toDF("k", "s"),
      store = new FencedStore(crashBeforePublish = true))
    val logDir = Paths.get(t, "_log")
    val gone = store.gcClaims(logDir)
    assert(gone.sorted === Seq("v000000000000.json.claim", "v000000000001.json.claim"),
      s"only the two PUBLISHED claims may be collected, got $gone")
    // the crashed v2 is still repairable after GC, and the log continues
    val fresh = new FencedStore()
    assert(CommitLog.latestVersion(t, fresh) === 2L)
    assert(CommitLog.read(spark, t, store = fresh).count() === 3L)
    // a GC'd version still refuses a second writer (object-existence fast path)
    assert(!fresh.putIfAbsent(logDir.resolve("v000000000000.json"), "usurper"))
    assert(CommitLog.append(spark, t, Seq((4L, "d")).toDF("k", "s"),
      store = fresh) === 3L)
  }

  test("checkpoints, time travel and the DV mask work unchanged through the store") {
    val t = freshTable()
    CommitLog.appendIndexed(spark, t,
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")), "k", store = store)
    CommitLog.deleteWhereDv(spark, t, col("k").between(10, 19), store = store)
    CommitLog.checkpoint(t, store)
    assert(CommitLog.read(spark, t, store = store).count() === 90L)
    assert(CommitLog.read(spark, t, asOf = Some(0L), store = store).count() === 100L)
    assert(CommitLog.readWhere(spark, t, "k", 0d, 30d, store = store)
      .select("k").as[Long].collect().sorted.toSeq === (0L to 9L) ++ (20L to 30L))
  }
}
