package graft

import graft.operators.{EventAnalytics, Similarity}
import graft.functions.TextAnalytics
import org.apache.spark.sql.functions._

/** Sixth coverage wave: behavioral event analytics (funnel / retention /
  * transitions) and corpus-quality scoring (unigram LM, token entropy).
  * Fixture cases pin cross-operator identities on sf0.001; the synthetic
  * case pins the funnel's STRICT ordering semantics, which no fixture
  * aggregate can distinguish from the unordered variant. */
class CoverageWave6Spec extends SparkSpec {
  import spark.implicits._

  test("events_funnel: strict ordering — a click before the first view does not convert") {
    // A: full ordered journey; B: click precedes its only view (stage 2
    // must NOT count it); C: purchase only (no stage at all).
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 10L), (2L, "view", 20L),
      (3L, "purchase", 10L)
    ).toDF("user_id", "event_type", "ts_ms")
    val rows = EventAnalytics.eventsFunnelFrom(ev)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1, "view", 2L), (2, "click", 1L), (3, "purchase", 1L)))
    val conv = EventAnalytics.eventsFunnelFrom(ev)
      .collect().map(r => if (r.isNullAt(3)) Double.NaN else r.getDouble(3))
    assert(conv(0).isNaN && conv(1) == 0.5 && conv(2) == 1.0)
  }

  test("events_funnel: fixture counts are monotonically non-increasing") {
    val rows = EventAnalytics.eventsFunnel(spark, sf).collect()
    assert(rows.length == 3)
    val ns = rows.map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2) && ns(2) >= 0)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val c = r.getDouble(3); assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("retention_cohort: offset-0 is complete and cells never exceed the cohort") {
    val df = EventAnalytics.retentionCohort(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every user is active in their own first week, so offset 0 is 100%
    val zero = rows.filter(_.getLong(1) == 0L)
    val cohorts = rows.map(_.getLong(0)).distinct
    assert(zero.length == cohorts.length)
    zero.foreach(r => assert(r.getLong(2) == r.getLong(3) && r.getDouble(4) == 1.0))
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3) && r.getLong(1) >= 0))
    // offset-0 actives sum to the distinct-user population
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(zero.map(_.getLong(2)).sum == users)
  }

  test("event_transitions: per-source probabilities sum to 1; pair count = N - U") {
    val rows = EventAnalytics.eventTransitions(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
    // each user with k events contributes exactly k-1 transitions
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val u = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == n - u)
  }

  test("funnelStateful: keyed-state tracker reproduces the batch funnel counts") {
    val typed = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
      .as[EventAnalytics.FunnelEv]
    val states = EventAnalytics.funnelStateful(typed).collect()
    val streamed = (1 to 3).map(k => states.count(_.stage >= k).toLong)
    val batch = EventAnalytics.eventsFunnel(spark, sf).collect().map(_.getLong(2)).toSeq
    assert(streamed == batch)
    // stage times are strictly increasing wherever present
    states.foreach { s =>
      val ts = Seq(s.s1, s.s2, s.s3).flatten
      assert(ts == ts.sorted && ts.distinct == ts, s"user ${s.user_id}: $ts")
    }
  }

  test("funnelStateful: state advances across micro-batches, never retroactively") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.EventAnalytics.{FunnelEv, FunnelProgress}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEv]
    val q = EventAnalytics.funnelStateful(input.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    try {
      // batch 1: user 1 views; user 2 clicks with no prior view
      input.addData(FunnelEv(1, "view", 10), FunnelEv(2, "click", 10))
      q.processAllAvailable()
      // batch 2: user 1 clicks (converts, stage 2); user 2's LATE view
      // arrives — it opens stage 1 but cannot resurrect the batch-1 click
      input.addData(FunnelEv(1, "click", 20), FunnelEv(2, "view", 5))
      q.processAllAvailable()
      val last = spark.table("funnel").as[FunnelProgress].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.stage) }
      assert(last(1L).stage == 2 && last(1L).s2.contains(20L))
      assert(last(2L).stage == 1 && last(2L).s2.isEmpty)
    } finally q.stop()
  }

  test("funnelStatefulLate: late events are dropped AND counted; ties are on time") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.EventAnalytics.{FunnelEv, FunnelProgressLate}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEv]
    val q = EventAnalytics.funnelStatefulLate(input.toDS())
      .writeStream.format("memory").queryName("funnel_late").outputMode("update").start()
    try {
      // batch 1: u1's click arrives first (discarded, but ON TIME -> it
      // advances maxSeen); u2 and u3 open their funnels; u2 also converts
      input.addData(FunnelEv(1, "click", 20),
        FunnelEv(2, "view", 10), FunnelEv(3, "view", 10))
      q.processAllAvailable()
      // batch 2: u1's view@5 is LATE (outrun by the click@20) -> dropped
      // and counted, NOT salvaged into the empty s1 slot (contrast with
      // funnelStateful's behavior, pinned above); u2 progresses in order;
      // u3's click TIES its view's ts -> on time (late 0), but the
      // strictly-after rule still refuses the conversion
      input.addData(FunnelEv(1, "view", 5),
        FunnelEv(2, "click", 20), FunnelEv(3, "click", 10))
      q.processAllAvailable()
      val last = spark.table("funnel_late").as[FunnelProgressLate].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(r => (r.stage, r.late_events)) }
      assert(last(1L).stage == 0 && last(1L).s1.isEmpty && last(1L).late_events == 1L)
      assert(last(2L).stage == 2 && last(2L).s2.contains(20L) && last(2L).late_events == 0L)
      assert(last(3L).stage == 1 && last(3L).s2.isEmpty && last(3L).late_events == 0L)
    } finally q.stop()
  }

  test("session_funnel: session scoping only tightens the funnel; stage counts decrease") {
    val bySession = EventAnalytics.sessionFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val byUser = EventAnalytics.eventsFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    // stage 1: sessions >= users (a user can open in several sessions);
    // deeper stages demand the whole ordered journey INSIDE one session,
    // while the user funnel may chain across sessions — still, a session
    // conversion implies a user conversion, so session counts can exceed
    // user counts only at stage 1
    assert(bySession(1) >= byUser(1))
    assert(bySession.values.forall(_ >= 0) && bySession(3) <= bySession(2) &&
      bySession(2) <= bySession(1), s"monotone stages: $bySession")
  }

  test("funnelStatefulExpiring: completion and idle expiry both evict state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.EventAnalytics.{FunnelEv, FunnelDone}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEv]
    val q = EventAnalytics.funnelStatefulExpiring(input.toDS(), idleMs = 1500L)
      .writeStream.format("memory").queryName("funnel_exp").outputMode("append").start()
    def rows() = spark.table("funnel_exp").as[FunnelDone].collect()
    try {
      // batch 1: u1 and u2 both open funnels
      input.addData(FunnelEv(1, "view", 1000), FunnelEv(2, "view", 1000))
      q.processAllAvailable()
      assert(rows().isEmpty, "in-flight funnels stay silent")
      // batch 2: u1 converts (emit + evict); watermark advances to 3000,
      // putting u2's timeout (1000 + 1500) in the past
      input.addData(FunnelEv(1, "click", 2000), FunnelEv(1, "purchase", 3000))
      q.processAllAvailable()
      // batch 3: any event lets the expired timeout fire
      input.addData(FunnelEv(3, "view", 10000))
      q.processAllAvailable()
      val byUser = rows().groupBy(_.user_id)
      assert(byUser(1L).map(_.outcome).toSeq == Seq("converted"))
      assert(byUser(2L).map(r => (r.outcome, r.stage)).toSeq == Seq(("expired", 1)))
      // batch 4: u1 re-enters AFTER eviction — a fresh funnel converts
      // again, proving completion really removed the state
      input.addData(FunnelEv(1, "view", 11000), FunnelEv(1, "click", 12000),
        FunnelEv(1, "purchase", 13000))
      q.processAllAvailable()
      val u1 = rows().filter(_.user_id == 1L)
      assert(u1.map(_.outcome).toSeq == Seq("converted", "converted"))
      assert(u1.map(_.s1).toSet == Set(Some(1000L), Some(11000L)))
      // batch 5: TWO complete journeys plus a trailing view in ONE batch —
      // completion is per event, so both emit and the trailing view opens
      // funnel #3 (output must not depend on micro-batch boundaries)
      input.addData( // all past the current watermark (13000), else dropped
        FunnelEv(4, "view", 20100), FunnelEv(4, "click", 20200), FunnelEv(4, "purchase", 20300),
        FunnelEv(4, "view", 20400), FunnelEv(4, "click", 20500), FunnelEv(4, "purchase", 20600),
        FunnelEv(4, "view", 20700))
      q.processAllAvailable()
      val u4 = rows().filter(_.user_id == 4L)
      assert(u4.map(_.outcome).toSeq == Seq("converted", "converted"))
      assert(u4.map(_.s1).toSet == Set(Some(20100L), Some(20400L)))
      // the trailing view's in-flight funnel then expires once the
      // watermark passes (any later event advances it)
      input.addData(FunnelEv(5, "view", 60000))
      q.processAllAvailable()
      val u4b = rows().filter(r => r.user_id == 4L && r.outcome == "expired")
      assert(u4b.map(r => (r.stage, r.s1)).toSeq == Seq((1, Some(20700L))))
    } finally q.stop()
  }

  test("funnelStatefulLate: equals funnelStateful on in-order data with zero late") {
    val typed = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
      .as[EventAnalytics.FunnelEv]
    val strict = EventAnalytics.funnelStatefulLate(typed).collect()
    assert(strict.forall(_.late_events == 0L), "single-batch groups cannot be late")
    val loose = EventAnalytics.funnelStateful(typed).collect()
      .map(s => s.user_id -> (s.stage, s.s1, s.s2, s.s3)).toMap
    strict.foreach { s =>
      assert(loose(s.user_id) == ((s.stage, s.s1, s.s2, s.s3)), s"user ${s.user_id}")
    }
  }

  test("txt_lm_score: negative scores, token totals agree with tokenCount") {
    val lm = TextAnalytics.lmScore(spark, sf)
    val rows = lm.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) < 0.0))
    val mismatch = lm.select(col("doc_id"), col("n_tokens"))
      .join(TextAnalytics.tokenCount(spark, sf)
        .select(col("doc_id"), col("n_tokens").cast("long").as("tc")), "doc_id")
      .filter(col("n_tokens") =!= col("tc")).count()
    assert(mismatch == 0)
  }

  test("user_paths: depth-capped paths, counts bounded by the user population") {
    val rows = EventAnalytics.userPaths(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach(r =>
      assert(r.getString(0).split(" > ").length <= 5, r.getString(0)))
    val ns = rows.map(_.getLong(1))
    assert(ns.toSeq == ns.sortBy(-_).toSeq)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(ns.sum <= users)
  }

  test("scd2_status: per-user chained intervals, one open row, no no-op versions") {
    val byUser = EventAnalytics.scd2Status(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getInt(1)) // version: the total order
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      assert(sorted.count(_.getBoolean(5)) == 1, s"user $u: open rows != 1")
      assert(sorted.last.isNullAt(4) && sorted.init.forall(!_.isNullAt(4)))
      sorted.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a.getLong(4) == b.getLong(3), s"user $u: interval gap")
        assert(a.getString(2) != b.getString(2), s"user $u: no-op version survived")
      }
    }
  }

  test("ann_srp_lsh: candidates only from Hamming<=1 probe buckets, contiguous ranks") {
    val bmap = Tables.embeddings(spark, sf)
      .withColumn("bucket", Similarity.srpBucket())
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val res = Similarity.annSrp(spark, sf).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length),
        s"query $q: ranks not contiguous")
      rs.foreach { r =>
        val ham = Integer.bitCount(bmap(q) ^ bmap(r.getLong(1)))
        assert(ham <= 1, s"query $q candidate ${r.getLong(1)}: Hamming $ham")
      }
    }
  }

  test("sample_weighted: k per source, long documents oversampled") {
    import graft.functions.Sampling
    val rows = Sampling.sampleWeighted(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (s, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length), s)
      assert(rs.length <= 5)
    }
    // token-weighted draw ⇒ the sample skews long (deterministic here:
    // the jitter is a pure function of doc_id)
    val sampledMean = rows.map(_.getLong(3)).sum.toDouble / rows.length
    val corpusMean = Tables.documents(spark, sf)
      .select(avg(size(split(col("text"), " ")))).head().getDouble(0)
    assert(sampledMean > corpusMean,
      s"sampled mean $sampledMean not above corpus mean $corpusMean")
  }

  test("txt_entropy: bounded by log2(n_distinct), zero only for one-token docs") {
    val rows = TextAnalytics.tokenEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, h) = (r.getLong(2), r.getDouble(3))
      // per-term quantization error is <= 5e-7 per distinct token
      assert(h >= -1e-12, s"doc ${r.getLong(0)}: negative entropy $h")
      assert(h <= math.log(nd.toDouble) / math.log(2.0) + nd * 5e-7,
        s"doc ${r.getLong(0)}: entropy $h above log2($nd)")
      if (nd == 1) assert(math.abs(h) < 1e-12)
    }
  }

  test("statsAgg degenerate groups: NULL like var_samp/corr, never an ANSI cast throw") {
    import spark.implicits._
    // n=1 group (A): n*(n-1)=0 → Infinity pre-guard, which CAST(... AS
    // DECIMAL) would THROW on under ANSI; constant-x group (B): corr is
    // 0/0. Both must degrade to NULL exactly as var_samp/corr do.
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-degen").toString
    Seq(
      ("A", 5.0, 100.0),
      ("B", 7.0, 10.0), ("B", 7.0, 20.0),
      ("C", 1.0, 10.0), ("C", 3.0, 30.0)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = graft.operators.Extras.statsAgg(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    def d(g: String, c: String) = Option(rows(g).getAs[Any](c))
    assert(d("A", "var_qty").isEmpty && d("A", "stddev_qty").isEmpty &&
      d("A", "corr_qty_price").isEmpty, "n=1 group must be all-NULL")
    assert(d("B", "var_qty").contains(0.0), "constant group has zero variance")
    assert(d("B", "corr_qty_price").isEmpty, "zero-variance corr must be NULL")
    assert(d("C", "var_qty").exists(_.asInstanceOf[Double] > 0) &&
      d("C", "corr_qty_price").exists(v => math.abs(v.asInstanceOf[Double] - 1.0) < 1e-9),
      "well-posed group keeps exact values (perfectly correlated fixture)")
  }
}
