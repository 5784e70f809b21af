package graft

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomFunctions

/** The bloom front on incremental dedup (SURVEY §4.3): the corpus side of
  * the anti-join is pre-filtered by a bloom built from the batch's hashes,
  * so at 100 TB only probable collisions shuffle. These tests pin the three
  * claims that make that safe and real: identical results with the front
  * on/off (no false negatives), the probe filter sits BELOW the exchange
  * on the scan side of the plan, and the filter is actually selective with
  * a bounded false-positive rate at its design load. */
class BloomFrontSpec extends SparkSpec {
  import graft.operators.Dedup

  test("bloom-fronted incremental dedup equals the unfronted anti-join") {
    val on = Dedup.incrementalDedup(spark, sf, bloomFront = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val off = Dedup.incrementalDedup(spark, sf, bloomFront = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(on.nonEmpty, "fixture must produce survivors")
    assert(on === off)
  }

  test("might_contain probe sits below the anti-join exchange, on the scan side") {
    // AQE off for a stable pre-stage physical tree to walk; broadcast off
    // so the fixture-sized anti-join takes the shuffle form it would have
    // at corpus scale (broadcast has no exchange to be below)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // cached fragments from earlier suites substitute InMemoryTableScan
      // into the tree and hide the filter text — drop them so the walk sees
      // the real scan-side plan regardless of suite order
      spark.catalog.clearCache()
      // executedPlan, not sparkPlan: exchanges only exist after
      // EnsureRequirements runs in the prepare phase
      val plan = Dedup.incrementalDedup(spark, sf).queryExecution.executedPlan
      val probes = plan.collect {
        case f: FilterExec if f.condition.toString.contains("might_contain") => f
      }
      assert(probes.nonEmpty, s"no might_contain filter in:\n${plan.treeString.take(4000)}")
      val probe = probes.head
      // nothing shuffles beneath the probe, and it reads straight off parquet:
      // the corpus rows a bloom miss drops never reach the wire
      assert(probe.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "probe must be below every exchange")
      assert(probe.collect { case s: FileSourceScanExec => s }.nonEmpty,
        "probe must sit on the parquet scan side")
      // and the anti-join above it does shuffle — the probe is below it
      assert(plan.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
        "anti-join exchange expected above the probe")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("bloom FPR at design load is bounded and membership has no false negatives") {
    import spark.implicits._
    val n = 5000
    // design load: size the sketch for exactly n items at ~10 bits/item (≈1% FPR)
    val inserted = spark.range(n).select(md5(concat(lit("in:"), $"id")).as("h"))
    val bloom = inserted.select(
      BloomFunctions.bloomFilterAgg(xxhash64($"h"), n.toLong, 10L * n).as("bf"))
    // no false negatives: every inserted key must probe true
    val fn = inserted.filter(!BloomFunctions.mightContain(bloom, xxhash64($"h"))).count()
    assert(fn === 0L)
    // bounded false positives: disjoint keys survive at ≲3x the design rate
    val m = 20000
    val novel = spark.range(m).select(md5(concat(lit("out:"), $"id")).as("h"))
    val fp = novel.filter(BloomFunctions.mightContain(bloom, xxhash64($"h"))).count()
    assert(fp <= (0.03 * m).toLong, s"FPR ${fp.toDouble / m} above bound")
  }
}
