package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-layout demonstrations: bucketed co-located joins (no shuffle in
  * the join plan) and partition pruning on the ingest layout — the two
  * storage-side levers that matter most at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("bwh").toString
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.option("path", s"$wh/li").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      .write.option("path", s"$wh/ord").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: bucket layout satisfies the join's distribution — the
    // only acceptable Exchange would be none at all
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and it still computes the right thing
    val expected = Tables.lineitem(spark, sf).join(
      Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expected)
    spark.sql("DROP TABLE li_bucketed"); spark.sql("DROP TABLE ord_bucketed")
  }

  test("session-partitioned layout prunes to the requested partition") {
    val out = Files.createTempDirectory("pfact").toString + "/fact"
    import spark.implicits._
    (1 to 100).map(i => (i % 10, i.toLong, s"e$i"))
      .toDF("session_id", "seq", "payload")
      .write.partitionBy("session_id").parquet(out)
    val q = spark.read.parquet(out).filter(col("session_id") === 3)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("session_id"),
      s"no partition filter in:\n$scan")
    assert(q.count() === 10)
    // physical proof: only the one partition directory is read
    val read = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!read.contains("session_id=4") || read.contains("session_id=3"))
  }

  test("date-partitioned events layout: one-day energy query reads only that day's files") {
    val out = Files.createTempDirectory("dpart").toString + "/events_by_day"
    graft.sources.Layout.writeDatePartitioned(spark, sf, out)
    val dayDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(dayDirs.length >= 25, "fixture should span ~30 day directories")
    def parquets(d: java.io.File) = d.listFiles().count(_.getName.endsWith(".parquet"))
    val totalFiles = dayDirs.map(parquets).sum
    val dayFiles = parquets(dayDirs.find(_.getName == "event_date=2024-01-03").get)
    val q = graft.sources.Layout.energyForDay(spark, out, "2024-01-03")
    val got = q.collect() // execute so the scan's metrics are final
    assert(got.nonEmpty)
    // physical proof of pruning: the scan opened exactly the day's files.
    // (walk through the AQE wrappers — collectLeaves stops at query stages)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScan(st.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Some(s)
      case other => other.children.iterator.map(findScan).collectFirst {
        case Some(s) => s
      }
    }
    val scan = findScan(q.queryExecution.executedPlan).get
    assert(scan.metrics("numFiles").value === dayFiles.toLong,
      s"scan read ${scan.metrics("numFiles").value} files, expected $dayFiles")
    assert(dayFiles < totalFiles, "pruning must exclude the other days")
    // and it pruned via PartitionFilters, not a post-scan row filter
    val s = scan.toString
    assert(s.contains("PartitionFilters") && s.contains("event_date"), s.take(2000))
    // correctness: identical rows to the unpartitioned fixture's day slice
    val expected = Tables.events(spark, sf)
      .filter(to_date(timestamp_millis(col("ts_ms"))) === lit("2024-01-03").cast("date"))
      .count()
    assert(got.length.toLong === expected)
  }

  test("runtime bloom filter pre-filters the fact side of a shuffle join") {
    // The row-level analog of DPP for NON-partition keys: the filtered
    // dim's join keys are bloom-aggregated and injected as a
    // might_contain predicate on the fact scan, so non-qualifying fact
    // rows drop BEFORE the shuffle instead of after the join — at 100 TB
    // the difference between shuffling the corpus and shuffling the hits.
    val base = Files.createTempDirectory("bloom").toString
    import spark.implicits._
    (1 to 200000).map(i => (i % 1000, i.toLong)).toDF("k", "v")
      .write.parquet(s"$base/fact")
    (0 until 1000).map(i => (i, if (i < 20) "hot" else "cold"))
      .toDF("k", "tag").write.parquet(s"$base/dim")
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(c => c -> spark.conf.getOption(c))
    // force a shuffle join (broadcast would make the bloom pointless) and
    // drop the 10 GB application-side bar the fixture can't meet
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val q = spark.read.parquet(s"$base/fact")
        .join(spark.read.parquet(s"$base/dim").filter(col("tag") === "hot"), "k")
      assert(q.count() === 4000)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in:\n${plan.take(4000)}")
    } finally saved.foreach { case (c, v) =>
      v.fold(spark.conf.unset(c))(spark.conf.set(c, _))
    }
  }

  test("dynamic partition pruning fires when the partition key is only filtered via a dim") {
    // Static pruning needs the literal predicate on the fact; at 100 TB the
    // predicate usually lives on a dimension ("region = 'EU'") and reaches
    // the fact only through the join key. DPP closes that gap: the dim's
    // filter result is broadcast as a runtime partition filter into the
    // fact scan, so the fact still reads only the qualifying partitions.
    val base = Files.createTempDirectory("dpp").toString
    import spark.implicits._
    (1 to 1000).map(i => (i % 10, i.toLong)).toDF("k", "v")
      .write.partitionBy("k").parquet(s"$base/fact")
    // the dim must be FILE-backed: an in-memory Seq gets constant-folded
    // into a LocalRelation (filter pre-evaluated), and DPP's selective-
    // predicate detection needs the surviving Filter node
    (0L until 10L).map(i => (i, if (i < 2) "hot" else "cold"))
      .toDF("k", "tag").write.parquet(s"$base/dim")
    // tiny fixture sizes defeat the stats benefit heuristic; the pruning
    // mechanics are what this test pins
    val prev = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val q = spark.read.parquet(s"$base/fact")
        .join(spark.read.parquet(s"$base/dim").filter(col("tag") === "hot"), "k")
      assert(q.count() === 200)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in:\n$plan")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats"))(
        v => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", v))
    }
  }
}
