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
}
