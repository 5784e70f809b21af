package graft

import java.nio.file.Files
import graft.operators.{DataQuality, EventAnalytics}
import org.apache.spark.sql.functions._

/** Data-quality family: profile invariants on the clean fixture, check
  * detection on a deliberately corrupted copy, z-score threshold
  * semantics. */
class DataQualitySpec extends SparkSpec {

  test("data_profile: per-column invariants hold") {
    val rows = DataQuality.dataProfile(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == DataQuality.ProfileCols)
    val nRows = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == nRows)
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= nRows)
      assert(r.getDouble(4) <= r.getDouble(5))
    }
  }

  test("dq_checks: fixture state detected — PK collisions flagged, domain checks pass") {
    val got = DataQuality.dqChecks(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.size == 5)
    // the synthetic generator assigns l_linenumber randomly, so the
    // (orderkey, linenumber) "key" genuinely collides — the check's job
    // is to SAY so (1401 collisions at sf0.001, oracle-confirmed)
    assert(got("lineitem_pk_unique") == ((1401L, false)))
    Seq("price_non_negative", "discount_in_range", "orderdate_not_null",
      "orders_customer_fk").foreach(c => assert(got(c) == ((0L, true)), c))
  }

  test("dq_checks: corrupted tables are caught with exact violation counts") {
    val dir = Files.createTempDirectory("dq_bad").toString
    // de-duplicated base so every expected count is exactly the injected 1
    val li = Tables.lineitem(spark, sf)
      .dropDuplicates("l_orderkey", "l_linenumber")
    li.union(li.limit(1))
      .union(li.limit(1).withColumn("l_orderkey", lit(-1L))
        .withColumn("l_extendedprice", lit(-5.0)))
      .union(li.limit(1).withColumn("l_orderkey", lit(-2L))
        .withColumn("l_discount", lit(1.5)))
      // a NULL key is a PK violation in its own right (and the case
      // where Spark countDistinct and SQL DISTINCT-over-row disagree)
      .union(li.limit(1).withColumn("l_orderkey", lit(null).cast("bigint")))
      .write.parquet(s"$dir/lineitem.parquet")
    // one NULL orderdate, one dangling custkey
    val od = Tables.orders(spark, sf)
    od.union(od.limit(1).withColumn("o_orderkey", lit(-1L))
        .withColumn("o_orderdate", lit(null).cast("timestamp")))
      .union(od.limit(1).withColumn("o_orderkey", lit(-2L))
        .withColumn("o_custkey", lit(-999L)))
      .write.parquet(s"$dir/orders.parquet")
    Tables.customer(spark, sf).write.parquet(s"$dir/customer.parquet")
    val got = DataQuality.dqChecks(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("lineitem_pk_unique") == 2L) // 1 duplicate + 1 NULL key
    assert(got("price_non_negative") == 1L)
    assert(got("discount_in_range") == 1L)
    assert(got("orderdate_not_null") == 1L)
    assert(got("orders_customer_fk") == 1L)
  }

  test("events_zscore: every reported row clears the threshold, none missed") {
    val res = EventAnalytics.eventsZscore(spark, sf).collect()
    res.foreach(r => assert(math.abs(r.getDouble(3)) >= 3.0))
    // lowering the threshold can only add rows (monotone in threshold)
    val loose = EventAnalytics.eventsZscore(spark, sf, threshold = 2.5).count()
    assert(loose >= res.length)
  }
}
