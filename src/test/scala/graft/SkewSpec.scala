package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join output equals plain join output") {
    val li  = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderstatus"))
    val plain  = li.join(ord, "o_orderkey")
    val salted = Skew.saltedJoin(li, ord, "o_orderkey", salts = 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("salting actually spreads a hot key over multiple partitions' keys") {
    import spark.implicits._
    // one key carries 10k rows; the salt must split it
    val hot = (1 to 10000).map(i => (42L, i)).toDF("k", "v")
    val salts = hot.withColumn("__salt",
      pmod(xxhash64(hot.columns.map(col): _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts === 8)
  }

  test("minhash-lsh bucket cap drops a degenerate 10x-cap boilerplate bucket wholesale") {
    import spark.implicits._
    // 500 byte-identical boilerplate documents: identical shingle sets ->
    // identical signatures -> ALL 15 bands put all 500 docs in one bucket,
    // 10x the default cap of 50. Without the cap the candidate self-join
    // is quadratic in the bucket (500*499/2 pairs per band); with it the
    // bucket is dropped before the join ever sees it.
    val boiler = "terms of service apply to all users of this site without exception"
    val degenerate = (1L to 500L).map(i => (i, boiler))
    // plus a genuine near-dup pair and an unrelated doc, each in tiny buckets
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val c = "completely different content about distributed query engines and shuffles"
    val docs = (degenerate ++ Seq((1001L, a), (1002L, b), (1003L, c)))
      .toDF("doc_id", "text")
    val result = graft.operators.Dedup.minhashLshFrom(docs).collect()
    // the boilerplate pairs (jaccard 1.0, ~125k of them uncapped) are gone
    assert(!result.exists(r => r.getLong(0) <= 500L || r.getLong(1) <= 500L),
      "degenerate bucket must be dropped wholesale, not paired")
    // the true near-dup pair in a healthy bucket is still found
    val pair = result.find(r => r.getLong(0) == 1001L && r.getLong(1) == 1002L)
    assert(pair.isDefined, "cap must not cost recall on healthy buckets")
    assert(pair.get.getDouble(2) > 0.8, s"near-identical docs: ${pair.get.getDouble(2)}")
  }

  test("minhash-lsh cap path is window-free (splittable under a hot bucket)") {
    import spark.implicits._
    // the cap must be aggregate + join (map-side partial, AQE-splittable),
    // never a count-over-window — a window partition cannot be split, so
    // a million-row boilerplate bucket would serialize through one task
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma epsilon"))
      .toDF("doc_id", "text")
    val plan = graft.operators.Dedup.minhashLshFrom(docs, checkpoint = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "bucket cap regressed to a window count")
  }

  test("substring spans under a hot window: a 2000-doc boilerplate header stays exact") {
    import spark.implicits._
    // the pathological shape for the shared-hash aggregation and the
    // flag join-back: ONE window hash carried by every document (a
    // boilerplate header). min/max partials absorb the hot key map-side;
    // the join back fans the single shared row across the hot hash.
    val header = (0 until 10).map(i => s"hdr_$i").mkString(" ")
    val docs = (1L to 2000L).map(i =>
      (i, s"$header " + (0 until 10).map(j => s"u_${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = graft.operators.Dedup.dupSpanRows(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // only the pure-header window (pos 0) is cross-doc duplicated — every
    // later window mixes in per-doc unique tokens
    assert(rows.length == 2000)
    assert(rows.forall { case (_, s, e, n) => s == 0L && e == 9L && n == 1L },
      s"every doc must carry exactly the [0,9] header span; got ${rows.take(3).mkString(",")}")
  }
}
