package graft

import org.apache.spark.sql.functions._

/** Pins [[Tables.widenedBy]]'s size-capped width policy (r19 verdict #1:
  * a pinned `defaultParallelism` repartition regressed the light window
  * pipelines at 32 cores — the pinned width must never exceed what the
  * input size supports).
  */
class WideningSpec extends SparkSpec {

  private def width(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("width is data-capped, never exceeds parallelism, rows unchanged") {
    val docs = Tables.documents(spark, sf)
    val p = spark.sparkContext.defaultParallelism
    val cur = width(docs)
    val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes.toLong

    def expected(bytesPerTask: Long): Int =
      math.max(cur.toLong,
        math.min(p.toLong, bytes / bytesPerTask + 1)).toInt

    val heavy = Tables.widenedBy(docs, col("doc_id"))
    val light = Tables.widenedBy(docs, Tables.WidenLightBytesPerTask, col("doc_id"))
    assert(width(heavy) === expected(Tables.WidenHeavyBytesPerTask))
    assert(width(light) === expected(Tables.WidenLightBytesPerTask))
    assert(width(heavy) <= p)
    assert(width(light) <= width(heavy))
    // widening is pure redistribution
    assert(light.count() === docs.count())
    assert(heavy.count() === docs.count())
  }

  test("already-wide input is returned untouched (production no-op guard)") {
    val p = spark.sparkContext.defaultParallelism
    val wide = Tables.documents(spark, sf).repartition(p, col("doc_id"))
    // cur >= p: no extra exchange is inserted — the very same frame back
    assert(Tables.widenedBy(wide, col("doc_id")) eq wide)
  }

  test("a tiny input never pins more tasks than its bytes support") {
    // nation is ~3 KB: even the heavy cost class must stay at width 1
    // rather than fan 4 near-empty pinned tasks
    val nation = Tables.nation(spark, sf)
    val w = Tables.widenedBy(nation, col("n_nationkey"))
    assert(width(w) === width(nation))
  }
}
