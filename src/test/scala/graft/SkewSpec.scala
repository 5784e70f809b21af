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
}
