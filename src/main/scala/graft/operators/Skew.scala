package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) handles most
  * runtime skew; explicit salting remains the tool when the skew is known
  * ahead of time, when a deterministic plan is required, or for engines
  * of record where one join key dominates (the classic hot-session /
  * hot-document problem at 100 TB).
  */
object Skew {

  /** Inner equi-join with an N-way salt on the (potentially skewed) left
    * key: the left side gets a deterministic content-derived salt, the
    * right side is replicated N ways, and the join key becomes
    * (key, salt) — splitting each hot key's hash partition into N.
    * Output is exactly the plain join's (verified by the oracle twin of
    * [[saltedJoinAgg]]); cost is an N-fold replication of the right side,
    * so N stays small and the right side is the smaller input. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // shuffle_hash: a salted join exists to spread hot keys across
    // partitions, and a hash join consumes each (now well-balanced)
    // partition without sorting either side — sort-merge would pay an
    // O(n log n) sort on the N-fold replicated right side for ordering
    // nothing downstream uses (measured ~2x this join's wall time).
    // The hint sits on the RIGHT side so the per-task hash map is built
    // over the documented smaller input, never the skewed fact side.
    saltedLeft.join(saltedRight.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** Oracle-checked proof of equivalence: salted lineitem ⋈ orders
    * aggregated per status must equal the plain join's aggregate. */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li  = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus"))
    saltedJoin(li, ord, "o_orderkey", salts = 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
           expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  val saltedJoinAggSql: String =
    """SELECT o_orderstatus, count(*) AS n_items,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
}
