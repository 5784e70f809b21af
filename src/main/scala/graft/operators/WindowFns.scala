package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third-wave window-function coverage (SURVEY §2.5 extensions): value
  * window functions (first/last/nth/lead), distribution functions
  * (percent_rank/cume_dist), and a RANGE value-based frame — the three
  * window families round 1 didn't exercise (lag, rank/dense_rank/ntile
  * and ROWS frames are already covered).
  *
  * All windows are PARTITIONED on a high-cardinality key and ordered by a
  * unique (value, id) pair, so every function is deterministic and the
  * shuffle spreads evenly at any scale (SURVEY §4.2 hazard 1).
  */
object WindowFns {

  // --- value window functions: first / last / nth / lead -------------------
  /** Per customer order history: first order key, running last (= current),
    * the second order ever placed (null until it exists), and the next
    * order key — the four value-offset shapes over one growing frame. */
  def windowLeadNth(spark: SparkSession, dir: String): DataFrame = {
    val grow = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(grow).as("first_key"),
        last(col("o_orderkey")).over(grow).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(grow).as("second_key"),
        lead(col("o_orderkey"), 1).over(plain).as("next_key"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val windowLeadNthSql: String =
    """SELECT o_custkey, o_orderkey,
      |       first_value(o_orderkey) OVER w AS first_key,
      |       last_value(o_orderkey) OVER w AS last_key,
      |       nth_value(o_orderkey, 2) OVER w AS second_key,
      |       lead(o_orderkey, 1) OVER wp AS next_key
      |FROM orders
      |WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |       wp AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --- distribution functions: percent_rank / cume_dist --------------------
  /** Account-balance percentile position within each market segment. The
    * ordering key includes the unique custkey so no two rows are peers —
    * both engines then compute the identical rationals (rank-1)/(n-1) and
    * rank/n, which are bit-exact as doubles. */
  def windowPercentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        percent_rank().over(w).as("bal_percentile"),
        cume_dist().over(w).as("bal_cume_dist"))
      .orderBy(col("c_custkey"))
  }

  val windowPercentRankSql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |       percent_rank() OVER w AS bal_percentile,
      |       cume_dist() OVER w AS bal_cume_dist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --- RANGE (value-based) frame -------------------------------------------
  /** Per-supplier sum of quantities within 5 units below each row's own
    * quantity — a value-based frame, so the result is independent of tie
    * order (every peer row sees the same frame), and the quantity goes
    * through DECIMAL so the sum is exact under any accumulation order.
    * Expressed through the SQL front door: the text below runs verbatim on
    * both engines. */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(windowRangeFrameSql)
  }

  val windowRangeFrameSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS range_sum
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity
      |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
}
