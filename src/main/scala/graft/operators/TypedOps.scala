package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed Dataset API coverage: `groupByKey` + `mapGroups` with case-class
  * encoders — the escape hatch for genuine per-group imperative logic
  * (SURVEY §7.1: `Dataset[T]` where type safety helps). mapGroups runs
  * outside codegen, so it is reserved for logic a window/agg can't
  * express naturally; the oracle proves the imperative version agrees
  * with the declarative one.
  *
  * Scale shape: one shuffle on the grouping key; per-group state is one
  * customer's orders (bounded ~10 rows), so executor memory is flat no
  * matter the total row count.
  */
object TypedOps {

  case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
                      o_orderdate: java.sql.Timestamp)

  case class CustOrderStats(o_custkey: Long, n_orders: Long, max_gap_days: Int,
                            total_cents: Long)

  /** Per-customer order cadence: order count, the largest day-gap between
    * consecutive orders, and the exact total in cents. Floats are summed
    * as rounded long cents in deterministic (date, key) order, so the
    * result is order-independent and engine-exact; day math is epoch-day
    * integer arithmetic (fixture order dates are midnight UTC). */
  def typedCustOrderStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cast pins the column to TIMESTAMP_LTZ regardless of what the parquet
    // reader inferred (NTZ vs LTZ) — session TZ is UTC, so values are
    // identical and the java.sql.Timestamp encoder applies either way.
    val ds = Tables.orders(spark, dir)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_custkey"),
        org.apache.spark.sql.functions.col("o_totalprice"),
        org.apache.spark.sql.functions.col("o_orderdate").cast("timestamp").as("o_orderdate"))
      .as[OrderRow]
    ds.groupByKey(_.o_custkey)
      .mapGroups { (custkey, it) =>
        val rows = it.toArray.sortBy(r => (r.o_orderdate.getTime, r.o_orderkey))
        val days = rows.map(_.o_orderdate.getTime / 86400000L)
        val maxGap =
          if (days.length < 2) 0
          else days.sliding(2).map(p => (p(1) - p(0)).toInt).max
        val cents = rows.iterator.map(r => math.round(r.o_totalprice * 100)).sum
        CustOrderStats(custkey, rows.length.toLong, maxGap, cents)
      }
      .toDF()
      .orderBy("o_custkey")
  }

  val typedCustOrderStatsSql: String =
    """WITH g AS (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |         date_diff('day',
      |           lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |           CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders
      |)
      |SELECT o_custkey,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(coalesce(max(gap), 0) AS INT) AS max_gap_days,
      |       CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM g
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin
}
