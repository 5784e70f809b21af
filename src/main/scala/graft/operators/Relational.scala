package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Category-coverage queries over the TPC-H-ish fixture tables
  * (SURVEY.md §7.3 step 5): equi/semi/anti/broadcast joins, rollup/cube,
  * ranking + frame-spec windows, set ops, top-k, distinct-HAVING, scalar
  * function coverage. The reference itself contains only one join-shaped
  * operator (SURVEY §2.3 J1) — these demonstrate the full relational
  * surface a user of a general engine needs.
  *
  * Float-parity rule (SURVEY §7.4): every SUM over a double column casts to
  * DECIMAL first — decimal addition is exact and order-independent, so the
  * result is identical regardless of partitioning/shuffle order, in Spark
  * and in the DuckDB oracle. The final exact decimal is then cast to DOUBLE
  * (identical round-to-nearest on both engines) so the output type is a
  * plain primitive with no scale-rendering ambiguity.
  *
  * Scale notes: joins against region/nation/part are broadcast (dimension
  * tables); fact-fact work keys on high-cardinality columns; windows are
  * always partitioned; top-k goes through TakeOrderedAndProject (no global
  * sort materialization).
  */
object Relational {

  // --- TPC-H Q1 shape: wide aggregation with exact decimal sums ----------
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(expr("l_shipdate <= TIMESTAMP '1998-09-01'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_base_price"),
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- TPC-H Q5 shape: 5-way join, dimensions broadcast ------------------
  /** customer ⋈ orders ⋈ lineitem ⋈ nation ⋈ region, revenue per nation.
    * region/nation are broadcast explicitly (they are tiny at any SF);
    * the fact-side join keys are high-cardinality → shuffled hash join
    * with AQE free to pick better at runtime. */
  def joinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val li   = Tables.lineitem(spark, dir)
    val nat  = broadcast(Tables.nation(spark, dir))
    val reg  = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)").as("revenue"),
           count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val joinRevenueSql: String =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // --- broadcast dimension join + aggregation -----------------------------
  def partJoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
           expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"))
      .orderBy(col("p_brand"))

  val partJoinAggSql: String =
    """SELECT p_brand, count(*) AS n_items,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // --- semi / anti joins (EXISTS / NOT EXISTS) ----------------------------
  def semiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    Tables.customer(spark, dir)
      .join(ord, Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val semiJoinCustomersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  def antiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    Tables.customer(spark, dir)
      .join(ord, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val antiJoinCustomersSql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --- outer joins ----------------------------------------------------------
  /** Left outer + aggregation: every customer with their order count —
    * customers without orders surface with count 0 (count of a null join
    * column), the classic null-preserving outer-join shape. */
  def leftJoinOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
    Tables.customer(spark, dir)
      .join(ord, Seq("c_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  val leftJoinOrdersSql: String =
    """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment
      |ORDER BY c_custkey""".stripMargin

  /** Full outer between two per-customer aggregates (finished vs open
    * order counts): either side may be absent → coalesce to 0. */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_f"))
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_o"))
    f.join(o, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("n_f"), lit(0L)).as("n_finished"),
        coalesce(col("n_o"), lit(0L)).as("n_open"))
      .orderBy(col("custkey"))
  }

  val fullOuterJoinSql: String =
    """WITH f AS (
      |  SELECT o_custkey AS custkey, count(*) AS n_f FROM orders
      |  WHERE o_orderstatus = 'F' GROUP BY o_custkey
      |), o AS (
      |  SELECT o_custkey AS custkey, count(*) AS n_o FROM orders
      |  WHERE o_orderstatus = 'O' GROUP BY o_custkey
      |)
      |SELECT coalesce(f.custkey, o.custkey) AS custkey,
      |       coalesce(n_f, 0) AS n_finished,
      |       coalesce(n_o, 0) AS n_open
      |FROM f FULL OUTER JOIN o ON f.custkey = o.custkey
      |ORDER BY custkey""".stripMargin

  // --- grouping sets: rollup / cube ---------------------------------------
  /** Subtotal rows surface as NULL group keys; both engines agree, and the
    * output coalesces them to '(all)' so ordering is total and unambiguous
    * (Spark sorts NULLS FIRST, DuckDB NULLS LAST — coalescing sidesteps
    * the divergence). */
  def rollupPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
              col("sum_qty"), col("n_rows"))
      .orderBy(col("returnflag"), col("linestatus"))

  val rollupPricingSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |       coalesce(l_linestatus, '(all)') AS linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Arbitrary GROUPING SETS (not the rollup/cube hierarchies): per-flag
    * totals alongside per-status totals in one pass over the data —
    * Catalyst plans a single Expand + aggregation, not two scans. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(groupingSetsSql)
  }

  val groupingSetsSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |       coalesce(l_linestatus, '(all)') AS linestatus,
      |       count(*) AS n_rows,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY returnflag, linestatus""".stripMargin

  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("orderstatus"),
              coalesce(col("o_orderpriority"), lit("(all)")).as("orderpriority"),
              col("n_orders"), col("sum_price"))
      .orderBy(col("orderstatus"), col("orderpriority"))

  val cubeOrdersSql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
      |       coalesce(o_orderpriority, '(all)') AS orderpriority,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin

  // --- ranking window: top-3 orders per customer --------------------------
  def windowTopkOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val windowTopkOrdersSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // --- frame-spec window: running sum per supplier ------------------------
  /** ROWS UNBOUNDED PRECEDING → CURRENT ROW running total; quantity goes
    * through DECIMAL so the cumulative sum is exact under any evaluation
    * association (Spark's incremental buffer vs DuckDB's segment tree). */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    // The fixture contains duplicate (l_orderkey, l_linenumber) pairs —
    // at sf0.1 two rows can tie on the FULL (shipdate, orderkey,
    // linenumber) key with different quantities, making the ROWS-frame
    // prefix sum at the tied rows order-ambiguous in any engine (caught
    // as an intermittent 1-row cross-engine diff). l_quantity completes
    // the key: rows still tied after it contribute equal amounts, so
    // every prefix value is well-defined.
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .withColumn("running_qty",
        sum(expr("CAST(l_quantity AS DECIMAL(18,2))")).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val windowRunningSumSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
      |              OVER (PARTITION BY l_suppkey
      |                    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS DOUBLE) AS running_qty
      |FROM lineitem
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // --- set operations ------------------------------------------------------
  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val b = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    a.union(b).distinct().orderBy(col("custkey"))
  }

  val setUnionSql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY custkey""".stripMargin

  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val b = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    a.intersect(b).orderBy(col("custkey"))
  }

  val setIntersectSql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY custkey""".stripMargin

  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val b = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    a.except(b).orderBy(col("custkey"))
  }

  val setExceptSql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY custkey""".stripMargin

  // --- top-k (TakeOrderedAndProject, no global sort) ----------------------
  def topkLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  val topkLineitemSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  // --- COUNT(DISTINCT) + HAVING (SURVEY A4) --------------------------------
  def distinctHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderstatus")).as("n_status"),
           count(lit(1)).as("n_orders"))
      .filter(col("n_orders") > 5)
      .orderBy(col("o_custkey"))

  val distinctHavingSql: String =
    """SELECT o_custkey, count(DISTINCT o_orderstatus) AS n_status,
      |       count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) > 5
      |ORDER BY o_custkey""".stripMargin

  // --- scalar function coverage (string) ----------------------------------
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        lower(trim(col("p_brand"))).as("brand_lower"))
      .orderBy(col("p_partkey"))

  val scalarFuncsSql: String =
    """SELECT p_partkey,
      |       upper(p_name) AS name_upper,
      |       length(p_name) AS name_len,
      |       substring(p_type, 1, 5) AS type_prefix,
      |       concat_ws('#', p_brand, p_type) AS brand_type,
      |       regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
      |       lower(trim(p_brand)) AS brand_lower
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // --- scalar function coverage (date/time) --------------------------------
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date_str"),
        quarter(col("o_orderdate")).as("order_quarter"))
      .orderBy(col("o_orderkey"))

  val dateFuncsSql: String =
    """SELECT o_orderkey,
      |       CAST(year(o_orderdate) AS INT) AS order_year,
      |       CAST(month(o_orderdate) AS INT) AS order_month,
      |       CAST(day(o_orderdate) AS INT) AS order_day,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
      |       CAST(quarter(o_orderdate) AS INT) AS order_quarter
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // --- conditional aggregation ---------------------------------------------
  def condAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(col("l_quantity") > 25, 1)).as("n_big"),
        expr("CAST(sum(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)").as("qty_discounted"))
      .orderBy(col("l_returnflag"))

  val condAggSql: String =
    """SELECT l_returnflag,
      |       count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big,
      |       CAST(sum(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_discounted
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- approximate distinct (no DuckDB oracle: HLL is engine-specific) -----
  /** approx_count_distinct = HyperLogLog++; the scale path for A4-style
    * distinct counting when exactness isn't required. Rows-only check. */
  /** Approximate distinct customers per order status, oracle-checked in
    * the Sketches bound style: the HLL++ estimate itself is
    * engine-internal, so the emitted contract is the exact count plus a
    * boolean asserting the estimate landed within 3× the requested
    * relative standard deviation (default rsd 0.05 → 15% bound — vastly
    * wider than HLL++'s actual behavior, so the check is stable, while
    * still catching a broken sketch). DuckDB recomputes the exact count
    * and states the boolean literally. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey")).as("approx"),
           countDistinct(col("o_custkey")).as("exact_customers"),
           count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus"), col("exact_customers"), col("n_orders"),
        (abs(col("approx") - col("exact_customers")) <=
          col("exact_customers") * lit(0.15)).as("within_3rsd"))
      .orderBy(col("o_orderstatus"))

  val approxDistinctSql: String =
    """SELECT o_orderstatus,
      |       count(DISTINCT o_custkey) AS exact_customers,
      |       count(*) AS n_orders,
      |       true AS within_3rsd
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
}
