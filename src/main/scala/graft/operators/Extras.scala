package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second coverage wave: pivot, shuffle-deterministic statistical
  * aggregates, regex/array scalar functions, date arithmetic, and the
  * SQL entry point (SURVEY §2.8 function-category coverage + §3's
  * spark.sql lifecycle).
  */
object Extras {

  // --- pivot ----------------------------------------------------------------
  /** Orders count per (priority × status) as a pivoted wide table. Pivot
    * values are pinned (no discovery pass) so the plan is a single
    * aggregation; absent cells are 0, matching the oracle's conditional
    * counts. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))

  val pivotStatusSql: String =
    """SELECT o_orderpriority,
      |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
      |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
      |       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- shuffle-deterministic statistics ------------------------------------
  /** mean / variance / stddev / correlation per group, derived from EXACT
    * decimal power sums (n, Σx, Σx², Σxy) with the float math applied once
    * at the end. Spark's built-in var_samp/corr accumulate running moments
    * in doubles, so their last bits depend on partition merge order — this
    * algebraic form is deterministic under any parallelism, which is what
    * makes it oracle-checkable (and reproducible run-to-run at 100 TB).
    *
    * The CANCELLATIONS (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) also stay in exact
    * decimal, and only the small residuals convert to double (found by
    * the r11 sf1 soak: above ~10⁶ rows the power sums pass 2^53, the
    * per-engine decimal→double roundings differ in the last ulp, and the
    * subtraction's 4-digit cancellation amplifies that into a visible
    * corr divergence; subtracting first removes the cancellation, so one
    * correctly-rounded conversion per residual gives bit parity at any
    * scale). The one conversion DuckDB still does differently (its
    * decimal-to-double goes int128/10^scale — two roundings vs the JVM's
    * one) is absorbed by the repo's transcendental-parity contract: the
    * derived statistics quantize to DECIMAL(18,9)/(18,12) and cast back
    * to DOUBLE, same as the ln/PMI terms in TextAnalytics. The narrowed
    * operand casts keep every product inside
    * DECIMAL(38,4) with no scale reduction: n as DECIMAL(7,0) (≤10⁷ rows
    * per group — beyond that ANSI overflow fails LOUDLY rather than
    * rounding), sums as DECIMAL(29,4)/(19,2) with ~8 digits of headroom, products
    * re-based to DECIMAL(33,4) so the subtraction needs no width past 38
    * in either engine,
    * over their sf1 magnitudes. */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    val agged = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("sum(CAST(l_quantity AS DECIMAL(18,2)))").as("sx"),
        expr("sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))").as("sxx"),
        expr("sum(CAST(l_extendedprice AS DECIMAL(18,2)))").as("sy"),
        expr("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))").as("syy"),
        expr("sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))").as("sxy"))
    agged
      .withColumn("varx_num", expr(
        "CAST(CAST(n AS DECIMAL(7,0)) * CAST(sxx AS DECIMAL(29,4)) AS DECIMAL(33,4)) - CAST(CAST(sx AS DECIMAL(19,2)) * CAST(sx AS DECIMAL(19,2)) AS DECIMAL(33,4))"))
      .withColumn("vary_num", expr(
        "CAST(CAST(n AS DECIMAL(7,0)) * CAST(syy AS DECIMAL(29,4)) AS DECIMAL(33,4)) - CAST(CAST(sy AS DECIMAL(19,2)) * CAST(sy AS DECIMAL(19,2)) AS DECIMAL(33,4))"))
      .withColumn("cov_num", expr(
        "CAST(CAST(n AS DECIMAL(7,0)) * CAST(sxy AS DECIMAL(29,4)) AS DECIMAL(33,4)) - CAST(CAST(sx AS DECIMAL(19,2)) * CAST(sy AS DECIMAL(19,2)) AS DECIMAL(33,4))"))
      .select(
        col("l_returnflag"),
        col("n"),
        expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").as("mean_qty"),
        // degenerate-group guards (standard SQL semantics, NULL not a
        // throw): n=1 divides by zero and CAST(Infinity AS DECIMAL)
        // throws under ANSI; a zero-variance group makes corr 0/0. The
        // fixture's groups never hit either — the guards exist so a
        // 1-row or constant group at ANY scale degrades like
        // var_samp/corr would, and they sit in BOTH engines' expressions
        // so the shape contract holds.
        expr("CASE WHEN n > 1 THEN CAST(CAST(CAST(varx_num AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS DECIMAL(18,9)) AS DOUBLE) END").as("var_qty"),
        expr("CASE WHEN n > 1 THEN CAST(CAST(sqrt(CAST(varx_num AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS DECIMAL(18,9)) AS DOUBLE) END").as("stddev_qty"),
        expr("CASE WHEN n > 1 AND varx_num > 0 AND vary_num > 0 THEN CAST(CAST(CAST(cov_num AS DOUBLE) / (sqrt(CAST(varx_num AS DOUBLE)) * sqrt(CAST(vary_num AS DOUBLE))) AS DECIMAL(18,12)) AS DOUBLE) END").as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  val statsAggSql: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |         count(*) AS n,
      |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |         sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
      |         sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      |  FROM lineitem
      |  GROUP BY l_returnflag
      |), nums AS (
      |  SELECT l_returnflag, n, sx,
      |         CAST(CAST(n AS DECIMAL(7,0)) * CAST(sxx AS DECIMAL(29,4)) AS DECIMAL(33,4)) - CAST(CAST(sx AS DECIMAL(19,2)) * CAST(sx AS DECIMAL(19,2)) AS DECIMAL(33,4)) AS varx_num,
      |         CAST(CAST(n AS DECIMAL(7,0)) * CAST(syy AS DECIMAL(29,4)) AS DECIMAL(33,4)) - CAST(CAST(sy AS DECIMAL(19,2)) * CAST(sy AS DECIMAL(19,2)) AS DECIMAL(33,4)) AS vary_num,
      |         CAST(CAST(n AS DECIMAL(7,0)) * CAST(sxy AS DECIMAL(29,4)) AS DECIMAL(33,4)) - CAST(CAST(sx AS DECIMAL(19,2)) * CAST(sy AS DECIMAL(19,2)) AS DECIMAL(33,4)) AS cov_num
      |  FROM s
      |)
      |SELECT l_returnflag, n,
      |       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
      |       CASE WHEN n > 1 THEN CAST(CAST(CAST(varx_num AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS DECIMAL(18,9)) AS DOUBLE) END AS var_qty,
      |       CASE WHEN n > 1 THEN CAST(CAST(sqrt(CAST(varx_num AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS DECIMAL(18,9)) AS DOUBLE) END AS stddev_qty,
      |       CASE WHEN n > 1 AND varx_num > 0 AND vary_num > 0 THEN CAST(CAST(CAST(cov_num AS DOUBLE) / (sqrt(CAST(varx_num AS DOUBLE)) * sqrt(CAST(vary_num AS DOUBLE))) AS DECIMAL(18,12)) AS DOUBLE) END AS corr_qty_price
      |FROM nums
      |ORDER BY l_returnflag""".stripMargin

  // --- regex scalar functions ----------------------------------------------
  /** Regex battery over `part`. The filter pattern must MATCH the
    * fixture: the r13 judge found the original `BRASS|STEEL` (TPC-H's
    * type vocabulary) matches nothing in this fixture's p_type domain
    * {ECONOMY, LARGE, MEDIUM, PROMO, SMALL, STANDARD} — a 0-row result
    * whose hash "pass" proved nothing about regex parity. `DARD|OMO`
    * selects STANDARD + PROMO (~55% of parts at every SF, measured), so
    * every projection below executes over real rows: anchored extract,
    * digit-group extract from `Brand#NN`, character-class replace, and
    * translate. */
  def regexFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_type").rlike("DARD|OMO"))
      .select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_word"),
        regexp_extract(col("p_type"), "(\\w+)$", 1).as("last_word"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_type"), "[AEIOU]", ".").as("devoweled"),
        translate(col("p_brand"), "#", "-").as("brand_dashed"))
      .orderBy(col("p_partkey"))

  val regexFuncsSql: String =
    """SELECT p_partkey,
      |       regexp_extract(p_type, '^(\w+)', 1) AS first_word,
      |       regexp_extract(p_type, '(\w+)$', 1) AS last_word,
      |       regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
      |       regexp_replace(p_type, '[AEIOU]', '.', 'g') AS devoweled,
      |       translate(p_brand, '#', '-') AS brand_dashed
      |FROM part
      |WHERE regexp_matches(p_type, 'DARD|OMO')
      |ORDER BY p_partkey""".stripMargin

  // --- array scalar functions ----------------------------------------------
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        array_contains(col("toks"), "the").as("has_the"),
        concat_ws(" ", slice(col("toks"), 1, 3)).as("first3"),
        element_at(array_sort(array_distinct(col("toks"))), 1).as("min_token"),
        element_at(col("toks"), -1).as("last_token"))
      .orderBy(col("doc_id"))

  val arrayFuncsSql: String =
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |       list_contains(string_split(text, ' '), 'the') AS has_the,
      |       array_to_string((string_split(text, ' '))[1:3], ' ') AS first3,
      |       list_sort(list_distinct(string_split(text, ' ')))[1] AS min_token,
      |       (string_split(text, ' '))[-1] AS last_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // --- SQL entry point (TPC-H Q3 shape over temp views) --------------------
  /** The spark.sql lifecycle: register the tables as views, run ANSI SQL
    * through Catalyst's parser — same text DuckDB executes, minus the
    * view registration. Demonstrates the engine's SQL front door
    * (SURVEY §3: the reference's "IR" is SQL text). */
  def sqlQ3(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(sqlQ3Text)
  }

  private val sqlQ3Text: String =
    """SELECT o_orderkey,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 20""".stripMargin

  val sqlQ3Sql: String = sqlQ3Text

  // --- as-of join -----------------------------------------------------------
  /** Point-in-time (as-of) join: each 'click' event picks the most recent
    * 'view' timestamp of the same user at-or-before it. Composed from
    * built-ins per the custom-operator preference order — union the two
    * streams (they're one table here), then `last(..., ignoreNulls)` over
    * an unbounded-preceding window per user. One shuffle on user_id, no
    * range-join blowup; the same shape covers trade-vs-quote style
    * as-of joins at any scale. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ms", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val viewTs = when(col("event_type") === "view", col("ts_ms"))
    Tables.events(spark, dir)
      .withColumn("last_view_ms", last(viewTs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("last_view_ms"),
        (col("ts_ms") - col("last_view_ms")).as("ms_since_view"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val asofJoinSql: String =
    Tables.eventsOracleCte +
      """, marked AS (
        |  SELECT user_id, event_id, ts_ms, event_type,
        |         last_value(CASE WHEN event_type = 'view' THEN ts_ms END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ms
        |  FROM ev
        |)
        |SELECT user_id, event_id, ts_ms, last_view_ms,
        |       ts_ms - last_view_ms AS ms_since_view
        |FROM marked
        |WHERE event_type = 'click'
        |ORDER BY user_id, event_id""".stripMargin

  // --- exact percentiles ----------------------------------------------------
  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`, both linear interpolation over the sorted
    * values). The approximate path for 100 TB is `approx_percentile`
    * (KLL-sketch-based, engine-specific → covered rows-only by
    * approx_distinct's precedent). */
  def percentileAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))

  val percentileAggSql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS p50_qty,
      |       quantile_cont(l_quantity, 0.9) AS p90_qty,
      |       min(l_quantity) AS min_qty,
      |       max(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- ranking-window function coverage ------------------------------------
  /** rank / dense_rank / ntile / lead in one partitioned window over a
    * unique total order (totalprice ties broken by orderkey, so every
    * function is deterministic). */
  def rankFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("price_rank"),
        dense_rank().over(w).as("price_dense_rank"),
        ntile(4).over(w).as("quartile"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
      .filter(col("price_rank") <= 100)
      .orderBy(col("o_orderstatus"), col("price_rank"))
  }

  val rankFuncsSql: String =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |       CAST(price_rank AS INT) AS price_rank,
      |       CAST(price_dense_rank AS INT) AS price_dense_rank,
      |       CAST(quartile AS INT) AS quartile,
      |       next_orderkey
      |FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |         rank() OVER w AS price_rank,
      |         dense_rank() OVER w AS price_dense_rank,
      |         ntile(4) OVER w AS quartile,
      |         lead(o_orderkey, 1) OVER w AS next_orderkey
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderstatus
      |               ORDER BY o_totalprice DESC, o_orderkey)
      |)
      |WHERE price_rank <= 100
      |ORDER BY o_orderstatus, price_rank""".stripMargin

  // --- correlated scalar subquery ------------------------------------------
  /** Each customer's most expensive order via a correlated scalar subquery
    * (TPC-H Q2's shape). Catalyst decorrelates this into an aggregate +
    * join — expressed through the SQL front door since the DataFrame API
    * has no native correlated-subquery builder. */
  def correlatedMax(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(correlatedMaxSql)
  }

  // fixture tables are referenced unaliased (Verify inlines read_parquet
  // over them); the correlation aliases live on a CTE instead.
  val correlatedMaxSql: String =
    """WITH ord AS (SELECT o_custkey, o_orderkey, o_totalprice FROM orders)
      |SELECT o_custkey, o_orderkey, o_totalprice
      |FROM ord o
      |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM ord o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --- date arithmetic ------------------------------------------------------
  def dateArith(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_98"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
          .as("due_date"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("order_month_start"))
      .orderBy(col("o_orderkey"))

  val dateArithSql: String =
    """SELECT o_orderkey,
      |       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
      |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
      |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month_start
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin
}
