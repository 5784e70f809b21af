package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 relational coverage wave: distribution window functions,
  * map-type round trip, second string-function battery, median/IQR,
  * stratified systematic sampling, TPC-H Q5, and generator edge semantics
  * (explode_outer). Every query keeps the DuckDB float-parity rules:
  * identical expression shape, DECIMAL partial sums for order-independent
  * totals, integer-exact math everywhere else.
  */
object Relational3 {

  // --- distribution window functions (ntile / cume_dist) --------------------
  /** Quartile bucket + cumulative distribution of order value within each
    * order status. The tie-break key (o_orderkey) makes both functions
    * deterministic; one shuffle on the partition key, then a per-partition
    * sort — the standard distribution-ranking shape. */
  def ntileCume(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cum_frac", cume_dist().over(w))
      .orderBy(col("o_orderkey"))
  }

  val ntileCumeSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |       ntile(4) OVER w AS quartile,
      |       cume_dist() OVER w AS cum_frac
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // --- first/last/nth value with IGNORE NULLS -------------------------------
  /** Null-skipping value window functions over a synthetically-nulled
    * measure (every third payload key): running first non-null, whole-
    * partition last and 2nd non-null. The running form needs only the
    * default growing frame; last/nth need the full-partition frame in both
    * engines — mixed frames over one logical window. */
  def firstLastWindow(spark: SparkSession, dir: String): DataFrame = {
    val wRun  = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val wFull = wRun.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .withColumn("nv", when(col("k") % 3 === 0, lit(null)).otherwise(col("value")))
      .select(col("event_id"), col("user_id"),
        first(col("nv"), ignoreNulls = true).over(wRun).as("first_nv"),
        last(col("nv"), ignoreNulls = true).over(wFull).as("last_nv"),
        nth_value(col("nv"), 2, ignoreNulls = true).over(wFull).as("second_nv"))
      .orderBy(col("event_id"))
  }

  val firstLastWindowSql: String =
    Tables.eventsOracleCte +
      """, nulled AS (
        |  SELECT event_id, user_id, ts_ms,
        |         CASE WHEN k % 3 = 0 THEN NULL ELSE value END AS nv
        |  FROM ev
        |)
        |SELECT event_id, user_id,
        |       first_value(nv IGNORE NULLS) OVER w AS first_nv,
        |       last_value(nv IGNORE NULLS) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_nv,
        |       nth_value(nv, 2 IGNORE NULLS) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_nv
        |FROM nulled
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |ORDER BY event_id""".stripMargin

  // --- map type round trip --------------------------------------------------
  /** Per-user event-type histogram packed into a MapType column
    * (map_from_entries over a sorted entry list — insertion order is
    * iteration order, so the later explode is deterministic) and unpacked
    * back to rows, with the map's size riding along. Exercises Spark's
    * map construction/inspection surface; the oracle is the plain
    * relational equivalent, so the round trip is proven lossless. */
  def mapRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.table(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("user_id"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(col("user_id"), size(col("m")).as("n_types"),
        explode(col("m")).as(Seq("event_type", "n")))
      .orderBy(col("user_id"), col("event_type"))
  }

  val mapRoundtripSql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS n
      |  FROM events
      |  GROUP BY 1, 2
      |)
      |SELECT user_id,
      |       CAST(count(*) OVER (PARTITION BY user_id) AS INT) AS n_types,
      |       event_type,
      |       CAST(n AS BIGINT) AS n
      |FROM c
      |ORDER BY user_id, event_type""".stripMargin

  // --- string function battery 2 -------------------------------------------
  /** Edit distance, padding, character translation, reversal, repetition,
    * substring search, codepoint probe — all codegen'd built-ins, all with
    * exact DuckDB twins (instr ≡ instr, ascii ≡ ascii, hex-identical
    * semantics throughout). */
  def strFuncs2(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        levenshtein(col("c_name"), col("c_mktsegment")).as("lev"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
        translate(col("c_name"), "#", "-").as("translated"),
        reverse(col("c_mktsegment")).as("rev_seg"),
        repeat(col("c_mktsegment"), 2).as("double_seg"),
        instr(col("c_name"), "1").as("pos1"),
        ascii(col("c_mktsegment")).as("seg_ascii"),
        substring(col("c_name"), 1, 8).as("prefix8"))
      .orderBy(col("c_custkey"))

  val strFuncs2Sql: String =
    """SELECT c_custkey,
      |       CAST(levenshtein(c_name, c_mktsegment) AS INT) AS lev,
      |       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
      |       translate(c_name, '#', '-') AS translated,
      |       reverse(c_mktsegment) AS rev_seg,
      |       repeat(c_mktsegment, 2) AS double_seg,
      |       CAST(instr(c_name, '1') AS INT) AS pos1,
      |       CAST(ascii(c_mktsegment) AS INT) AS seg_ascii,
      |       substring(c_name, 1, 8) AS prefix8
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // --- median / IQR ---------------------------------------------------------
  /** Exact median plus interquartile range per line status: Spark's
    * `median` and array-form `percentile` against DuckDB's `median` /
    * `quantile_cont` — both interpolate identically (validated previously
    * by approx_pctl_check's exact side). Exact quantiles sort each group;
    * the sketch path (approx_percentile) is the 100 TB default and is
    * covered by approx_pctl_check. */
  def medianIqr(spark: SparkSession, dir: String): DataFrame = {
    val qs = expr("percentile(l_extendedprice, array(0.25D, 0.75D))")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .agg(expr("median(l_extendedprice)").as("med"), qs.as("qs"))
      .select(col("l_linestatus"), col("med"),
        element_at(col("qs"), 1).as("q1"),
        element_at(col("qs"), 2).as("q3"),
        (element_at(col("qs"), 2) - element_at(col("qs"), 1)).as("iqr"))
      .orderBy(col("l_linestatus"))
  }

  val medianIqrSql: String =
    """SELECT l_linestatus,
      |       median(l_extendedprice) AS med,
      |       quantile_cont(l_extendedprice, 0.25) AS q1,
      |       quantile_cont(l_extendedprice, 0.75) AS q3,
      |       quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25) AS iqr
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY l_linestatus""".stripMargin

  // --- stratified systematic sampling --------------------------------------
  /** Every 50th order within each order status by key rank — systematic
    * sampling that parallelizes across strata (each stratum is one window
    * partition; no global sort). Complements sample_per_source's weighted
    * bottom-k: systematic is the right tool when the frame is already
    * ordered and a fixed sampling fraction per stratum is wanted. */
  /** Shared with the oracle SQL so non-default call sites can't diverge. */
  val SampleEvery: Int = 50

  def sampleSystematic(spark: SparkSession, dir: String, every: Int = SampleEvery): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter((col("rn") - 1) % every === 0)
      .select(col("o_orderstatus"), ((col("rn") - 1) / every).cast("int").as("sample_idx"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderstatus"), col("sample_idx"))
  }

  val sampleSystematicSql: String =
    s"""WITH ranked AS (
       |  SELECT o_orderstatus, o_orderkey, o_totalprice,
       |         row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn
       |  FROM orders
       |)
       |SELECT o_orderstatus,
       |       CAST((rn - 1) / $SampleEvery AS INT) AS sample_idx,
       |       o_orderkey, o_totalprice
       |FROM ranked
       |WHERE (rn - 1) % $SampleEvery = 0
       |ORDER BY o_orderstatus, sample_idx""".stripMargin

  // --- TPC-H Q5 (local-supplier volume) ------------------------------------
  /** Six-way join: region → nation → (customer, supplier) → orders →
    * lineitem with the c_nationkey = s_nationkey "local supplier"
    * condition, revenue per nation for one region-year. At scale the three
    * dimension tables broadcast (Catalyst picks this from size estimates);
    * the big join is lineitem ⋈ orders on the shared orderkey. Same
    * DECIMAL-partial-sum revenue idiom as sql_q3. */
  def sqlQ5(spark: SparkSession, dir: String): DataFrame = {
    Tables.region(spark, dir).createOrReplaceTempView("region")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(sqlQ5Text)
  }

  private val sqlQ5Text: String =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM region
      |JOIN nation   ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  val sqlQ5Sql: String = sqlQ5Text

  // --- explode_outer (generator null-preservation) --------------------------
  /** Token matches with left-preservation: documents whose text contains
    * no match still emit one null row (explode_outer), so downstream
    * per-document joins don't silently drop them — the generator edge case
    * a filter-then-explode pipeline gets wrong. The match set ('q'-tokens)
    * is rare enough in the fixture vocabulary that both branches are
    * exercised. */
  def explodeOuterTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), expr("filter(split(text, ' '), t -> t LIKE '%q%')").as("hits"))
      .select(col("doc_id"), explode_outer(col("hits")).as("tok"))
      .orderBy(col("doc_id"), col("tok"))

  val explodeOuterTokensSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents)
      |SELECT d.doc_id, t.tok
      |FROM d LEFT JOIN LATERAL (
      |  SELECT unnest(list_filter(string_split(d.text, ' '), x -> x LIKE '%q%')) AS tok
      |) t ON true
      |ORDER BY doc_id, tok NULLS FIRST""".stripMargin

  // --- TPC-H Q7 (volume shipping, disjunctive join predicate) ---------------
  /** Two-nation trade volume per direction per year: supplier nation and
    * customer nation joined through lineitem/orders with the DISJUNCTIVE
    * pair predicate ((n1,n2) = (A,B) OR (B,A)) — the join shape optimizers
    * mishandle by falling back to a cross product; here both nation dims
    * broadcast and the disjunction evaluates as a post-join filter on two
    * tiny broadcast sides, never touching the fact-fact join keys. */
  def sqlQ7(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(sqlQ7Text)
  }

  private val sqlQ7Text: String =
    """WITH n1 AS (SELECT n_nationkey AS n1_key, n_name AS supp_nation FROM nation),
      |     n2 AS (SELECT n_nationkey AS n2_key, n_name AS cust_nation FROM nation)
      |SELECT supp_nation, cust_nation, l_year,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM (
      |  SELECT supp_nation, cust_nation,
      |         year(l_shipdate) AS l_year, l_extendedprice, l_discount
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN n1 ON s_nationkey = n1_key
      |  JOIN n2 ON c_nationkey = n2_key
      |  WHERE (supp_nation = 'NATION_3' AND cust_nation = 'NATION_7')
      |     OR (supp_nation = 'NATION_7' AND cust_nation = 'NATION_3')
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  val sqlQ7Sql: String = sqlQ7Text

  // --- multi-aggregate pivot ------------------------------------------------
  /** Pivot with TWO aggregates per pivot value: order count and exact
    * revenue per (priority × status) cell — one scan, one aggregation,
    * column names fused as <status>_<agg>. The oracle states the same
    * cells as conditional aggregates (the universal pivot encoding). */
  def pivotMultiAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("total"))
      .orderBy(col("o_orderpriority"))

  /** NB the counts are nullif-wrapped: with more than one aggregate Spark
    * resolves pivot through the two-phase PivotFirst path, which NULL-fills
    * a (priority, status) cell with no input rows — the oracle must state
    * NULL, not 0, for an empty cell or the compare diverges the day a
    * fixture has an absent combination. */
  val pivotMultiAggSql: String =
    """SELECT o_orderpriority,
      |       nullif(count(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS F_n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS F_total,
      |       nullif(count(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS O_n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS O_total,
      |       nullif(count(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS P_n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS P_total
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- schema-evolution union (unionByName) ---------------------------------
  /** Union of two generations of the same table — a legacy projection
    * missing the `source` column and the modern full one — via
    * `unionByName(allowMissingColumns = true)`: columns align by NAME, the
    * missing one null-fills. This is the schema-evolution read path of a
    * long-lived lake table (positional union would silently mis-bind).
    * The oracle states the null-filled union explicitly. */
  def unionByNameEvolved(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val legacy = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
    val modern = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("source"))
    legacy.unionByName(modern, allowMissingColumns = true)
      .orderBy(col("doc_id"))
  }

  val unionByNameEvolvedSql: String =
    """SELECT doc_id, lang, NULL AS source FROM documents WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT doc_id, lang, source FROM documents WHERE doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin

  // --- try_* error-safe functions -------------------------------------------
  /** ANSI-mode-safe expression forms: `try_divide` (null, not error, on a
    * zero divisor), `try_cast` (null on unparsable input), `try_element_at`
    * (null out of bounds). Spark 4 defaults to ANSI, where the plain forms
    * THROW — the try_ family is how a production pipeline encodes
    * "quarantine, don't crash" per value. The oracle states the same
    * semantics via nullif / TRY_CAST / native-null indexing. */
  def tryFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        expr("try_divide(event_id, k % 5)").as("safe_div"),
        expr("try_cast(CASE WHEN k % 2 = 0 THEN CAST(k AS STRING) ELSE event_type END AS INT)")
          .as("maybe_int"),
        expr("try_element_at(split(event_type, 'i'), 2)").as("second_piece"))
      .orderBy(col("event_id"))

  val tryFuncsSql: String =
    Tables.eventsOracleCte +
      """
        |SELECT event_id,
        |       event_id / nullif(k % 5, 0) AS safe_div,
        |       TRY_CAST(CASE WHEN k % 2 = 0 THEN CAST(k AS VARCHAR) ELSE event_type END AS INT) AS maybe_int,
        |       string_split(event_type, 'i')[2] AS second_piece
        |FROM ev
        |ORDER BY event_id""".stripMargin

  // --- max_by / min_by ------------------------------------------------------
  /** Selector aggregates: the user behind each event type's highest- and
    * lowest-valued event in ONE hash aggregation — no window, no
    * self-join, the shape that replaces "top-1 per group" row_number
    * pipelines when only the argmax row's companion column is needed. The
    * struct ordering key makes ties deterministic (event_id is unique);
    * the oracle expresses the same argmax as ordered-first aggregates. */
  def maxbyMinby(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        max_by(col("user_id"), struct(col("value"), col("event_id"))).as("top_user"),
        min_by(col("user_id"), struct(col("value"), col("event_id"))).as("bottom_user"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"))
      .orderBy(col("event_type"))

  val maxbyMinbySql: String =
    Tables.eventsOracleCte +
      """
        |SELECT event_type,
        |       first(user_id ORDER BY value DESC, event_id DESC) AS top_user,
        |       first(user_id ORDER BY value, event_id) AS bottom_user,
        |       max(value) AS max_value,
        |       min(value) AS min_value
        |FROM ev
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin

  // --- ROWS-frame moving aggregates -----------------------------------------
  /** Trailing 4-row moving sum/average per user (ROWS BETWEEN 3 PRECEDING
    * AND CURRENT ROW) — the physical-row frame that RANGE can't express
    * (window_range_frame covers the value-distance frame). The sum runs
    * through DECIMAL so the sliding accumulation is association-free and
    * engine-exact; the average is one double division of exact values. */
  def windowRowsFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        sum(expr("CAST(value AS DECIMAL(18,2))")).over(w).cast("double").as("mov_sum"),
        count(lit(1)).over(w).as("mov_n"))
      .withColumn("mov_avg", col("mov_sum") / col("mov_n").cast("double"))
      .orderBy(col("event_id"))
  }

  val windowRowsFrameSql: String =
    Tables.eventsOracleCte +
      """
        |SELECT event_id, user_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
        |       count(*) OVER w AS mov_n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |         / CAST(count(*) OVER w AS DOUBLE) AS mov_avg
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin

  // --- TPC-H Q10 (returned-item revenue per customer, top 20) ---------------
  /** Revenue lost to returned items per customer for one order quarter:
    * the quarter filter is pushed into the orders scan and the returnflag
    * filter into the lineitem scan; nation broadcasts; the two fact-side
    * joins shuffle on their natural keys. Revenue accumulates in
    * DECIMAL(18,2) (the q1_agg contract) so the sum is order-independent
    * and the top-20 ordering (revenue DESC, c_custkey) is a total order —
    * deterministic under any partitioning and across engines. */
  def sqlQ10(spark: SparkSession, dir: String): DataFrame = {
    val rev = "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
    Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir)
        .filter(expr("o_orderdate >= TIMESTAMP '1996-01-01' AND " +
          "o_orderdate < TIMESTAMP '1996-04-01'")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(expr(rev).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val sqlQ10Sql: String =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |            AS DOUBLE) AS revenue,
      |       c_acctbal, n_name
      |FROM lineitem, orders, customer, nation
      |WHERE l_orderkey = o_orderkey
      |  AND o_custkey = c_custkey
      |  AND c_nationkey = n_nationkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // --- TPC-H Q21 shape (suppliers who kept the order waiting) ---------------
  /** Q21 adapted to the fixture (no receipt/commit dates → "late" is
    * `l_returnflag = 'R'`): suppliers in one nation whose line item was
    * late on a completed multi-supplier order where NO other supplier
    * was late — the classic triple-lineitem self-join with EXISTS and
    * NOT EXISTS, the one join topology the relational surface lacked.
    *
    * Spark-first rewrite instead of three lineitem scans: ONE scan
    * aggregates to per-(order, supplier) late-row counts, then a window
    * over that AGGREGATED table (partitions = suppliers-per-order, tiny
    * and bounded — not the low-cardinality-window hazard) derives the
    * per-order supplier/late-supplier counts. EXISTS ⇔ nsupp > 1;
    * NOT EXISTS ⇔ nlate = 1 (the late row's own supplier is the one
    * late supplier by construction). numwait = late line items of the
    * lone late supplier, so the count survives the aggregation. The
    * oracle twin deliberately stays in the textbook EXISTS/NOT EXISTS
    * form — DuckDB independently validates the rewrite, not a copy of
    * it. Orders ('F' filter) joins the aggregated table, and the
    * supplier×nation dimension broadcasts. */
  def sqlQ21(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("late_rows"))
    val w = Window.partitionBy("l_orderkey")
    val lone = perSupp
      // one projection -> ONE Window operator for both per-order counts
      // (the two withColumn forms planned as two stacked Windows)
      .select(col("*"), count(lit(1)).over(w).as("nsupp"),
        sum(when(col("late_rows") > 0, 1L).otherwise(0L)).over(w).as("nlate"))
      .filter(col("late_rows") > 0 && col("nsupp") > 1 && col("nlate") === 1)
    val sn = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    lone
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey")), "l_orderkey")
      .join(broadcast(sn), "l_suppkey")
      .groupBy(col("s_name"))
      .agg(sum(col("late_rows")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Classic EXISTS/NOT-EXISTS form; lineitem re-aliased through a CTE
    * (the inliner appends `AS lineitem`, so direct `lineitem l1` aliases
    * can't be used). */
  val sqlQ21Sql: String =
    """WITH l AS (SELECT * FROM lineitem),
      |     f AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
      |     sn AS (SELECT s_suppkey, s_name FROM supplier
      |            JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7')
      |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM l l1
      |JOIN f ON l1.l_orderkey = f.o_orderkey
      |JOIN sn ON l1.l_suppkey = sn.s_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey
      |              AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey
      |                  AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // --- TPC-H Q4 shape (order priority checking) -----------------------------
  /** Q4 adapted to the fixture (no commit/receipt dates → "problem
    * order" = some line item shipped more than 60 days after the order
    * date): orders in one quarter with at least one such line item,
    * counted per priority. The shape of interest is the correlated
    * EXISTS carrying a NON-EQUI predicate across the two tables
    * (l_shipdate > o_orderdate + 60d) — Spark plans it as a left-semi
    * join with the range condition attached to the equi-join on
    * orderkey, so the fact table crosses exactly one exchange and no
    * row multiplies. */
  def sqlQ4(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(expr("o_orderdate >= TIMESTAMP '1996-01-01'") &&
        expr("o_orderdate < TIMESTAMP '1996-04-01'"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  val sqlQ4Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- TPC-H Q16 shape (supplier count minus a NOT-IN blacklist) ------------
  /** Q16 adapted to the fixture: the part-supplier relation is derived
    * from lineitem (the fixture carries no partsupp table), and the
    * blacklist subquery is negative-balance suppliers (no s_comment
    * column). The topology is the point: distinct supplier counting per
    * part attribute bucket AFTER a NOT IN subquery — Spark-first that is
    * a broadcast left-anti join (the blacklist is provably tiny; NOT IN
    * is safe to plan as anti because s_suppkey is non-null), a distinct
    * projection of the fact table, and a broadcast dimension join, so
    * the only fact-scale exchanges are the distinct and the final
    * count-distinct aggregation. */
  def sqlQ16(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val blacklist = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("l_suppkey"))
    val partDim = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#2" && !col("p_type").like("ECONOMY%") &&
        col("p_size").isin(5, 11, 28))
      .select(col("p_partkey").as("l_partkey"),
        col("p_brand"), col("p_type"), col("p_size"))
    ps.join(broadcast(blacklist), Seq("l_suppkey"), "left_anti")
      .join(broadcast(partDim), "l_partkey")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val sqlQ16Sql: String =
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size,
      |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM ps JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#2'
      |  AND p_type NOT LIKE 'ECONOMY%'
      |  AND p_size IN (5, 11, 28)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --- TPC-H Q15 shape (top supplier via scalar subquery) -------------------
  /** Q15: the supplier(s) whose quarter revenue EQUALS the maximum — the
    * scalar-subquery-over-an-aggregate topology (the classic uses a
    * view; the subquery form is the same plan). Spark-first: the revenue
    * aggregate is computed once, its one-row max broadcast back over
    * itself (a one-row BNLJ, the tfidf_terms N pattern), and equality on
    * the DECIMAL-derived double is exact because both sides come from
    * the same order-independent accumulation. Supplier dim broadcasts. */
  def sqlQ15(spark: SparkSession, dir: String): DataFrame = {
    val revExpr = "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
    val rev = Tables.lineitem(spark, dir)
      .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
        "l_shipdate < TIMESTAMP '1996-04-01'"))
      .groupBy(col("l_suppkey"))
      .agg(expr(revExpr).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val sqlQ15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |              AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // --- TPC-H Q22 shape (dormant high-balance customers) ---------------------
  /** Q22 adapted to the fixture (no phone column → the country bucket is
    * c_nationkey mod 5; "never ordered" → no order since 2000, which the
    * fixture's order-date range makes selective): customers with
    * above-average positive balance and no recent order, rolled up per
    * bucket. The topology is the point: a scalar AVG subquery (one-row
    * broadcast; the average is DECIMAL-summed then divided once, so the
    * threshold is bit-identical in both engines) plus a NOT EXISTS
    * anti-join against the fact table. */
  def sqlQ22(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((expr("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)")
        / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(expr("o_orderdate >= TIMESTAMP '2000-01-01'"))
      .select(col("o_custkey").as("c_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, Seq("c_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 5).as("cntry_grp"))
      .agg(count(lit(1)).as("numcust"),
        expr("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)").as("totacctbal"))
      .orderBy(col("cntry_grp"))
  }

  // --- TPC-H Q12 shape (priority counts by line status) ---------------------
  /** Q12 adapted (no shipmode column → l_linestatus carries the grouping
    * role): per status, how many of a quarter's line items belong to
    * high-priority orders vs the rest — the join + dual conditional-sum
    * shape. The priority split is computed in ONE pass over the joined
    * quarter (two `sum(case)` aggregates, no second scan or self-join). */
  def sqlQ12(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
        "l_shipdate < TIMESTAMP '1996-04-01'"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        "l_orderkey")
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))

  val sqlQ12Sql: String =
    """SELECT l_linestatus,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // --- TPC-H Q14 shape (promo revenue share) --------------------------------
  /** Q14: the share of one month's revenue from PROMO-typed parts — the
    * conditional-numerator / total-denominator ratio in ONE aggregation
    * (no second pass; the part dimension broadcasts into the month
    * scan). Both sums accumulate DECIMAL(18,2) (order-independent), so
    * the final division is identical IEEE on identical inputs. */
  def sqlQ14(spark: SparkSession, dir: String): DataFrame = {
    val revTerm = "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    Tables.lineitem(spark, dir)
      .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
        "l_shipdate < TIMESTAMP '1996-02-01'"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey").as("l_partkey"), col("p_type"))), "l_partkey")
      .agg(
        expr(s"CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $revTerm " +
          s"ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)").as("promo_rev"),
        expr(s"CAST(sum($revTerm) AS DOUBLE)").as("total_rev"))
      .select(
        (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_revenue_pct"),
        col("promo_rev"), col("total_rev"))
  }

  val sqlQ14Sql: String =
    """SELECT 100.0 * promo_rev / total_rev AS promo_revenue_pct,
      |       promo_rev, total_rev
      |FROM (
      |  SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_rev,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |              AS DOUBLE) AS total_rev
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-02-01'
      |)""".stripMargin

  // --- winsorized moments ---------------------------------------------------
  /** Winsorized mean/stddev of extended price per line status: values
    * clamp to their group's [p05, p95] band before the moments — the
    * robust-statistics middle ground between raw moments (outlier-
    * dominated) and [[medianIqr]] (discards magnitude entirely). Two
    * passes: the per-group quantile bounds (a handful of rows, broadcast
    * back), then the clamped DECIMAL-quantized moment accumulation —
    * the eventsZscore contract exactly (scale-6 re-quantization before
    * the double cast, precision 38, variance clamped ≥ 0), so mean and
    * sd are bit-identical across engines. At 100 TB the bounds pass
    * swaps to approx_percentile in place. */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    // widenedBy (guide §2.5): the EXACT percentile partial buffers every
    // value of its partition, and the fixture scan is one partition —
    // keyed widening (hash on the value column; keyless repartition
    // would sort the scan first) builds cluster-width partial buffers
    // instead of one serial 600k-value collect. Projected to the two
    // columns first so the exchange moves only what the query reads.
    // No-op at production scan widths.
    val li = Tables.widenedBy(Tables.lineitem(spark, dir)
      .select(col("l_linestatus"), col("l_extendedprice")), col("l_extendedprice"))
    val qs = li
      .groupBy(col("l_linestatus"))
      .agg(expr("percentile(l_extendedprice, array(0.05D, 0.95D))").as("q"))
      .select(col("l_linestatus"),
        element_at(col("q"), 1).as("lo"), element_at(col("q"), 2).as("hi"))
    li
      .join(broadcast(qs), "l_linestatus")
      // winsorize to INTEGER dollars: relative to a p05/p95 clamp the
      // cent digits are noise, and integer quantization is what makes
      // the moments exactly portable — every downstream value (v, v*v,
      // both sums) is then an exact integer decimal: no scale reduction
      // (whose rounding mode differs between engines: Spark half-up,
      // DuckDB truncating) and no backing integer past 2^53 (the
      // decimal->double double-rounding trap) anywhere in the plan.
      // Exactness bound: ss stays under 2^53 through ~1e9 rows per group
      // at these magnitudes; past that, shift the clamp to coarser units
      // (the same trade at the next decade)
      .withColumn("v", expr(
        "cast(round(least(greatest(l_extendedprice, lo), hi), 0) as decimal(18,0))"))
      .groupBy(col("l_linestatus"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(v) as double)").as("s"),
        expr("cast(sum(v * v) as double)").as("ss"))
      .select(col("l_linestatus"), col("n"), col("lo"), col("hi"),
        (col("s") / col("n")).as("w_mean"),
        sqrt(greatest((col("ss") - col("s") * col("s") / col("n")) / col("n"),
          lit(0.0))).as("w_sd"))
      .orderBy(col("l_linestatus"))
  }

  val winsorizedStatsSql: String =
    """WITH qs AS (
      |  SELECT l_linestatus,
      |         quantile_cont(l_extendedprice, 0.05) AS lo,
      |         quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY 1
      |), v AS (
      |  SELECT l_linestatus, lo, hi,
      |         CAST(round(least(greatest(l_extendedprice, lo), hi), 0)
      |              AS DECIMAL(18,0)) AS v
      |  FROM lineitem JOIN qs USING (l_linestatus)
      |), m AS (
      |  SELECT l_linestatus, lo, hi, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(v) AS DOUBLE) AS s,
      |         -- one operand widened so the exact integer product fits
      |         -- precision 38 without DuckDB's silent DOUBLE fallback
      |         CAST(sum(CAST(v AS DECIMAL(19,0)) * v) AS DOUBLE) AS ss
      |  FROM v GROUP BY 1, 2, 3
      |)
      |SELECT l_linestatus, n, lo, hi,
      |       s / n AS w_mean,
      |       sqrt(greatest((ss - s * s / n) / n, 0)) AS w_sd
      |FROM m
      |ORDER BY l_linestatus""".stripMargin

  // --- RFM customer segmentation --------------------------------------------
  /** Classic recency/frequency/monetary segmentation, built
    * SCALE-CORRECTLY: the quintile boundaries come from ONE exact
    * percentile aggregate broadcast back over the customer base — NOT
    * from `ntile(5) OVER (ORDER BY metric)`, which is a global sort into
    * a single window partition (the exact hazard PlanGuardSpec exists
    * for; at 100 TB the percentile pass swaps to approx_percentile in
    * place). Scores are threshold-rank comparisons (strict > on both
    * engines; the percentile doubles are bit-identical per the
    * median_iqr contract, monetary accumulates DECIMAL), recency counts
    * days from each customer's last order to the corpus's last date.
    * Segments follow the standard r×f grid. */
  def customerRfm(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("monetary"))
    val corpusMax = Tables.orders(spark, dir)
      .agg(max(col("o_orderdate")).as("corpus_last"))
    // materialized ONCE: both the threshold pass and the scoring pass
    // read the per-customer metrics, and without this the whole orders
    // aggregation subtree (corpus-scale) would be computed twice — the
    // same cache-the-reduced-table discipline as the ANN trainers
    val withR = base.crossJoin(broadcast(corpusMax))
      .select(col("c_custkey"),
        datediff(col("corpus_last"), col("last_order")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
      .localCheckpoint(true)
    val cuts = withR.agg(
      expr("percentile(recency_days, array(0.2D, 0.4D, 0.6D, 0.8D))").as("rq"),
      expr("percentile(frequency, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fq"),
      expr("percentile(monetary, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mq"))
    def rank(v: String, q: String): org.apache.spark.sql.Column =
      (lit(1L) + (0 until 4).map(i =>
        when(col(v) > element_at(col(q), i + 1), 1L).otherwise(0L)).reduce(_ + _))
    withR.crossJoin(broadcast(cuts))
      .withColumn("r_score", lit(6L) - rank("recency_days", "rq"))
      .withColumn("f_score", rank("frequency", "fq"))
      .withColumn("m_score", rank("monetary", "mq"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 3 && col("f_score") >= 4, "loyal")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "recent")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("regular"))
      .select(col("c_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        col("segment"))
      .orderBy(col("c_custkey"))
  }

  val customerRfmSql: String =
    """WITH base AS (
      |  SELECT o_custkey AS c_custkey, max(o_orderdate) AS last_order,
      |         CAST(count(*) AS BIGINT) AS frequency,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY 1
      |), withr AS (
      |  SELECT c_custkey,
      |         CAST(date_diff('day', last_order,
      |                        (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS recency_days,
      |         frequency, monetary
      |  FROM base
      |), cuts AS (
      |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rq,
      |         quantile_cont(frequency,    [0.2, 0.4, 0.6, 0.8]) AS fq,
      |         quantile_cont(monetary,     [0.2, 0.4, 0.6, 0.8]) AS mq
      |  FROM withr
      |), scored AS (
      |  SELECT c_custkey, recency_days, frequency, monetary,
      |         6 - (1 + CAST(recency_days > rq[1] AS INT) + CAST(recency_days > rq[2] AS INT)
      |                + CAST(recency_days > rq[3] AS INT) + CAST(recency_days > rq[4] AS INT))
      |           AS r_score,
      |         1 + CAST(frequency > fq[1] AS INT) + CAST(frequency > fq[2] AS INT)
      |           + CAST(frequency > fq[3] AS INT) + CAST(frequency > fq[4] AS INT) AS f_score,
      |         1 + CAST(monetary > mq[1] AS INT) + CAST(monetary > mq[2] AS INT)
      |           + CAST(monetary > mq[3] AS INT) + CAST(monetary > mq[4] AS INT) AS m_score
      |  FROM withr CROSS JOIN cuts
      |)
      |SELECT c_custkey, recency_days, frequency, monetary,
      |       CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
      |       CAST(m_score AS BIGINT) AS m_score,
      |       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
      |            WHEN r_score >= 3 AND f_score >= 4 THEN 'loyal'
      |            WHEN r_score >= 4 AND f_score <= 2 THEN 'recent'
      |            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
      |            ELSE 'regular' END AS segment
      |FROM scored
      |ORDER BY c_custkey""".stripMargin

  val sqlQ22Sql: String =
    """SELECT c_nationkey % 5 AS cntry_grp, CAST(count(*) AS BIGINT) AS numcust,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |                          / count(*)
      |                   FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY 1
      |ORDER BY cntry_grp""".stripMargin

  // --- approx-percentile production variants --------------------------------
  /** [[winsorizedStats]] with the documented at-scale swap actually
    * shipped: the clamp bounds come from `approx_percentile` (KLL-style
    * sketch, one pass, bounded memory — no per-group sort), and the
    * moments computed under the APPROX clamp ride next to the exact
    * ones as bound booleans. The emitted columns are the exact-side
    * values (deterministic, hash-checked) plus the booleans — the
    * Sketches bound-oracle contract: the oracle recomputes the exact
    * side and pins each boolean `true`, so the sketch's accuracy is
    * itself under test. Bounds: approx p05/p95 within 1% of exact (or
    * a dollar, for near-zero tails); approx-clamp mean within 1%, sd
    * within 5% — an order of magnitude looser than observed, an order
    * tighter than useless.
    *
    * Scale shape: this is a CHECK-ONLY query (docs/SCALE.md §Check-only):
    * it runs both arms, so it inherits the exact arm's per-group value
    * buffer — never ship it to a 100× run. The production form is
    * [[winsorizedStatsSketch]] — a library function, deliberately NOT in
    * the SparkEntry registry (no engine-independent oracle exists for a
    * sketch value; SketchOnlySpec covers it): one sketch aggregate + one
    * clamped moment pass, no sort at any scale. */
  def winsorizedStatsApprox(spark: SparkSession, dir: String): DataFrame = {
    // widenedBy: the exact-percentile arm buffers every partition value
    // in its partial (see winsorizedStats); both passes share the frame
    val li = Tables.widenedBy(Tables.lineitem(spark, dir)
      .select(col("l_linestatus"), col("l_extendedprice")), col("l_extendedprice"))
    val qs = li
      .groupBy(col("l_linestatus"))
      .agg(expr("percentile(l_extendedprice, array(0.05D, 0.95D))").as("q"),
        expr("approx_percentile(l_extendedprice, array(0.05D, 0.95D), 10000)")
          .as("qa"))
      .select(col("l_linestatus"),
        element_at(col("q"), 1).as("lo"), element_at(col("q"), 2).as("hi"),
        element_at(col("qa"), 1).cast("double").as("lo_a"),
        element_at(col("qa"), 2).cast("double").as("hi_a"))
    def clamped(lo: String, hi: String) = expr(
      s"cast(round(least(greatest(l_extendedprice, $lo), $hi), 0) as decimal(18,0))")
    def near(a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column,
             rel: Double) =
      abs(a - e) <= greatest(abs(e) * lit(rel), lit(1.0))
    li
      .join(broadcast(qs), "l_linestatus")
      .withColumn("v", clamped("lo", "hi"))
      .withColumn("va", clamped("lo_a", "hi_a"))
      .groupBy(col("l_linestatus"), col("lo"), col("hi"),
        col("lo_a"), col("hi_a"))
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(v) as double)").as("s"),
        expr("cast(sum(v * v) as double)").as("ss"),
        expr("cast(sum(va) as double)").as("sa"),
        expr("cast(sum(va * va) as double)").as("ssa"))
      .select(col("l_linestatus"), col("n"), col("lo"), col("hi"),
        (col("s") / col("n")).as("w_mean"),
        sqrt(greatest((col("ss") - col("s") * col("s") / col("n")) / col("n"),
          lit(0.0))).as("w_sd"),
        col("lo_a"), col("hi_a"), col("sa"), col("ssa"))
      .select(col("l_linestatus"), col("n"), col("lo"), col("hi"),
        col("w_mean"), col("w_sd"),
        (near(col("lo_a"), col("lo"), 0.01) &&
          near(col("hi_a"), col("hi"), 0.01)).as("bounds_within_1pct"),
        near(col("sa") / col("n"), col("w_mean"), 0.01).as("mean_within_1pct"),
        near(sqrt(greatest((col("ssa") - col("sa") * col("sa") / col("n"))
          / col("n"), lit(0.0))), col("w_sd"), 0.05).as("sd_within_5pct"))
      .orderBy(col("l_linestatus"))
  }

  /** The production form of winsorized stats at 100 TB — sketch arm ONLY.
    * One `approx_percentile` aggregate (KLL-style sketch, bounded memory,
    * no per-group value buffer) produces the clamp bounds; a broadcast
    * join feeds one clamped-moment pass. Two scans, zero sorts,
    * executor memory independent of group size. Values are within the
    * tolerances [[winsorizedStatsApprox]] pins against the exact arm, but
    * not bit-reproducible in other engines — so it is deliberately NOT a
    * registered oracle query: the dual-arm check query proves the sketch's
    * accuracy, and SketchOnlySpec proves this plan carries no exact
    * percentile aggregate. */
  def winsorizedStatsSketch(spark: SparkSession, dir: String): DataFrame = {
    val qs = Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.05D, 0.95D), 10000)")
        .as("qa"))
      .select(col("l_linestatus"),
        element_at(col("qa"), 1).cast("double").as("lo"),
        element_at(col("qa"), 2).cast("double").as("hi"))
    Tables.lineitem(spark, dir)
      .select(col("l_linestatus"), col("l_extendedprice"))
      .join(broadcast(qs), "l_linestatus")
      .withColumn("v",
        expr("cast(round(least(greatest(l_extendedprice, lo), hi), 0) as decimal(18,0))"))
      .groupBy(col("l_linestatus"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(v) as double)").as("s"),
        expr("cast(sum(v * v) as double)").as("ss"))
      .select(col("l_linestatus"), col("n"), col("lo"), col("hi"),
        (col("s") / col("n")).as("w_mean"),
        sqrt(greatest((col("ss") - col("s") * col("s") / col("n")) / col("n"),
          lit(0.0))).as("w_sd"))
      .orderBy(col("l_linestatus"))
  }

  val winsorizedStatsApproxSql: String =
    """WITH qs AS (
      |  SELECT l_linestatus,
      |         quantile_cont(l_extendedprice, 0.05) AS lo,
      |         quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY 1
      |), v AS (
      |  SELECT l_linestatus, lo, hi,
      |         CAST(round(least(greatest(l_extendedprice, lo), hi), 0)
      |              AS DECIMAL(18,0)) AS v
      |  FROM lineitem JOIN qs USING (l_linestatus)
      |), m AS (
      |  SELECT l_linestatus, lo, hi, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(v) AS DOUBLE) AS s,
      |         CAST(sum(CAST(v AS DECIMAL(19,0)) * v) AS DOUBLE) AS ss
      |  FROM v GROUP BY 1, 2, 3
      |)
      |SELECT l_linestatus, n, lo, hi,
      |       s / n AS w_mean,
      |       sqrt(greatest((ss - s * s / n) / n, 0)) AS w_sd,
      |       true AS bounds_within_1pct,
      |       true AS mean_within_1pct,
      |       true AS sd_within_5pct
      |FROM m
      |ORDER BY l_linestatus""".stripMargin

  /** [[customerRfm]]'s quintile-cut pass with the at-scale
    * `approx_percentile` swap shipped and CHECKED: one combined
    * aggregate computes the exact and sketch cuts for all three RFM
    * metrics, and the query emits the 12 (metric, quintile) cells with
    * the exact cut plus a bound boolean. Per-customer scores are NOT
    * re-emitted here — a cut moving by one neighboring value can
    * legitimately flip boundary customers, so the stable contract is
    * the cuts themselves (the exact scores stay pinned by
    * [[customerRfm]]). Tolerance: 1% relative or 1.0 absolute,
    * whichever is larger — the absolute arm covers the discrete
    * metrics (frequency in single digits, recency in days) where the
    * exact interpolated quantile falls between two adjacent data
    * values and the sketch must return one of them. */
  def customerRfmApprox(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)").as("monetary"))
    val corpusMax = Tables.orders(spark, dir)
      .agg(max(col("o_orderdate")).as("corpus_last"))
    val withR = base.crossJoin(broadcast(corpusMax))
      .select(col("c_custkey"),
        datediff(col("corpus_last"), col("last_order")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
    val cuts = withR.agg(
      expr("percentile(recency_days, array(0.2D, 0.4D, 0.6D, 0.8D))").as("rq"),
      expr("percentile(frequency, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fq"),
      expr("percentile(monetary, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mq"),
      expr("approx_percentile(recency_days, array(0.2D, 0.4D, 0.6D, 0.8D), 10000)").as("rqa"),
      expr("approx_percentile(frequency, array(0.2D, 0.4D, 0.6D, 0.8D), 10000)").as("fqa"),
      expr("approx_percentile(monetary, array(0.2D, 0.4D, 0.6D, 0.8D), 10000)").as("mqa"))
    val cells = for {
      (m, e, a) <- Seq(("recency", "rq", "rqa"), ("frequency", "fq", "fqa"),
        ("monetary", "mq", "mqa"))
      i <- 1 to 4
    } yield {
      val exact = element_at(col(e), i)
      struct(lit(m).as("metric"), lit(i * 2).cast("int").as("quintile_x10"),
        exact.as("cut_exact"),
        (abs(element_at(col(a), i).cast("double") - exact) <=
          greatest(abs(exact) * lit(0.01), lit(1.0))).as("within_tol"))
    }
    cuts.select(explode(array(cells: _*)).as("c"))
      .select(col("c.metric"), col("c.quintile_x10"), col("c.cut_exact"),
        col("c.within_tol"))
      .orderBy(col("metric"), col("quintile_x10"))
  }

  val customerRfmApproxSql: String =
    """WITH base AS (
      |  SELECT o_custkey AS c_custkey, max(o_orderdate) AS last_order,
      |         CAST(count(*) AS BIGINT) AS frequency,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY 1
      |), withr AS (
      |  SELECT c_custkey,
      |         CAST(date_diff('day', last_order,
      |                        (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS recency_days,
      |         frequency, monetary
      |  FROM base
      |), qarr AS (
      |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rq,
      |         quantile_cont(frequency,    [0.2, 0.4, 0.6, 0.8]) AS fq,
      |         quantile_cont(monetary,     [0.2, 0.4, 0.6, 0.8]) AS mq
      |  FROM withr
      |), cells AS (
      |  SELECT 'recency' AS metric, i, rq[i] AS cut_exact
      |  FROM qarr, (SELECT unnest([1, 2, 3, 4]) AS i)
      |  UNION ALL
      |  SELECT 'frequency', i, fq[i]
      |  FROM qarr, (SELECT unnest([1, 2, 3, 4]) AS i)
      |  UNION ALL
      |  SELECT 'monetary', i, mq[i]
      |  FROM qarr, (SELECT unnest([1, 2, 3, 4]) AS i)
      |)
      |SELECT metric, CAST(i * 2 AS INT) AS quintile_x10, cut_exact,
      |       true AS within_tol
      |FROM cells
      |ORDER BY metric, quintile_x10""".stripMargin

  // --- TPC-H Q17 shape (small-quantity-order revenue) -----------------------
  /** Q17 adapted to the fixture (no container column → the brand filter
    * alone plays the small-dimension role): yearly-averaged revenue from
    * line items whose quantity is below 20 % of that part's own average.
    * The classic form is a correlated scalar AVG subquery per part;
    * Spark-first that decorrelates into ONE lineitem scan — the brand
    * dimension broadcast-semi-joins the scan down to qualifying parts,
    * then a window over `l_partkey` computes each part's average in
    * place, so the per-part aggregate never becomes a second scan or a
    * self-join. The oracle keeps the literal correlated form, so the
    * rewrite is independently validated. The average is DECIMAL-summed
    * then divided once (count from the same window), keeping the
    * threshold bit-identical across engines. */
  def sqlQ17(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey").as("l_partkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(parts), "l_partkey")
      .withColumn("part_avg_qty",
        sum(expr("CAST(l_quantity AS DECIMAL(18,2))")).over(w).cast("double")
          / count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("part_avg_qty"))
      .agg((expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
        / lit(7.0)).as("avg_yearly"))
  }

  // aliased re-reads of the fixture go through a CTE (Verify's inliner
  // appends `AS lineitem`, so a direct `lineitem l2` would not parse)
  val sqlQ17Sql: String =
    """WITH li AS (SELECT * FROM lineitem)
      |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
      |         AS avg_yearly
      |FROM li JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#13'
      |  AND l_quantity < 0.2 * (
      |    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |             / count(*)
      |    FROM li l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  // --- TPC-H Q20 shape (suppliers with excess part availability) ------------
  /** Q20 adapted to the fixture (no partsupp table or availqty column →
    * the partsupp relation is derived from lineitem as in [[sqlQ16]],
    * and "excess availability" becomes: the pair shipped MORE than half
    * its all-time volume inside the target year (1996) — non-vacuous, since the
    * year's volume is a strict subset of all-time). The topology is the
    * point: an IN-subquery over an aggregated partsupp with a nested
    * part-name IN filter and a correlated per-pair scalar aggregate.
    * Spark-first, both per-pair aggregates (year window and all-time)
    * come out of ONE lineitem scan as conditional sums in a single
    * groupBy — no correlated re-scan, no self-join — then the part
    * filter broadcast-semi-joins, the surviving suppkeys semi-join the
    * supplier dim, and the nation dim broadcasts. The oracle keeps the
    * literal nested-correlated form. */
  def sqlQ20(spark: SparkSession, dir: String): DataFrame = {
    val forestParts = Tables.part(spark, dir)
      .filter(col("p_name").like("large%"))
      .select(col("p_partkey").as("l_partkey"))
    // broadcast the selective part filter BELOW the aggregation (guide
    // §3.2 "reduce the big side before shuffling it"): only forest
    // parts' groups are ever consumed, the filter commutes with the
    // (l_partkey, l_suppkey) groupBy, and the semi-join drops ~88 % of
    // lineitem rows before the aggregation exchange (measured 600k→73k
    // at sf0.1). Result is identical — the oracle keeps the post-agg
    // IN-subquery shape.
    val excess = Tables.lineitem(spark, dir)
      .join(broadcast(forestParts), Seq("l_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        expr("CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' AND " +
          "l_shipdate < TIMESTAMP '1997-01-01' " +
          "THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)").as("year_qty"),
        expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("total_qty"))
      .filter(coalesce(col("year_qty"), lit(0.0)) > lit(0.5) * col("total_qty"))
      .select(col("l_suppkey").as("s_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(excess, Seq("s_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)
        .filter(col("n_name") === "NATION_19")
        .select(col("n_nationkey").as("s_nationkey"))), "s_nationkey")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name"), col("s_suppkey"))
  }

  // same CTE re-alias rule as sqlQ17Sql for the correlated lineitem re-read
  val sqlQ20Sql: String =
    """WITH li AS (SELECT * FROM lineitem)
      |SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_19'
      |  AND s_suppkey IN (
      |    SELECT ps.l_suppkey
      |    FROM (SELECT l_partkey, l_suppkey,
      |                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |                   AS year_qty
      |          FROM li
      |          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |            AND l_shipdate < TIMESTAMP '1997-01-01'
      |          GROUP BY 1, 2) ps
      |    WHERE ps.l_partkey IN
      |            (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
      |      AND ps.year_qty > 0.5 * (
      |        SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |        FROM li l2
      |        WHERE l2.l_partkey = ps.l_partkey AND l2.l_suppkey = ps.l_suppkey))
      |ORDER BY s_name, s_suppkey""".stripMargin
}
