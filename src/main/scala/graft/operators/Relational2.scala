package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third-wave relational coverage: ordered string aggregation (listagg),
  * bitwise/boolean aggregates, the TPC-H Q18 plan shape (agg → HAVING →
  * fact join), unpivot/stack (the inverse of the pivot query), a JSON
  * build-and-extract round trip (the reference's `message` column is a
  * JSON document — SURVEY §2.8 X1), and a time-range pair join executed
  * as a bucketed equi-join (the scale-safe form of an interval join).
  */
object Relational2 {

  // --- listagg / string_agg -------------------------------------------------
  /** Distinct order statuses per priority as one ordered comma-joined
    * string. Both engines sort the elements (WITHIN GROUP / ORDER BY), so
    * the concatenation is deterministic under any shuffle order. */
  def listaggStatus(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderpriority,
        |       listagg(DISTINCT o_orderstatus, ',')
        |         WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val listaggStatusSql: String =
    """SELECT o_orderpriority,
      |       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      |       count(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --- bitwise / boolean aggregates ----------------------------------------
  def bitboolAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("bit_and(user_id)").as("users_bit_and"),
        expr("bit_or(user_id)").as("users_bit_or"),
        expr("bit_xor(user_id)").as("users_bit_xor"),
        expr("bool_and(user_id % 2 = 0)").as("all_even"),
        expr("bool_or(user_id % 2 = 0)").as("any_even"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  val bitboolAggsSql: String =
    """SELECT event_type,
      |       bit_and(user_id) AS users_bit_and,
      |       bit_or(user_id) AS users_bit_or,
      |       bit_xor(user_id) AS users_bit_xor,
      |       bool_and(user_id % 2 = 0) AS all_even,
      |       bool_or(user_id % 2 = 0) AS any_even,
      |       count(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- TPC-H Q18 shape: aggregate → HAVING → join back to facts ------------
  /** Large-quantity orders: per-order quantity totals filtered by HAVING,
    * then joined to orders and customer for context. The aggregation runs
    * FIRST so only qualifying orderkeys (a tiny fraction) reach the joins —
    * the shape that keeps this plan linear at 100 TB. */
  def q18Having(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("total_qty"))
      .filter(col("total_qty") > 300.0)
    big
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18HavingSql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0
      |)
      |SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
      |FROM big
      |JOIN orders   ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // --- unpivot (stack): wide → long, the inverse of pivot_status -----------
  /** Per-priority conditional counts unpivoted into (priority, status, n)
    * rows via `stack` — one Expand node, no join, no second scan. */
  def unpivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("F"),
        count(when(col("o_orderstatus") === "O", 1)).as("O"),
        count(when(col("o_orderstatus") === "P", 1)).as("P"))
      .selectExpr("o_orderpriority",
        "stack(3, 'F', F, 'O', O, 'P', P) AS (status, n)")
      .orderBy(col("o_orderpriority"), col("status"))

  val unpivotStatusSql: String =
    """WITH wide AS (
      |  SELECT o_orderpriority,
      |         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
      |         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
      |         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n
      |  FROM orders GROUP BY o_orderpriority
      |)
      |SELECT o_orderpriority, status, n FROM (
      |  SELECT o_orderpriority, 'F' AS status, f_n AS n FROM wide
      |  UNION ALL SELECT o_orderpriority, 'O', o_n FROM wide
      |  UNION ALL SELECT o_orderpriority, 'P', p_n FROM wide
      |)
      |ORDER BY o_orderpriority, status""".stripMargin

  // --- JSON build + path extraction round trip ------------------------------
  /** Serialize a struct to a JSON document, then extract fields back by
    * path — the reference's `message` JSON column lifecycle (SURVEY X1)
    * in one query. Field set is int/string only so both engines render
    * the identical compact document. */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        to_json(struct(col("o_orderkey").as("k"), col("o_orderstatus").as("s"))).as("doc"))
      .select(col("o_orderkey"), col("doc"),
        get_json_object(col("doc"), "$.s").as("status_back"),
        get_json_object(col("doc"), "$.k").cast("long").as("key_back"))
      .orderBy(col("o_orderkey"))

  val jsonFuncsSql: String =
    """SELECT o_orderkey, doc,
      |       json_extract_string(doc, '$.s') AS status_back,
      |       CAST(json_extract_string(doc, '$.k') AS BIGINT) AS key_back
      |FROM (
      |  SELECT o_orderkey,
      |         to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS doc
      |  FROM orders
      |)
      |ORDER BY o_orderkey""".stripMargin

  // --- multiset EXCEPT ALL ----------------------------------------------------
  /** Bag-semantics difference: each occurrence counts, so a supplier key
    * appearing 5 times on the left and twice on the right survives 3
    * times — the semantics a pipeline needs when row multiplicity IS the
    * signal (e.g. subtracting an already-exported batch). Output is
    * aggregated per key so the multiset result is order-free. */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.lineitem(spark, dir).filter(col("l_quantity") > 40)
      .select(col("l_suppkey").as("k"))
    val b = Tables.lineitem(spark, dir).filter(col("l_discount") > 0.08)
      .select(col("l_suppkey").as("k"))
    a.exceptAll(b)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_surviving"))
      .orderBy(col("k"))
  }

  val setExceptAllSql: String =
    """SELECT k, count(*) AS n_surviving FROM (
      |  SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 40
      |  EXCEPT ALL
      |  SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08
      |)
      |GROUP BY k
      |ORDER BY k""".stripMargin

  // --- GROUPING() markers on rollup ------------------------------------------
  /** Rollup with explicit GROUPING() flags: the standard way downstream
    * consumers distinguish "NULL because subtotal" from "NULL in the
    * data" — rollup_pricing's coalesce trick works only when the data has
    * no NULLs; the flags are the general contract. */
  def rollupGrouping(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT coalesce(o_orderstatus, '(all)') AS s,
        |       coalesce(o_orderpriority, '(all)') AS p,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |       count(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY s, p""".stripMargin)
  }

  val rollupGroupingSql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS s,
      |       coalesce(o_orderpriority, '(all)') AS p,
      |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
      |       count(*) AS n
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY s, p""".stripMargin

  // --- VARIANT semi-structured access ----------------------------------------
  /** Spark 4 VARIANT for truly dynamic documents: parse once, extract
    * typed values by path — the modern form of the reference's JSON
    * `message` column when the schema is NOT known up front (from_json
    * with a StructType, used everywhere else, is the known-schema path).
    * The oracle reads the same paths with DuckDB's JSON functions. */
  def variantFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(col("event_id"),
        expr("CAST(variant_get(v, '$.k', 'int') AS INT)").as("k_typed"),
        expr("variant_get(v, '$.missing', 'string')").as("absent"))
      .orderBy(col("event_id"))

  val variantFuncsSql: String =
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
      |       json_extract_string(props, '$.missing') AS absent
      |FROM events
      |ORDER BY event_id""".stripMargin

  // --- fixed-width histogram -------------------------------------------------
  /** Price distribution as a 10-bucket fixed-width histogram: one scan,
    * one aggregation keyed on the computed bucket (bounded cardinality at
    * any scale — the reason fixed-width beats exact quantiles for
    * monitoring dashboards). Engine-neutral arithmetic (floor + least)
    * instead of width_bucket so the bucket edges are identical in the
    * oracle. */
  /** Default bucket width; shared with the oracle SQL below so a
    * non-default call site cannot silently diverge from the DuckDB twin. */
  val PriceHistogramWidth: Double = 10000.0

  def priceHistogram(spark: SparkSession, dir: String, width: Double = PriceHistogramWidth): DataFrame =
    Tables.lineitem(spark, dir)
      .select(least(floor(col("l_extendedprice") / width), lit(9)).cast("int").as("bucket"),
        col("l_extendedprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy(col("bucket"))

  val priceHistogramSql: String =
    s"""SELECT CAST(least(floor(l_extendedprice / $PriceHistogramWidth), 9) AS INT) AS bucket,
      |       count(*) AS n,
      |       min(l_extendedprice) AS lo,
      |       max(l_extendedprice) AS hi
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // --- time-range pair join via bucketing -----------------------------------
  /** Pairs of events from different users within ±2 minutes of each other,
    * counted per user pair. The |Δt| ≤ W predicate is NOT an equi-join, so
    * a naive formulation is a cross join; the scale-safe plan buckets time
    * into W-sized cells, replicates ONE side to its three adjacent cells
    * (bounded 3x, not O(n) like a range cross join), equi-joins on the
    * cell, and applies the exact predicate after. Any qualifying pair has
    * cell distance ≤ 1, and each pair meets in exactly one cell (the
    * unreplicated side's own), so no dedup pass is needed. The oracle
    * states the range predicate directly — same rows, different plan. */
  /** Default pairing window; shared with the oracle SQL below so a
    * non-default call site cannot silently diverge from the DuckDB twin. */
  val TimePairWindowMs: Long = 120000L

  def timePairJoin(spark: SparkSession, dir: String, windowMs: Long = TimePairWindowMs): DataFrame = {
    // ORDERED-pair formulation (r16): each unordered event pair is
    // generated exactly once as (earlier, later) — strict time order with
    // the unique event id breaking exact-ts ties — instead of the
    // symmetric both-directions join that a `u1 < u2` filter then halves.
    // Two structural savings at the sf1-dominating cost point (this was
    // the #1 bench query): the join emits HALF the matched rows, and the
    // left side explodes to 2 cells, not 3 (0 ≤ tb−ta ≤ w pins the later
    // event's anchor cell to {ca, ca+1}; a pair matches in exactly one
    // exploded cell, so no dedup pass is needed). Oracle-identical by
    // construction: the symmetric form with u1 < u2 also counts each
    // unordered distinct-user pair exactly once.
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts_ms"))
    val a = ev.withColumn("cell", explode(array(
      expr(s"ts_ms div $windowMs"), expr(s"ts_ms div $windowMs + 1"))))
    val b = ev.select(col("event_id").as("b_event_id"), col("user_id").as("b_user_id"),
      col("ts_ms").as("b_ts_ms"))
      .withColumn("cell", expr(s"b_ts_ms div $windowMs"))
    a.join(b, Seq("cell"))
      .filter(col("b_ts_ms") >= col("ts_ms") &&
        col("b_ts_ms") <= col("ts_ms") + windowMs &&
        (col("b_ts_ms") > col("ts_ms") || col("b_event_id") > col("event_id")) &&
        col("user_id") =!= col("b_user_id"))
      .select(least(col("user_id"), col("b_user_id")).as("u1"),
              greatest(col("user_id"), col("b_user_id")).as("u2"))
      .groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("n_close"))
      .orderBy(col("n_close").desc, col("u1"), col("u2"))
  }

  val timePairJoinSql: String =
    Tables.eventsOracleCte +
      """
        |SELECT a.user_id AS u1, b.user_id AS u2, count(*) AS n_close
        |FROM ev a JOIN ev b
        |  ON b.ts_ms BETWEEN a.ts_ms - TPJ_WINDOW_MS AND a.ts_ms + TPJ_WINDOW_MS
        | AND a.user_id < b.user_id
        |GROUP BY 1, 2
        |ORDER BY n_close DESC, u1, u2""".stripMargin
        .replace("TPJ_WINDOW_MS", TimePairWindowMs.toString)
}
