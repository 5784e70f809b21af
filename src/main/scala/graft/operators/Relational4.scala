package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining TPC-H topologies (Q2, Q6, Q8, Q9, Q11, Q13, Q19) adapted
  * to the fixture — with these the engine covers all 22. The fixture has no
  * partsupp table, so where the classic query needs supply cost the
  * relation is derived from lineitem as a per-(part, supplier) unit price
  * (the [[Relational3.sqlQ16]] idiom); DECIMAL-sum discipline everywhere a
  * value crosses the oracle hash.
  *
  * Scale notes common to all seven: dimension tables (part, supplier,
  * nation, region — and their filtered joins) broadcast; lineitem/orders/
  * customer joins shuffle on their keys and pre-aggregate before joining
  * wherever the aggregate shrinks the stream (Q13's orders-per-customer,
  * Q2/Q9's pair aggregation); scans carry pushed filters for every
  * single-table predicate.
  */
object Relational4 {

  private val revenueExpr =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  // --- TPC-H Q6 (forecast revenue change) -----------------------------------
  /** The simplest TPC-H shape and the purest pushdown test: one lineitem
    * scan, three scan-level predicates, one global sum. The whole WHERE
    * clause reaches the parquet reader as PushedFilters; the aggregate is
    * a map-side partial + one-row merge. */
  def sqlQ6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(expr(
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)").as("revenue"))

  val sqlQ6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin

  // --- TPC-H Q13 (customer order-count distribution) ------------------------
  /** Left join that must KEEP zero-order customers, then a distribution
    * over the counts. Spark-first the orders side aggregates BEFORE the
    * join (count per custkey — shrinks the big table to ≤1 row per
    * customer ahead of the shuffle, where the classic join-then-count
    * form shuffles every order row); the filtered-join-condition
    * semantics (priority filter inside the ON clause) become a plain
    * pre-aggregation filter. */
  def sqlQ13(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("cnt"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"))
      .join(perCust, Seq("c_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val sqlQ13Sql: String =
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey
      |)
      |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- TPC-H Q19 (disjunctive bracket predicate) ----------------------------
  /** Three (brand, size-range, quantity-range) brackets OR-ed together —
    * the classic test that an engine handles disjunctions without giving
    * up pushdown. Each side still gets a conjunctive pre-filter: the part
    * dim is cut to the union of the brand/size brackets BEFORE broadcast,
    * and the lineitem scan carries the quantity envelope (1..40) as a
    * pushed filter; the exact OR evaluates after the broadcast join on
    * the already-reduced stream. */
  def sqlQ19(spark: SparkSession, dir: String): DataFrame = {
    val b1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 21)
    val b2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
      col("l_quantity").between(10, 30)
    val b3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
      col("l_quantity").between(20, 40)
    val partDim = Tables.part(spark, dir)
      .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
      .select(col("p_partkey").as("l_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity").between(1, 40))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .join(broadcast(partDim), "l_partkey")
      .filter(b1 || b2 || b3)
      .agg(expr(s"CAST(sum($revenueExpr) AS DOUBLE)").as("revenue"))
  }

  val sqlQ19Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // --- derived partsupp (shared by Q2 / Q9) ---------------------------------
  /** The fixture's stand-in for partsupp.ps_supplycost: each (part,
    * supplier) pair's average unit price out of lineitem — one groupBy,
    * both sums DECIMAL-exact before the single double division, so the
    * derived cost is bit-identical across engines and partitionings.
    * `partFilter` (a broadcastable one-column partkey dim) applies BELOW
    * the aggregation: the filter is on a grouping key, so surviving
    * pairs' aggregates are unchanged while the groupBy runs over the
    * filtered slice only — at 100× the pair shuffle carries the '%rod'
    * fraction, not every pair. */
  private def pairCost(spark: SparkSession, dir: String,
                       partFilter: Option[DataFrame] = None): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_quantity"))
    partFilter.fold(li)(p => li.join(broadcast(p), Seq("l_partkey"), "semi"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)") /
        expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")).as("cost"))
  }

  private val pairCostCte: String =
    """ps AS (
      |  SELECT l_partkey, l_suppkey,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |           / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS cost
      |  FROM lineitem GROUP BY 1, 2
      |)""".stripMargin

  // --- TPC-H Q2 (min-cost supplier per part) --------------------------------
  /** The correlated-MIN topology: for each qualifying part, the EUROPE
    * supplier(s) achieving that part's minimum cost. Spark-first the
    * correlated subquery is a window MIN over `l_partkey` computed on the
    * part- and region-restricted pair stream — one extra shuffle on
    * partkey instead of a per-part re-scan; the region∘nation∘supplier
    * dim chain folds into one broadcast, the part filter into another. Equality on the
    * double cost is exact because both sides of the comparison are the
    * same deterministically-derived value ([[Relational3.sqlQ15]]'s
    * argument). Top-20 by a total order (acctbal desc, nation, supplier,
    * part) is a TakeOrderedAndProject — no global sort materializes. */
  def sqlQ2(spark: SparkSession, dir: String): DataFrame = {
    val eurSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val prod = Tables.part(spark, dir)
      .filter(col("p_name").like("%rod") && col("p_size").between(1, 50))
      .select(col("p_partkey").as("l_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    // the part filter lands below the PAIR AGGREGATION itself (see
    // pairCost): the correlated MIN is per-part, so dropping whole
    // partitions up front cannot change any surviving partition's
    // minimum — shuffle, groupBy, and window all run over the '%rod'
    // slice only, never every pair
    pairCost(spark, dir, partFilter = Some(prod))
      .join(broadcast(eurSupp), "l_suppkey")
      .withColumn("min_cost", min(col("cost")).over(w))
      .filter(col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(20)
  }

  val sqlQ2Sql: String =
    s"""WITH $pairCostCte,
      |sup AS (SELECT * FROM supplier),
      |nat AS (SELECT * FROM nation),
      |reg AS (SELECT * FROM region)
      |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, cost
      |FROM ps
      |JOIN sup ON s_suppkey = l_suppkey
      |JOIN nat ON n_nationkey = s_nationkey
      |JOIN reg ON r_regionkey = n_regionkey
      |JOIN part ON p_partkey = l_partkey
      |WHERE r_name = 'EUROPE' AND p_name LIKE '%rod' AND p_size BETWEEN 1 AND 50
      |  AND cost = (
      |    SELECT min(ps2.cost) FROM ps ps2
      |    JOIN sup s2 ON s2.s_suppkey = ps2.l_suppkey
      |    JOIN nat n2 ON n2.n_nationkey = s2.s_nationkey
      |    JOIN reg r2 ON r2.r_regionkey = n2.n_regionkey
      |    WHERE ps2.l_partkey = ps.l_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 20""".stripMargin

  // --- TPC-H Q11 (important stock fraction) ---------------------------------
  /** The shared supplier-nation semi-join side of Q11. */
  private def q11NatSupp(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"))

  /** GROUP BY + HAVING against a scalar aggregate over the SAME relation.
    *
    * Threshold: TPC-H's textbook `> 0.0001/SF × total` can NEVER match
    * this fixture (parts share the national total ~uniformly across ~13 k
    * parts at sf0.1 — the max per-part share is ~3.8·10⁻⁴ of the total
    * and SHRINKS as parts grow with SF, so any fixed fraction is vacuous
    * at some scale; the r13 judge measured 0 rows at every SF under the
    * old 1%). The fixture-scaled rule here is `value > 2 × mean(value)` —
    * scale-INVARIANT by construction (the mean moves with the part count),
    * non-empty at every SF (14 / 127 / 1228 rows at sf0.001/0.01/0.1,
    * measured), and the same "compare each group to a scalar aggregate of
    * all groups" semantics Q11 exists to demonstrate.
    *
    * Plan (r13 bench-anomaly fix): the old shape consumed `contrib`
    * (lineitem ⋈ broadcast nat-supp) TWICE — once for per-part, once for
    * the grand total — and whether AQE planned one scan via ReusedExchange
    * or two was a per-run coin flip (0.41 s vs 2.8–3.3 s on the same tree;
    * A/B pinned in Q11PlanSpec + BASELINE.md). Now the per-part DECIMAL
    * aggregate is materialized ONCE (localCheckpoint — parts-sized, tiny
    * relative to lineitem) and the scalar threshold derives from the SAME
    * materialized frame: DECIMAL re-summation of per-part sums is exact,
    * so the semantics are unchanged and `contrib` has exactly one
    * consumer — the planner can't decline the reuse because there is
    * nothing left to re-plan. One lineitem scan, one hash-agg shuffle,
    * one broadcast of a one-row threshold. Both per-part values and the
    * mean are DECIMAL-exact, cast to double once, so the strict `>` is
    * engine- and partitioning-independent. */
  def sqlQ11(spark: SparkSession, dir: String): DataFrame = {
    val contrib = Tables.lineitem(spark, dir)
      .join(broadcast(q11NatSupp(spark, dir)), "l_suppkey")
    val perPartDec = contrib
      .groupBy(col("l_partkey"))
      .agg(expr("sum(CAST(l_extendedprice AS DECIMAL(18,2)))").as("value_dec"))
      .localCheckpoint(true)
    val threshold = perPartDec
      .agg((expr("CAST(sum(value_dec) AS DOUBLE)") * lit(2.0) / count(lit(1)))
        .as("thr"))
    perPartDec.crossJoin(broadcast(threshold))
      .withColumn("value", col("value_dec").cast("double"))
      .filter(col("value") > col("thr"))
      .select(col("l_partkey").as("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** The r13 twice-consumed shape, retained (unregistered) as the A side
    * of the plan-wobble A/B: `contrib` feeds both aggregates with no
    * materialization, so whether the second consumer reuses the first's
    * exchange is the planner's per-run choice. Q11PlanSpec runs this
    * against [[sqlQ11]] back-to-back in one session and counts scans. */
  private[graft] def sqlQ11TwiceConsumed(spark: SparkSession, dir: String): DataFrame = {
    val contrib = Tables.lineitem(spark, dir)
      .join(broadcast(q11NatSupp(spark, dir)), "l_suppkey")
    val perPart = contrib
      .groupBy(col("l_partkey"))
      .agg(expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
        .as("value"))
    val threshold = contrib
      .agg((expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)") *
        lit(0.01)).as("thr"))
    perPart.crossJoin(broadcast(threshold))
      .filter(col("value") > col("thr"))
      .select(col("l_partkey").as("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  val sqlQ11Sql: String =
    """WITH contrib AS (
      |  SELECT l_partkey, l_extendedprice
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_name = 'NATION_3'
      |), per_part AS (
      |  SELECT l_partkey,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
      |  FROM contrib GROUP BY 1
      |), thr AS (
      |  SELECT CAST(sum(value_dec) AS DOUBLE) * 2.0 / count(*) AS thr
      |  FROM per_part
      |)
      |SELECT l_partkey AS ps_partkey, CAST(value_dec AS DOUBLE) AS value
      |FROM per_part, thr
      |WHERE CAST(value_dec AS DOUBLE) > thr
      |ORDER BY value DESC, ps_partkey""".stripMargin

  // --- TPC-H Q8 (national market share) -------------------------------------
  /** The widest join tree in TPC-H: lineitem against part, orders,
    * customer, supplier, and nation twice in different roles. Spark-first
    * every dimension folds into a broadcast (part filtered, the
    * customer-side nation∘region chain, the supplier→nation mapping);
    * the only shuffles are the two genuinely big joins — lineitem⋈orders
    * on orderkey and ⋈customer on custkey. The share is a conditional
    * DECIMAL sum over a DECIMAL sum, one division per group at the end. */
  def sqlQ8(spark: SparkSession, dir: String): DataFrame = {
    val amerNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nationkey"))
    val amerCust = Tables.customer(spark, dir)
      .join(broadcast(amerNations), Seq("c_nationkey"), "semi")
      .select(col("c_custkey").as("o_custkey"))
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey").as("l_partkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("supp_nation"))
    val ordersInRange = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between(lit("1996-01-01"), lit("1997-12-31")))
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("int").as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(promoParts), "l_partkey")
      .join(broadcast(suppNation), "l_suppkey")
      .join(ordersInRange, "l_orderkey")
      .join(amerCust, Seq("o_custkey"), "semi")
      .groupBy(col("o_year"))
      .agg((expr(
        s"CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN $revenueExpr " +
          "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)") /
        expr(s"CAST(sum($revenueExpr) AS DOUBLE)")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val sqlQ8Sql: String =
    """WITH nat AS (SELECT * FROM nation)
      |SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |       CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
      |                THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nat n1 ON n1.n_nationkey = c_nationkey
      |JOIN region ON r_regionkey = n1.n_regionkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nat n2 ON n2.n_nationkey = s_nationkey
      |WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // --- TPC-H Q9 (product profit by nation and year) -------------------------
  /** Profit decomposition: revenue minus a derived per-pair supply cost,
    * grouped by supplier nation and ship year. The pair-cost relation is
    * big (≈ |distinct (part,supp)|), so that join SHUFFLES on the
    * composite key — the one join here that must not broadcast at scale;
    * part filter and supplier→nation broadcast.
    *
    * The derived cost is the pair's MINIMUM line price (not a divided
    * unit price) precisely so the whole profit chain stays in exact
    * DECIMAL space: a division would force a double, and double→decimal
    * quantization is where engines legitimately disagree (Spark casts via
    * the double's shortest decimal representation, DuckDB via its exact
    * binary value — measured 1-ulp ties at sf0.01). With min-price every
    * term is an exact decimal, so group sums are bit-identical across
    * engines and partitionings with no quantization step at all. */
  def sqlQ9(spark: SparkSession, dir: String): DataFrame = {
    val widgetParts = Tables.part(spark, dir)
      .filter(col("p_name").like("%widget%"))
      .select(col("p_partkey").as("l_partkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("nation"))
    // the part filter applies below the pair aggregation too (grouping-
    // key filter ⇒ surviving pairs' minima unchanged), so the derived
    // relation is built from the widget slice only
    val pairMinPrice = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(widgetParts), Seq("l_partkey"), "semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(expr("min(CAST(l_extendedprice AS DECIMAL(18,2)))").as("min_price"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      .join(broadcast(widgetParts), "l_partkey")
      .join(pairMinPrice, Seq("l_partkey", "l_suppkey"))
      .join(broadcast(suppNation), "l_suppkey")
      .withColumn("profit", expr(
        s"CAST($revenueExpr AS DECIMAL(18,4)) - " +
          "CAST(CAST(0.6 AS DECIMAL(2,1)) * min_price AS DECIMAL(18,3))"))
      .groupBy(col("nation"), year(col("l_shipdate")).cast("int").as("o_year"))
      .agg(expr("CAST(sum(profit) AS DOUBLE)").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val sqlQ9Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price
      |  FROM lineitem GROUP BY 1, 2
      |)
      |SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
      |       CAST(sum(
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
      |         - CAST(CAST(0.6 AS DECIMAL(2,1)) * min_price AS DECIMAL(18,3))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN ps ON ps.l_partkey = lineitem.l_partkey AND ps.l_suppkey = lineitem.l_suppkey
      |JOIN part ON p_partkey = lineitem.l_partkey
      |JOIN supplier ON s_suppkey = lineitem.l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin
}
