package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators — the profiling / constraint-checking layer a
  * production ingestion pipeline runs before analytics trust a table
  * (the deequ/dbt-test category; the reference trusts its MySQL schema
  * and has no equivalent, SURVEY §2.1 — this is category-coverage
  * extension like the streaming family).
  *
  * Both operators are single-pass-per-table: every metric folds into one
  * global aggregation whose map-side partials reduce to a handful of
  * numbers per partition, so the driver-bound final merge is bytes — the
  * canonical 1000-executor reduction (PlanGuardSpec sanctions the
  * single-partition exchanges, counted exactly).
  */
object DataQuality {

  /** Columns profiled — shared with the oracle SQL. */
  val ProfileCols: Seq[String] = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  // --- numeric column profile ----------------------------------------------
  /** Per-column profile of lineitem's numeric measures: row count,
    * non-null count, EXACT distinct count, min, max — one row per column,
    * computed in ONE scan. The multi-column exact distincts plan as a
    * single Expand (×|cols|+1 row multiplication, the standard Spark
    * rewrite) — at 100 TB the profile-everything variant would swap
    * countDistinct for approx_count_distinct and lose the oracle, which
    * is exactly the trade the approx_distinct query already documents;
    * the exact form here is the oracle-checkable contract. */
  def dataProfile(spark: SparkSession, dir: String): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))
    }
    val stackArgs = ProfileCols
      .map(c => s"'$c', n_rows, nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    // (scan widening was TRIED here and reverted: for a plain aggregate
    // the widening exchange's map side writes every row from the same
    // single scan task the partial aggregate would have consumed — the
    // A/B showed no win for the exact profile and a clear loss for the
    // two-pass approx twin. Widening pays only where downstream per-row
    // work dwarfs a shuffle write — the md5/codec pipelines.)
    Tables.lineitem(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${ProfileCols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nonnull, n_distinct, min_val, max_val)")
      .orderBy(col("col_name"))
  }

  /** Shared CTE + per-column UNION skeleton for both profile twins —
    * one builder, so the two SQL strings cannot drift (the PQ-codebook
    * / chunk-grammar convention). `extraSelect` renames or extends the
    * per-column branch; `outCols` is the final projection. */
  private def profileSqlSkeleton(extraSelect: String => String,
                                 outCols: String): String = {
    val aggs = ProfileCols.map { c =>
      s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c, min($c) AS mn_$c, max($c) AS mx_$c"
    }.mkString(",\n      |         ")
    val branches = ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, n_rows, CAST(nn_$c AS BIGINT) AS n_nonnull,
         |         ${extraSelect(c)}, mn_$c AS min_val, mx_$c AS max_val FROM a"""
    }.mkString("\n      |  UNION ALL\n      |  ")
    s"""WITH a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |         $aggs
      |  FROM lineitem
      |)
      |SELECT $outCols FROM (
      |  $branches
      |)
      |ORDER BY col_name""".stripMargin
  }

  val dataProfileSql: String = profileSqlSkeleton(
    c => s"CAST(nd_$c AS BIGINT) AS n_distinct",
    "col_name, n_rows, n_nonnull, n_distinct, min_val, max_val")

  // --- approximate column profile (the 100 TB path) -------------------------
  /** The profile a 100 TB deployment actually runs: distinct counts come
    * from HLL++ sketches (approx_count_distinct, rsd 2%) that
    * partial-aggregate as mergeable buffers instead of the exact
    * variant's Expand + per-partition distinct sets. The sketch pass is
    * its OWN aggregation, joined to [[dataProfile]]'s exact pass on the
    * 4-row output — mixing HLL buffers into the Expand'd multi-distinct
    * aggregate measured 100+ s vs 0.8 s standalone (each sketch rides
    * the ×|cols|+1 row multiplication and the widened group buffers);
    * at 100 TB production runs ONLY the sketch pass, the exact pass
    * here is the oracle bound. Oracle contract is the Sketches-family
    * BOUND: the exact count ships alongside a "sketch within 5%"
    * boolean (2.5σ at rsd 2% — deterministic for fixed input, not
    * flaky), which the DuckDB twin states literally. */
  def profileApprox(spark: SparkSession, dir: String): DataFrame = {
    val skAggs = ProfileCols.map(c => approx_count_distinct(col(c), 0.02).as(s"ad_$c"))
    val skStack = ProfileCols.map(c => s"'$c', ad_$c").mkString(", ")
    val sketches = Tables.lineitem(spark, dir)
      .agg(skAggs.head, skAggs.tail: _*)
      .selectExpr(s"stack(${ProfileCols.size}, $skStack) AS (col_name, approx_nd)")
    dataProfile(spark, dir)
      .join(broadcast(sketches), "col_name")
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct").as("n_distinct_exact"),
        (abs(col("approx_nd") - col("n_distinct")) <=
          col("n_distinct") * lit(0.05)).as("sketch_within_5pct"),
        col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }

  val profileApproxSql: String = profileSqlSkeleton(
    c => s"CAST(nd_$c AS BIGINT) AS n_distinct_exact, true AS sketch_within_5pct",
    "col_name, n_rows, n_nonnull, n_distinct_exact, sketch_within_5pct,\n      |       min_val, max_val")

  // --- constraint checks ---------------------------------------------------
  /** Deequ-style table constraints, fused into one pass per fact table:
    * lineitem's (orderkey, linenumber) primary-key uniqueness (count vs
    * exact distinct), price non-negativity, discount domain [0,1] — one
    * aggregation; orders' o_orderdate completeness and the
    * orders→customer foreign key (left-anti count) — one more pass plus
    * the key join. Output is the check manifest (name, violations,
    * passed) a pipeline gate consumes.
    *
    * Scale: each branch's global count is a map-side-partial reduction
    * (three sanctioned single-partition exchanges, counted exactly in
    * PlanGuardSpec); the FK anti-join shuffles on the key like any fact
    * join and AQE turns it broadcast when the dim fits. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    // PK violations are defined engine-independently: every NULL-keyed
    // row is a violation outright, plus each non-null-keyed row beyond
    // its pair's first. (A bare count - countDistinct would SILENTLY
    // disagree with SQL engines whose DISTINCT treats ROW(NULL, x)
    // tuples as countable values — Spark's countDistinct drops them.)
    val keyNull = col("l_orderkey").isNull || col("l_linenumber").isNull
    val li = Tables.lineitem(spark, dir).agg(
      sum(when(!keyNull, 1L).otherwise(0L)).as("n_keyed"),
      sum(when(keyNull, 1L).otherwise(0L)).as("n_nullkey"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd"),
      sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)).as("neg_price"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L))
        .as("bad_disc"))
      .selectExpr("stack(3, " +
        "'discount_in_range', bad_disc, " +
        "'lineitem_pk_unique', n_nullkey + (n_keyed - nd), " +
        "'price_non_negative', neg_price) AS (check_name, n_violations)")
    val od = Tables.orders(spark, dir)
      .agg(sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("v"))
      .select(lit("orderdate_not_null").as("check_name"), col("v").as("n_violations"))
    val fk = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .select(lit("orders_customer_fk").as("check_name"), col("v").as("n_violations"))
    li.union(od).union(fk)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("check_name"))
  }

  val dqChecksSql: String =
    """WITH li AS (
      |  SELECT CAST(sum(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
      |                       THEN 0 ELSE 1 END) AS BIGINT) AS n_keyed,
      |         CAST(sum(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_nullkey,
      |         CAST(count(DISTINCT (l_orderkey, l_linenumber))
      |              FILTER (WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
      |              AS BIGINT) AS nd,
      |         CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_price,
      |         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc
      |  FROM lineitem
      |), o AS (
      |  SELECT o_custkey, o_orderdate FROM orders
      |), c AS (
      |  SELECT c_custkey FROM customer
      |), checks AS (
      |  SELECT 'discount_in_range' AS check_name, bad_disc AS n_violations FROM li
      |  UNION ALL
      |  SELECT 'lineitem_pk_unique', n_nullkey + (n_keyed - nd) FROM li
      |  UNION ALL
      |  SELECT 'price_non_negative', neg_price FROM li
      |  UNION ALL
      |  SELECT 'orderdate_not_null',
      |         CAST((SELECT count(*) FROM o WHERE o_orderdate IS NULL) AS BIGINT)
      |  UNION ALL
      |  SELECT 'orders_customer_fk',
      |         CAST((SELECT count(*) FROM o LEFT JOIN c ON o.o_custkey = c.c_custkey
      |               WHERE c.c_custkey IS NULL) AS BIGINT)
      |)
      |SELECT check_name, n_violations, n_violations = 0 AS passed
      |FROM checks
      |ORDER BY check_name""".stripMargin

  // --- embedding-column hygiene ---------------------------------------------
  /** Vector-column data quality per label — the check the relational
    * profiles can't see and broken embeddings fail SILENTLY in ANN
    * (a zero vector cosines to NaN and vanishes from every top-k; a
    * wrong-dimension vector truncates the distance loop): per label,
    * vector count, zero-norm count, off-dimension count, and the norm
    * range. Norms quantize to DECIMAL(18,6) (exact min/max ordering,
    * engine-identical); the squared norm comes from the codegen'd
    * FloatVecDot, bit-equal to the oracle's fold. One scan, one 10-row
    * aggregation. */
  /** Expected embedding dimension, shared with the oracle SQL. */
  val EmbDims: Int = 64

  def embNormStats(spark: SparkSession, dir: String, dims: Int = EmbDims): DataFrame =
    graft.Tables.embeddings(spark, dir)
      .select(col("label"),
        sqrt(org.apache.spark.sql.graft.VectorFunctions
          .vec_dot(col("embedding"), col("embedding")))
          .cast("decimal(18,6)").as("nrm"),
        size(col("embedding")).as("dim"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("nrm") === 0, 1L).otherwise(0L)).as("n_zero_norm"),
        sum(when(col("dim") =!= dims, 1L).otherwise(0L)).as("n_bad_dim"),
        expr("cast(min(nrm) as double)").as("min_norm"),
        expr("cast(max(nrm) as double)").as("max_norm"))
      .orderBy(col("label"))

  val embNormStatsSql: String =
    s"""WITH q AS (
      |  SELECT label,
      |         CAST(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |              AS DECIMAL(18,6)) AS nrm,
      |         len(embedding) AS dim
      |  FROM embeddings
      |)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
      |       CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
      |       CAST(sum(CASE WHEN dim <> $EmbDims THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
      |       CAST(min(nrm) AS DOUBLE) AS min_norm,
      |       CAST(max(nrm) AS DOUBLE) AS max_norm
      |FROM q GROUP BY 1
      |ORDER BY label""".stripMargin
}
