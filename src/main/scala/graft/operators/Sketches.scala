package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the approximate path every 100 TB
  * pipeline needs where exact distinct/quantiles would shuffle the
  * world. Sketch internals are engine-specific, so the oracle contract
  * is a BOUND: each query emits the exact value alongside a boolean
  * "approximation within tolerance", and the DuckDB twin computes the
  * same exact value with the boolean stated literally — a hash-checkable
  * assertion that the sketch ran and landed inside its error envelope
  * (both sketches are deterministic algorithms for fixed input, so the
  * check is stable, not flaky).
  */
object Sketches {

  // --- HLL sketch: build, merge, estimate -----------------------------------
  /** Distinct users per event_type via DataSketches HLL, with the
    * mergeability property demonstrated in-query: the stream is split in
    * two halves, each half sketched independently, the halves merged with
    * hll_union_agg — exactly what partial aggregation does across 1000
    * executors — and the estimate checked against the exact distinct
    * count (default lgConfigK=12 → ~1.6% standard error; 5% bound). */
  def hllDistinctCheck(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val halves = ev.groupBy(col("event_type"), (col("event_id") % 2).as("half"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = halves.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(merged, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("within_5pct"))
      .orderBy(col("event_type"))
  }

  val hllDistinctCheckSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |       true AS within_5pct
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --- KLL-style quantile sketch --------------------------------------------
  /** Median price per return flag via approx_percentile (rank error ≤
    * 1/accuracy = 0.01% of rows), checked against the exact interpolated
    * percentile within 1% of its value. The sketch is the operator a
    * 100 TB quantile query actually runs — exact percentile sorts every
    * group. */
  def approxPercentileCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_approx"))
      .select(col("l_returnflag"), col("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <=
          abs(col("p50_exact")) * lit(0.01)).as("within_1pct"))
      .orderBy(col("l_returnflag"))

  val approxPercentileCheckSql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_extendedprice, 0.5) AS p50_exact,
      |       true AS within_1pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --- frequent-items sketch (approx_top_k) ---------------------------------
  /** Corpus top-10 words via the DataSketches frequent-items aggregate
    * (`approx_top_k`), checked against the exact counts. The fixture
    * vocabulary (~31 words) fits far inside maxItemsTracked, so the sketch
    * guarantees EXACT counts — the boolean is a hard equality, making this
    * oracle-stable; at real scale the same query returns ±ε counts for
    * heavy hitters with bounded memory, where the exact groupBy would
    * shuffle the full token distribution. Tie order inside the sketch's
    * own top-k is not contractual, so the query re-sorts deterministically
    * (freq DESC, word) and takes k wide enough to cover the vocabulary. */
  def approxTopkCheck(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val sketch = words.agg(expr("approx_top_k(word, 50, 10000)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("word"), col("e.count").as("est_freq"))
    val exact = words.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    exact.join(sketch, "word")
      .select(col("word"), col("freq"), (col("est_freq") === col("freq")).as("sketch_exact"))
      .orderBy(col("freq").desc, col("word"))
      .limit(10)
  }

  val approxTopkCheckSql: String =
    """SELECT word, count(*) AS freq, true AS sketch_exact
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY freq DESC, word
      |LIMIT 10""".stripMargin

  // --- rolling 7-day active users via daily sketch reuse --------------------
  /** Rolling 7-day distinct users per day — THE production DAU/WAU
    * pattern: sketch each day ONCE (one scan, one tiny sketch row per
    * day), then every 7-day window is a UNION of seven daily sketches —
    * the whole rolling series costs days×7 sketch merges instead of
    * rescanning 7× the stream per window (what the exact form, or any
    * sliding-window countDistinct, fundamentally must do). The exact
    * count rides along per the Sketches bound contract: the emitted
    * truth is exact_users + a within-5% boolean the DuckDB twin states
    * literally (both engines' exact side replicates each event into its
    * 7 windows — at 100 TB you'd run ONLY the sketch side; the exact
    * path here IS the oracle harness). Windows are keyed by their END
    * day and only real event days emit (leading partial windows
    * included — the standard rolling-metric convention). */
  def dauRolling(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(expr("ts_ms div 86400000").as("day"), col("user_id"))
    val days = ev.select(col("day")).distinct()
    val wdays = days.withColumnRenamed("day", "wday")
    val exact = ev
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("wday"))
      .join(wdays, "wday")
      .groupBy(col("wday"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val est = ev.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .select(explode(sequence(col("day"), col("day") + 6)).as("wday"), col("sk"))
      .join(wdays, "wday")
      .groupBy(col("wday"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    exact.join(est, "wday")
      .select(col("wday").as("window_end_day"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("within_5pct"))
      .orderBy(col("window_end_day"))
  }

  val dauRollingSql: String =
    graft.Tables.eventsOracleCte +
      """, ev2 AS (
        |  SELECT ts_ms // 86400000 AS day, user_id FROM ev
        |), days AS (
        |  SELECT DISTINCT day FROM ev2
        |), x AS (
        |  SELECT user_id, day + i AS wday
        |  FROM ev2, LATERAL (SELECT unnest(range(7)) AS i)
        |)
        |SELECT x.wday AS window_end_day,
        |       count(DISTINCT user_id) AS exact_users,
        |       true AS within_5pct
        |FROM x JOIN days ON x.wday = days.day
        |GROUP BY 1
        |ORDER BY window_end_day""".stripMargin
}
