package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Point-in-time SCD-2 join (`scd2_pit_join`): the anti-leakage contract
  * and the no-join plan shape. The DuckDB oracle already validates the
  * union-window rewrite against the literal interval join row-for-row in
  * another engine; these tests pin the same equivalence in-Spark plus the
  * plan property that makes the rewrite worth having. */
class PitJoinSpec extends SparkSpec {

  test("union-window result equals the literal interval join (no leakage)") {
    val ev  = Tables.events(spark, sf)
    val dim = EventAnalytics.scd2From(ev.filter(col("event_type") =!= "purchase"))
    val obs = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val ref = obs.join(dim,
        obs("user_id") === dim("user_id") &&
          dim("valid_from") <= obs("ts_ms") &&
          (dim("valid_to").isNull || obs("ts_ms") < dim("valid_to")),
        "left")
      .select(obs("event_id"), obs("user_id"), obs("ts_ms"),
        dim("status").as("status_at"), dim("version").as("status_version"))
      .orderBy(col("event_id"))
      .collect().toSeq
    val pit = EventAnalytics.scd2PitJoin(spark, sf).collect().toSeq
    assert(pit.nonEmpty)
    assert(pit == ref)
    // the interval join guarantees validity-at-ts by construction, so
    // equality IS the leakage check: no row carries a version whose
    // interval excludes its timestamp
    assert(pit.exists(_.getAs[String]("status_at") != null),
      "fixture must produce matched purchases")
  }

  test("label_horizon equals the literal look-ahead join, same-ms purchases excluded") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_ms").as("p_ts"))
    // reference: min future purchase per click via the explicit join+agg
    val ref = clicks.join(purchases,
        clicks("user_id") === purchases("p_user") && col("p_ts") > clicks("ts_ms"),
        "left")
      .groupBy(clicks("event_id"), clicks("user_id"), clicks("ts_ms"))
      .agg(min(col("p_ts")).as("next_ts"))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        (col("next_ts").isNotNull &&
          col("next_ts") - col("ts_ms") <= EventAnalytics.LabelHorizonMs).as("label"),
        when(col("next_ts").isNotNull &&
          col("next_ts") - col("ts_ms") <= EventAnalytics.LabelHorizonMs,
          col("next_ts") - col("ts_ms")).as("ms_to_purchase"))
      .orderBy(col("event_id"))
      .collect().toSeq
    val got = EventAnalytics.labelHorizon(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == ref)
    assert(got.exists(_.getAs[Boolean]("label")), "fixture must produce positives")
    assert(got.exists(!_.getAs[Boolean]("label")), "and negatives")
  }

  test("hot-user skew: a 50k-event bot user labels and PIT-joins correctly among normal users") {
    import spark.implicits._
    // bot: 25k click->purchase pairs 1s apart (every click converts with
    // ms_to_purchase=1000); one normal user with an unconverted click
    val bot = (0 until 50000).map { i =>
      (1L, i.toLong * 1000L + 1L,
        if (i % 2 == 0) "click" else "purchase", 1000000L + i)
    }
    val normal = Seq((2L, 500L, "click", 1L), (2L, 600L, "signup", 2L))
    val ev = (bot ++ normal).toDF("user_id", "ts_ms", "event_type", "event_id")
    val labels = EventAnalytics.labelHorizonFrom(ev).collect()
    assert(labels.length === 25001)
    val botLabels = labels.filter(_.getLong(1) == 1L)
    assert(botLabels.length === 25000 && botLabels.forall(r =>
      r.getBoolean(3) && r.getLong(4) == 1000L),
      "every bot click converts in exactly 1s")
    val normalLabel = labels.find(_.getLong(1) == 2L).get
    assert(!normalLabel.getBoolean(3))
    // PIT join: the bot's non-purchase history alternates only 'click',
    // so ONE status version governs all 25k purchases
    val pit = EventAnalytics.scd2PitJoinFrom(ev).collect()
    val botPit = pit.filter(_.getLong(1) == 1L)
    assert(botPit.length === 25000 && botPit.forall(r =>
      r.getString(3) == "click" && r.getInt(4) == 1))
  }

  test("plan: union-window shape — shuffles bounded, no join operator") {
    // AQE off for the walk: under AQE the executedPlan is an
    // AdaptiveSparkPlanExec LEAF, so collect{ShuffleExchangeExec} finds
    // nothing and the bound would be vacuous (the BloomFrontSpec lesson)
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = EventAnalytics.scd2PitJoin(spark, sf).queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      // one hash exchange feeds the user window (the SCD-2 derivation and
      // the carry-forward window share the user_id partitioning); the
      // final ORDER BY adds a range exchange
      assert(shuffles.nonEmpty, "plan walk must see the real tree (AQE leaf?)")
      assert(shuffles.size <= 3, s"expected ≤3 exchanges:\n${plan.treeString.take(3000)}")
      assert(!plan.toString.contains("Join"),
        "the union-window rewrite must not contain a join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
