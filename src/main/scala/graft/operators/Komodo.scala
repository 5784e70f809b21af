package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The five reference analytics (SURVEY.md §2 / §7.3 step 2), re-expressed
  * Spark-first over the `events` fixture table (FIXTURES.md §2 maps the
  * reference's `data` fact-table columns onto `events`).
  *
  * Reference: gelic-idealab/komodo-data `process.py` —
  *   aggregate_interaction_type 53-115, aggregate_user 118-191,
  *   user_energy 194-230, drawing_pattern 385-410, user_proximity 413-448.
  *
  * Scale notes (100 TB north star):
  *  - every groupBy keys on a high-cardinality column (user_id / time
  *    bucket) → hash-partitioned shuffle, no driver materialization;
  *  - windows are PARTITIONED (user_id, bucket) — never the reference's
  *    unpartitioned ORDER BY, which would serialize onto one task
  *    (SURVEY §4.2 hazard 1);
  *  - count/filter run before windows, so the shuffle carries only
  *    surviving rows, and column pruning reaches the parquet scan.
  */
object Komodo {

  /** Hour buckets give the proximity/drawing analytics a bounded group
    * cardinality at any scale (the reference groups by raw epoch-ms `ts`,
    * which on the sparse fixture stream would make every group size 1). */
  private val HourMs = 3600000L

  // --- A1: per-user interaction count (process.py:79-84) -------------------
  /** `SELECT client_id, COUNT(message) ... WHERE interactionType=:it AND
    * session_id=:sid GROUP BY client_id` → per-user count of one
    * interaction class. Mapping: event_type='click' plays `session` scope,
    * `k % 10 = 3` plays the interactionType equality (F2/F5 parameterized
    * predicate). Both predicates are REQUEST parameters in the reference
    * (`:session_id`, `:interaction_type`, process.py:79-84) — exposed here
    * so Dispatch (T3) can thread per-request values; the defaults are the
    * fixture mapping the oracle checks. */
  def aggInteraction(spark: SparkSession, dir: String,
                     sessionType: String = "click", interactionType: Int = 3): DataFrame =
    aggInteractionFrom(Tables.events(spark, dir), sessionType, interactionType)

  /** Any enriched events frame works — `Tables.events` or a commit-log
    * table holding the same rows ([[graft.sources.CommitLog.read]]): the
    * analytics are storage-agnostic, which is what lets the capture fact
    * table live on the ACID layer (CaptureLogSpec pins the equality). */
  private[graft] def aggInteractionFrom(ev: DataFrame,
                     sessionType: String = "click", interactionType: Int = 3): DataFrame =
    ev
      .filter(col("event_type") === sessionType && col("k") % 10 === interactionType)
      .groupBy(col("user_id"))
      .agg(count(col("props")).as("interaction_count"))
      .orderBy(col("user_id"))

  val aggInteractionSql: String =
    Tables.eventsOracleCte +
      """
        |SELECT user_id, count(props) AS interaction_count
        |FROM ev
        |WHERE event_type = 'click' AND k % 10 = 3
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin

  // --- A2+F6: per-entity-type activity for one user (process.py:145-163) ---
  /** `SELECT message->'$.entityType', COUNT(*) ... WHERE clientId=:cid AND
    * type='sync' GROUP BY entity_type` plus the code→label decode. The
    * reference decodes via nested REPLACE *after* aggregation (corrupting
    * multi-digit codes, SURVEY F6); we decode per-code with when/otherwise,
    * which is strictly more correct. `clientId`/`sessionType` are the
    * reference's `:client_id`/`:session_id` request parameters
    * (process.py:145-163), threaded through Dispatch. */
  def aggUser(spark: SparkSession, dir: String,
              sessionType: String = "view", clientId: Int = 5): DataFrame =
    aggUserFrom(Tables.events(spark, dir), sessionType, clientId)

  private[graft] def aggUserFrom(ev: DataFrame,
              sessionType: String = "view", clientId: Int = 5): DataFrame = {
    val code = col("k") % 4
    ev
      .filter(col("user_id") === clientId && col("event_type") === sessionType)
      .withColumn("entity_type",
        when(code === 0, "head")
          .when(code === 1, "left_hand")
          .when(code === 2, "right_hand")
          .when(code === 3, "spawned_entity"))
      .groupBy(col("entity_type"))
      .agg(count(lit(1)).as("user_count"))
      .orderBy(col("entity_type"))
  }

  val aggUserSql: String =
    Tables.eventsOracleCte +
      """
        |SELECT CASE k % 4 WHEN 0 THEN 'head' WHEN 1 THEN 'left_hand'
        |            WHEN 2 THEN 'right_hand' WHEN 3 THEN 'spawned_entity' END
        |         AS entity_type,
        |       count(*) AS user_count
        |FROM ev
        |WHERE user_id = 5 AND event_type = 'view'
        |GROUP BY 1
        |ORDER BY entity_type""".stripMargin

  // --- W1+X2-4: user_energy, the flagship (process.py:197-211) -------------
  /** Per-row speed = Euclidean distance between consecutive positions ÷
    * elapsed ms, per user over the ordered stream. LAG ×4 over
    * PARTITION BY user_id ORDER BY event_id (provably identical to the
    * reference's pre-filtered unpartitioned window, SURVEY §4.2); Δt=0
    * guarded to NULL (MySQL division semantics, SURVEY X4); the LAG
    * boundary row is NULL-filtered exactly like `WHERE energy IS NOT NULL`
    * (process.py:209).
    *
    * The reference's user_energy takes `client_id` and `entity_type`
    * request parameters (process.py:194, validated non-null at
    * process.py:361-363) — optional here (None = whole stream, the
    * oracle-checked default; Some = the dispatch-threaded narrowing:
    * clientId → user_id, entityType → the k%4 entity code). The filters
    * sit BEFORE the window, so a narrowed request shuffles only the
    * requested user's rows. */
  def userEnergy(spark: SparkSession, dir: String,
                 clientId: Option[Int] = None, entityType: Option[Int] = None): DataFrame =
    userEnergyFrom(Tables.events(spark, dir), clientId, entityType)

  private[graft] def userEnergyFrom(ev: DataFrame,
                 clientId: Option[Int] = None, entityType: Option[Int] = None): DataFrame = {
    val w  = Window.partitionBy("user_id").orderBy("event_id")
    val dx = col("x") - lag("x", 1).over(w)
    val dy = col("y") - lag("y", 1).over(w)
    val dz = col("z") - lag("z", 1).over(w)
    val dt = (col("ts_ms") - lag("ts_ms", 1).over(w)).cast("double")
    val scoped = Seq(
      clientId.map(c => col("user_id") === c),
      entityType.map(e => col("k") % 4 === e)
    ).flatten.foldLeft(col("event_type") === "view")(_ && _)
    // (scan widening was TRIED here and reverted: the JSON-parse
    // projection sits BELOW a user repartition in the optimized plan —
    // Catalyst does not hoist projects above exchanges — so the parse
    // stayed single-task and the extra exchange was pure cost, measured
    // slower at sf0.1.)
    ev
      .filter(scoped)
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        when(dt === 0, lit(null))
          .otherwise(sqrt(dx * dx + dy * dy + dz * dz) / dt).as("energy"))
      .filter(col("energy").isNotNull)
      .orderBy(col("user_id"), col("event_id"))
  }

  val userEnergySql: String =
    Tables.eventsOracleCte +
      """, lagged AS (
        |  SELECT user_id, event_id, ts_ms,
        |         x - lag(x, 1) OVER w AS dx,
        |         y - lag(y, 1) OVER w AS dy,
        |         z - lag(z, 1) OVER w AS dz,
        |         CAST(ts_ms - lag(ts_ms, 1) OVER w AS DOUBLE) AS dt
        |  FROM ev
        |  WHERE event_type = 'view'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |)
        |SELECT user_id, event_id, ts_ms,
        |       sqrt(dx * dx + dy * dy + dz * dz) / dt AS energy
        |FROM lagged
        |WHERE dt IS NOT NULL AND dt <> 0
        |ORDER BY user_id, event_id""".stripMargin

  // --- A3+O2: drawing_pattern (process.py:389-395) -------------------------
  /** Per-time-bucket non-null counts of two stroke-ish derived columns
    * (COUNT(expr) = non-null count), sorted by activity desc. The reference
    * groups by raw `ts`; we bucket to the hour so group cardinality stays
    * bounded at scale. */
  def drawingPattern(spark: SparkSession, dir: String): DataFrame =
    drawingPatternFrom(Tables.events(spark, dir))

  private[graft] def drawingPatternFrom(ev: DataFrame): DataFrame =
    ev
      .withColumn("bucket_ms", expr(s"ts_ms div $HourMs") * HourMs)
      .withColumn("stroke_type", when(col("event_type") === "click", col("k")))
      .withColumn("stroke_id", when(col("event_type") === "click", col("event_id")))
      .groupBy(col("bucket_ms"))
      .agg(count(col("stroke_type")).as("stroke_type_count"),
           count(col("stroke_id")).as("stroke_id_count"))
      .orderBy(col("stroke_type_count").desc, col("bucket_ms"))

  val drawingPatternSql: String =
    Tables.eventsOracleCte +
      """
        |SELECT (ts_ms // 3600000) * 3600000 AS bucket_ms,
        |       count(CASE WHEN event_type = 'click' THEN k END) AS stroke_type_count,
        |       count(CASE WHEN event_type = 'click' THEN event_id END) AS stroke_id_count
        |FROM ev
        |GROUP BY 1
        |ORDER BY stroke_type_count DESC, bucket_ms""".stripMargin

  // --- J1+A4+W2+F4+O1-2: user_proximity (process.py:418-434) ---------------
  /** Restrict the stream to time buckets where >1 distinct user was present
    * (the reference's IN-subquery), then LAG-distance between adjacent
    * rows ordered inside each bucket, range-filter on the derived distance
    * (F4 post-window filter), sort by distance.
    *
    * Single-pass form: ">1 distinct user in the bucket" is decided as
    * `min(user_id) ≠ max(user_id)` over a whole-bucket window frame — the
    * same partitioning the LAG window already shuffles on, so the whole
    * query is ONE scan and ONE shuffle (the round-1 formulation was the
    * literal semi-join: a second scan, a countDistinct aggregation and a
    * join exchange, ~2x this plan's wall time; at 100 TB it also re-read
    * the fact table). Catalyst stacks both window specs over the same
    * exchange. */
  def userProximity(spark: SparkSession, dir: String, diameter: Double = 50.0): DataFrame =
    userProximityFrom(Tables.events(spark, dir), diameter)

  private[graft] def userProximityFrom(events: DataFrame, diameter: Double = 50.0): DataFrame = {
    val ev = events
      .withColumn("bucket_ms", expr(s"ts_ms div $HourMs") * HourMs)
    val wb = Window.partitionBy("bucket_ms")
    val w  = Window.partitionBy("bucket_ms").orderBy("ts_ms", "event_id")
    val dx = col("x") - lag("x", 1).over(w)
    val dy = col("y") - lag("y", 1).over(w)
    val dz = col("z") - lag("z", 1).over(w)
    ev.select(col("bucket_ms"), col("event_id"), col("user_id"),
        sqrt(dx * dx + dy * dy + dz * dz).as("distance"),
        (min(col("user_id")).over(wb) =!= max(col("user_id")).over(wb)).as("multi_user"))
      .filter(col("multi_user") && col("distance") > 0 && col("distance") < lit(diameter))
      .select(col("bucket_ms"), col("event_id"), col("user_id"), col("distance"))
      .orderBy(col("distance"), col("event_id"))
  }

  val userProximitySql: String =
    Tables.eventsOracleCte +
      """, evb AS (
        |  SELECT *, (ts_ms // 3600000) * 3600000 AS bucket_ms FROM ev
        |), lagged AS (
        |  SELECT bucket_ms, event_id, user_id,
        |         x - lag(x, 1) OVER w AS dx,
        |         y - lag(y, 1) OVER w AS dy,
        |         z - lag(z, 1) OVER w AS dz
        |  FROM evb
        |  WHERE bucket_ms IN (SELECT bucket_ms FROM evb
        |                      GROUP BY bucket_ms
        |                      HAVING count(DISTINCT user_id) > 1)
        |  WINDOW w AS (PARTITION BY bucket_ms ORDER BY ts_ms, event_id)
        |)
        |SELECT * FROM (
        |  SELECT bucket_ms, event_id, user_id,
        |         sqrt(dx * dx + dy * dy + dz * dz) AS distance
        |  FROM lagged
        |) WHERE distance > 0 AND distance < 50.0
        |ORDER BY distance, event_id""".stripMargin
}
