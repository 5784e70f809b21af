package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All analytics take `(SparkSession, sfDir)` and read through here so the
  * session tweaks needed for the fixtures are applied exactly once per call
  * site and the scan stays a plain parquet relation (predicate pushdown and
  * column pruning reach the file scan).
  */
object Tables {

  /** `events.parquet` carries parquet TIMESTAMP(NANOS,false), which Spark's
    * parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Reading it as
    * raw nanosecond longs (`spark.sql.legacy.parquet.nanosAsLong`) keeps the
    * full precision and makes epoch-millisecond math exact integer
    * arithmetic — mirroring the reference's epoch-ms `ts` bigint column
    * (reference process.py:204), instead of lossy double division.
    */
  private def withNanosAsLong(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    withNanosAsLong(spark).read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` enriched with the typed columns the komodo-analog analytics
    * need (FIXTURES.md §2 column mapping):
    *   - `ts_ms`  — epoch milliseconds (exact integer `div`, reference's
    *                bigint `ts`, process.py:204)
    *   - `k`      — the `props` JSON payload key (reference `message`
    *                JSON-path access, process.py:147-149)
    *   - `x,y,z`  — synthetic positions derived deterministically from
    *                (value, k) standing in for `message.pos` doubles
    *                (process.py:200-204).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("x", col("value"))
      .withColumn("y", col("k").cast("double"))
      .withColumn("z", col("value") - col("k").cast("double"))

  /** The same enrichment as ANSI SQL fragments for the DuckDB oracle —
    * kept adjacent to the Spark definitions so the two stay in lockstep.
    * DuckDB reads the column as TIMESTAMP_NS; `epoch_ns` is exact.
    */
  val eventsOracleCte: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, value, props,
      |         epoch_ns(ts) // 1000000 AS ts_ms,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |         value AS x,
      |         CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DOUBLE) AS y,
      |         value - CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DOUBLE) AS z
      |  FROM events
      |)""".stripMargin
}
