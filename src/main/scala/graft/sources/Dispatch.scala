package graft.sources

import graft.operators.Komodo
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Request-queue dispatch — the reference's `aggregation_file_download`
  * loop (SURVEY §2.9 T3, process.py:320-367) rebuilt without mutable
  * tables.
  *
  * The `data_requests` control table is tiny at any scale, so it is
  * collected to the driver and pattern-matched on `aggregation_function`
  * (exactly the reference's dispatch, including silently ignoring unknown
  * function names, process.py:351-366). Each matched request builds a
  * lazy DataFrame, writes one CSV (S4: single file, header), and appends
  * a fulfillment row to an append-only ledger — the redesign of the
  * reference's `UPDATE data_requests SET is_it_fulfilled = 1` (S9):
  * current status = latest ledger row per request_id, no in-place writes.
  */
object Dispatch {

  /** Route one function name to its analytic. Unknown names → None
    * (reference parity: silently skipped). */
  def route(fn: String): Option[(SparkSession, String) => DataFrame] = fn match {
    case "aggregate_interaction_type" => Some(Komodo.aggInteraction)
    case "aggregate_user"             => Some(Komodo.aggUser)
    case "user_energy"                => Some(Komodo.userEnergy)
    case _                            => None
  }

  /** Pending = requests with no fulfillment row in the ledger yet,
    * processed in request_id order (reference ORDER BY request_id). */
  def pending(requests: DataFrame, ledger: Option[DataFrame]): DataFrame = {
    val done = ledger.map(_.select(col("request_id")).distinct())
    done match {
      case Some(d) => requests.join(d, Seq("request_id"), "left_anti")
      case None    => requests
    }
  }

  /** Run every pending request: CSV result per request + ledger append.
    * Returns (request_id, file_location) for each fulfilled request. */
  def run(spark: SparkSession, sfDir: String, requests: DataFrame,
          outDir: String, ledgerDir: String): Seq[(Long, String)] = {
    import spark.implicits._
    val ledger =
      try Some(spark.read.parquet(ledgerDir)) catch { case _: Exception => None }
    val todo = pending(requests, ledger)
      .orderBy(col("request_id"))
      .select(col("request_id").cast("long"), col("aggregation_function"))
      .collect()
    val fulfilled = todo.flatMap { row =>
      val id = row.getLong(0)
      route(row.getString(1)).flatMap { fn =>
        // A failing request must not abort the pass (the reference loop
        // continues past failures); unledgered failures retry next pass.
        try {
          val path = s"$outDir/request_$id"
          fn(spark, sfDir).coalesce(1)
            .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
          Some(id -> path)
        } catch {
          case e: Exception =>
            System.err.println(s"[dispatch] request $id failed: ${e.getMessage}")
            None
        }
      }
    }.toSeq
    if (fulfilled.nonEmpty)
      fulfilled.toDF("request_id", "file_location")
        .withColumn("fulfilled_at", current_timestamp())
        .write.mode(SaveMode.Append).parquet(ledgerDir)
    fulfilled
  }

  /** The `data_requests` row shape (reference DDL process.py:282-295). */
  val requestSchema: StructType = StructType(Seq(
    StructField("request_id", LongType),
    StructField("processed_capture_id", StringType),
    StructField("who_requested", IntegerType),
    StructField("aggregation_function", StringType),
    StructField("is_it_fulfilled", IntegerType),
    StructField("url", StringType)))

  /** The reference's whole serving loop as ONE streaming query: watch the
    * requests directory, and for each micro-batch of new request records
    * run the dispatcher (T1's 10-second poll + T3's dispatch fused).
    * `foreachBatch` + the checkpoint give each request exactly-once
    * processing across restarts; the ledger remains the audit trail. */
  def streamRequests(spark: SparkSession, requestsDir: String, sfDir: String,
                     outDir: String, ledgerDir: String, checkpointDir: String,
                     trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    spark.readStream
      .schema(requestSchema)
      .json(requestsDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        run(spark, sfDir, batch, outDir, ledgerDir); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
