package graft.streaming

import graft.operators.EventAnalytics
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming SCD-2 dimension maintenance — the upsert/MERGE workflow a
  * warehouse runs on every status stream, built on plain parquet with
  * `foreachBatch` (no table format needed): each micro-batch touches only
  * its AFFECTED users, whose recorded change history is converted back to
  * change events, merged with the batch, and recomputed through the exact
  * batch SCD-2 core ([[EventAnalytics.scd2From]]). Unaffected users'
  * rows are carried over untouched. The swap is the compact-style
  * checked-rename two-phase move, so a crash at any step leaves either
  * the old table or a recoverable backup — never a half-written mix.
  *
  * Semantics: because the table keeps each change's original event_id
  * (`change_eid`), ties re-order exactly as the batch twin would, and a
  * LATE status event retroactively SPLITS the interval it lands in —
  * the true MERGE semantics the funnel family deliberately refuses
  * (contrast [[graft.operators.EventAnalytics.funnelStatefulLate]]).
  * One approximation is inherent to SCD-2 state: a raw event that was
  * change-compressed away is not replayable, so a late event landing
  * between a compressed duplicate pair re-merges against the COMPRESSED
  * history (spec-pinned). With per-user in-order delivery the final
  * table equals the batch twin on the concatenated events exactly.
  *
  * Scale shape: per batch, one left-semi + one left-anti join of the
  * dimension on the (tiny) affected-user set, and the SCD-2 window runs
  * over affected users only — cost scales with the batch's user
  * footprint, not the dimension. The full-table rewrite is the parquet
  * price (a format with row-group replace would drop it); the dimension
  * is users-sized, orders of magnitude under the event stream.
  */
object Scd2Merge {

  case class StatusEv(user_id: Long, event_type: String, ts_ms: Long, event_id: Long)

  /** Merge one batch of status events into the SCD-2 table at `tableDir`. */
  def mergeBatch(batch: DataFrame, tableDir: String): Unit = {
    if (batch.isEmpty) return // an empty micro-batch must not rewrite the table
    val spark = batch.sparkSession
    // Only a genuinely ABSENT table means bootstrap. A catch-all here
    // would turn any transient read failure on an EXISTING table into
    // "no table", and the swap below would then replace the whole
    // dimension with just this batch's users and delete the backup —
    // silent loss of every untouched user's history. Any other read
    // error must abort the batch (foreachBatch retries it).
    val tablePath = new org.apache.hadoop.fs.Path(tableDir)
    val tableFs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (tableFs.exists(tablePath)) Some(spark.read.parquet(tableDir)) else None
    val affected = batch.select(col("user_id")).distinct()
    val oldAsEvents = existing.map(
      _.join(affected, Seq("user_id"), "left_semi")
        .select(col("user_id"), col("status").as("event_type"),
          col("valid_from").as("ts_ms"), col("change_eid").as("event_id")))
    val newEvents = batch
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
    val merged = EventAnalytics.scd2From(
      oldAsEvents.map(_.unionByName(newEvents)).getOrElse(newEvents),
      keepEventId = true)
    val untouched = existing.map(_.join(affected, Seq("user_id"), "left_anti"))
    val next = untouched.map(merged.unionByName(_)).getOrElse(merged)
      .localCheckpoint(true) // materialize BEFORE touching the table dir
    writeSwap(spark, next, tableDir)
  }

  /** compact-style two-phase swap: write to `_merging`, move the live dir
    * aside, move the new one in, drop the backup last. Every rename is
    * CHECKED (Hadoop signals failure by returning false). */
  private def writeSwap(spark: SparkSession, next: DataFrame, tableDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val path = new Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new Path(path.getParent, path.getName + "_premerge")
    if (fs.exists(bak))
      throw new IllegalStateException(
        s"stale $bak from an interrupted merge — recover or remove it first")
    val tmp = new Path(path.getParent, path.getName + "_merging")
    next.write.mode("overwrite").parquet(tmp.toString)
    val hadTable = fs.exists(path)
    if (hadTable && !fs.rename(path, bak))
      throw new IllegalStateException(s"merge aborted: could not move $path aside")
    if (!fs.rename(tmp, path)) {
      if (hadTable) fs.rename(bak, path) // restore; bak still holds the data
      throw new IllegalStateException(s"merge aborted: could not swap $tmp into place")
    }
    if (hadTable) fs.delete(bak, true)
  }

  /** The serving loop: a status-event stream maintained as an SCD-2
    * parquet dimension, one merge per micro-batch, checkpointed so a
    * restart resumes without re-merging delivered batches. */
  def scd2MergeSink(evs: Dataset[StatusEv], tableDir: String, checkpointDir: String,
                    trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    evs.writeStream
      .foreachBatch { (batch: Dataset[StatusEv], _: Long) =>
        mergeBatch(batch.toDF(), tableDir); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
