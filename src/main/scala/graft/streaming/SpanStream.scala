package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming substring-span dedup: the incremental form of
  * [[Dedup.dupSpanRows]] — documents arrive in micro-batches, and every
  * document whose duplicated-span set CHANGES (a new doc duplicating an
  * old one changes BOTH docs' spans) has its full span set recomputed
  * and re-emitted at that batch. Unlike the near-dup pair stream (a pair
  * is discovered exactly once), a document's spans GROW as more
  * duplicates of its text arrive, so the output is an UPSERT table:
  * per document, the latest-batch version is current — and, because a
  * document is re-emitted in exactly the batches where its span set
  * changes, the current version always equals the one-shot batch run
  * over everything seen (full equality, no prefix caveat — the spec
  * pins it after every single micro-batch).
  *
  * State (all batch-partitioned, the [[LshStream]] exactly-once layout:
  * read strictly-before-my-batch, overwrite my own partitions, so a
  * crash between table writes converges on replay):
  *   - `wins` — one (doc_id, pos, h) row per window of every admitted
  *     doc (the [[Dedup.slidingWindowRows]] fingerprints). Kept instead
  *     of text so an old document's spans recompute WITHOUT re-reading
  *     or re-hashing its text.
  *   - `docs` — admitted doc_ids. Seen-ness keys here, not on `wins`:
  *     a document shorter than the window has no fingerprint rows but
  *     must still replay/arrive-again as a no-op (the LshStream short-doc
  *     lesson).
  *   - `spans` — per batch, the recomputed span sets of that batch's
  *     AFFECTED documents.
  *
  * Per-batch work: new docs' windows build batch-sized; the only
  * corpus-scale operation is the hash join of the accumulated `wins`
  * store against the batch's TOUCHED hashes (semi-join pruned — the
  * LshStream band-probe shape), and span merging runs only over
  * affected documents. A hash's shared-status is monotone (documents
  * are only ever added), so no un-flagging path exists. */
object SpanStream {

  private def path(stateDir: String, t: String) = s"$stateDir/$t"

  private def readBefore(spark: SparkSession, p: String, batchId: Long,
                         empty: => DataFrame): DataFrame =
    (try Some(spark.read.parquet(p))
     catch { case _: org.apache.spark.sql.AnalysisException => None })
      .fold(empty)(df => df.filter(col("batch") < batchId).drop("batch"))

  private def overwriteBatch(df: DataFrame, p: String, batchId: Long): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$p/batch=$batchId")

  /** One micro-batch. `batchId` must be the stream's monotone
    * micro-batch id (replay key AND state partition, as in
    * [[LshStream.processBatch]]). */
  def processBatch(spark: SparkSession, newDocsRaw: DataFrame, stateDir: String,
                   batchId: Long): Unit = {
    import spark.implicits._
    val winsP = path(stateDir, "wins")
    val docsP = path(stateDir, "docs")
    val spansP = path(stateDir, "spans")

    val oldWins = readBefore(spark, winsP, batchId,
      Seq.empty[(Long, Long, Long)].toDF("doc_id", "pos", "h"))
    val oldDocs = readBefore(spark, docsP, batchId,
      Seq.empty[Long].toDF("doc_id"))

    // min_by(text, md5(text)): deterministic in-batch doc dedup (the
    // LshStream.processBatch note — first() is partition-order-dependent)
    val newDocs = newDocsRaw.select(col("doc_id"), col("text"))
      .groupBy(col("doc_id")).agg(min_by(col("text"), md5(col("text"))).as("text"))
      .join(oldDocs, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    if (newDocs.isEmpty) return

    val newWins = Dedup.slidingWindowRows(newDocs).localCheckpoint(true)
    val allWins = oldWins.unionByName(newWins)

    // hashes this batch TOUCHES — only they can change shared-status
    // (monotone: a hash never un-shares); distinct'd batch-side so the
    // store join is a semi against a batch-sized key set
    val touched = newWins.select(col("h")).distinct()
    // shared-status of touched hashes over the WHOLE accumulated corpus
    val sharedTouched = allWins.join(touched, Seq("h"), "left_semi")
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"))
      .filter(col("dmin") =!= col("dmax")).select(col("h"))
    // a doc is AFFECTED iff it holds a touched hash that is (now) shared
    val affectedDocs = allWins.join(sharedTouched, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()

    // full span recompute for affected docs: their windows, flagged by
    // shared-status over the whole corpus (not only touched hashes — an
    // affected doc's OTHER spans must survive the rewrite)
    val affWins = allWins.join(affectedDocs, Seq("doc_id"), "left_semi")
    val sharedForThem = allWins
      .join(affWins.select(col("h")).distinct(), Seq("h"), "left_semi")
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"))
      .filter(col("dmin") =!= col("dmax")).select(col("h"))
    val flagged = affWins.join(sharedForThem, "h").select(col("doc_id"), col("pos"))
    val spans = Dedup.mergeSpans(flagged)

    overwriteBatch(spans, spansP, batchId)
    overwriteBatch(newWins, winsP, batchId)
    overwriteBatch(newDocs.select(col("doc_id")), docsP, batchId)
  }

  /** The streaming query: `foreachBatch` over a (doc_id, text) stream. */
  def spanStream(docsStream: DataFrame, stateDir: String, checkpointDir: String,
                 trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Current span sets: per document, the LATEST batch's version wins
    * (a doc re-emits exactly when its spans change). Same crash-window
    * visibility contract as [[LshStream.pairs]]. */
  def spans(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val p = path(stateDir, "spans")
    val raw =
      (try Some(spark.read.parquet(p))
       catch { case _: org.apache.spark.sql.AnalysisException => None })
        .getOrElse(Seq.empty[(Long, Long, Long, Long, Int)]
          .toDF("doc_id", "span_start", "span_end", "n_windows", "batch"))
    val latest = raw.withColumn("maxb",
      max(col("batch")).over(Window.partitionBy("doc_id")))
      .filter(col("batch") === col("maxb"))
      .drop("batch", "maxb")
    latest.orderBy(col("doc_id"), col("span_start"))
  }
}
