package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming nearest-centroid assignment — the ONLINE half of
  * `kmeans_assign`, and the serving loop of the IVF index: embeddings
  * arrive on a stream, each micro-batch joins the CURRENT centroid
  * table (re-read per trigger, so a `Codebooks.fit` retrain or an
  * `embCentroids` refresh is picked up at the next batch — the
  * `pitEnrichStream` composition), and assignments land batch-
  * partitioned.
  *
  * Stateless by design: assignment is a pure function of (embedding,
  * centroids), so there is no watermark, no state store, and no
  * seen-set — exactly-once needs only the idempotent per-batch
  * partition overwrite (a replayed batch rewrites identical rows; the
  * embedding-table contract of unique vec_ids holds per stream). The
  * argmin itself is the SHARED [[Similarity.assignFrom]] — online and
  * offline assignments cannot disagree, which is the property that
  * makes online-assigned vectors searchable by the batch IVF probe. */
object AssignStream {

  /** One micro-batch: assign against the centroid table read FRESH from
    * `fixtureDir` (the retrain-pickup point), write to
    * `outDir/batch=<id>`. */
  def processBatch(spark: SparkSession, batch: DataFrame, fixtureDir: String,
                   outDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    BucketedState.overwriteBatch(
      Similarity.assignFrom(batch, Similarity.centroidTable(spark, fixtureDir)),
      outDir, batchId)
  }

  def assignStream(embStream: DataFrame, fixtureDir: String, outDir: String,
                   checkpointDir: String,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    embStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, fixtureDir, outDir, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** All assignments so far (the batch result's shape). */
  def assignments(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    BucketedState.readStore(spark, outDir)
      .fold(Seq.empty[(Long, Int, Int, Boolean)]
        .toDF("vec_id", "orig_label", "assigned_label", "is_same"))(
        _.drop("batch"))
      .orderBy(col("vec_id"))
  }
}
