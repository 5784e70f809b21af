package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bridge to the `private[sql]` streaming-batch constructor (same hosting
  * rationale as [[SessionUtils]]): a V1 `Source.getBatch` result must
  * carry `isStreaming = true` — `MicroBatchExecution` asserts it — and
  * the only way to stamp that flag on an arbitrary plan is the classic
  * session's `internalCreateDataFrame`, which is exactly how Spark's own
  * V1 sources (socket, rate) build their batches. */
object StreamingShim {

  /** A streaming-flagged DataFrame over `files`, read with the FIXED
    * `schema` the stream declared at start (files written after an
    * additive schema evolution simply project the declared columns; a
    * restart picks up the widened schema). Empty `files` → an empty
    * streaming batch of the same schema. The parquet scan keeps its
    * normal whole-stage-codegen physical plan — only the plan ROOT is
    * re-wrapped to carry the streaming flag. */
  def streamingParquetBatch(spark: SparkSession, schema: StructType,
                            files: Seq[String]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd =
      if (files.isEmpty)
        classic.sparkContext
          .emptyRDD[org.apache.spark.sql.catalyst.InternalRow]
      else
        classic.read.schema(schema).parquet(files: _*).queryExecution.toRdd
    classic.internalCreateDataFrame(rdd, schema, isStreaming = true)
  }

  /** Streaming-stamp an already-built batch frame (the CDC feed's
    * per-window union, which is not a plain file list): same mechanics
    * as [[streamingParquetBatch]], with the physical plan taken from the
    * frame itself. The caller fixes column order to the declared schema
    * first. */
  def streamingBatchOf(df: DataFrame, schema: StructType): DataFrame = {
    val classic =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** The inverse stamp, for V1 `Sink.addBatch`: the DataFrame a sink
    * receives still carries streaming leaves, so batch writers reject it —
    * re-root its physical RDD as a plain batch frame (the same move
    * Spark's own ForeachBatchSink makes before handing the user their
    * batch). */
  def batchify(df: DataFrame): DataFrame = {
    val classic =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
