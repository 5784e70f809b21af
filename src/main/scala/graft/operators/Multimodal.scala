package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus feature-extraction over them (builder prompt:
  * the decode step is STUBBED — image/audio codecs aren't in this
  * container — while the Spark-side schema, partitioning, and batch shape
  * are real and tested).
  *
  * The fixture has no binary table, so `mm_features` materializes the
  * payload from `documents.text` (utf-8 bytes) — at ingest time a real
  * deployment would read the bytes from object storage into the same
  * column shape. Every derived feature below is a pure codegen'd function
  * of the bytes, so the whole scan stays in whole-stage codegen and the
  * payload column is pruned away the moment the features are computed.
  */
object Multimodal {

  /** Media record as it would land from ingest: id + opaque payload +
    * typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String,
                         lang: String, n_chars: Long)

  /** Output of the (stubbed) decoder. */
  case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
                           height: Int, n_frames: Int, frame0_crc: Long)

  // --- batch feature extraction (oracle-checked) ---------------------------
  /** Payload → features in one projection: byte length, content md5, the
    * first 8 payload bytes as hex (a magic-number/header probe), and a
    * deterministic FAKE decode (width/height/frame-count derived from the
    * byte length — a stand-in for the codec call, clearly marked). */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("text"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("byte_len"),
        md5(col("text")).as("content_md5"),
        substring(hex(col("payload")), 1, 16).as("header_hex"),
        // -- stubbed decode: deterministic fake in place of a codec --
        (octet_length(col("payload")) % 640).as("width"),
        ((octet_length(col("payload")) * 7) % 480).as("height"),
        (octet_length(col("payload")) % 24 + 1).as("n_frames"))
      .orderBy(col("doc_id"))

  val mmFeaturesSql: String =
    """SELECT doc_id,
      |       CAST(octet_length(text::BLOB) AS INT) AS byte_len,
      |       md5(text) AS content_md5,
      |       substring(hex(text::BLOB), 1, 16) AS header_hex,
      |       CAST(octet_length(text::BLOB) % 640 AS INT) AS width,
      |       CAST((octet_length(text::BLOB) * 7) % 480 AS INT) AS height,
      |       CAST(octet_length(text::BLOB) % 24 + 1 AS INT) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // --- frame sampling (1→N expansion) --------------------------------------
  /** Frame-sample the payload: one output row per sampled frame, offsets
    * at a fixed stride, each carrying a hex window of the bytes at its
    * offset (the stand-in for a decoded frame). The explode keeps memory
    * bounded per row — the shape a video pipeline uses to fan a clip out
    * to per-frame records for downstream featurizers. */
  def mmFrameSample(spark: SparkSession, dir: String, stride: Int = 64,
                    maxFrames: Int = 4): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_frames",
        least(floor(octet_length(col("payload")) / stride) + 1, lit(maxFrames)).cast("int"))
      .select(col("doc_id"), col("payload"),
        posexplode(expr(s"sequence(0, n_frames - 1)")).as(Seq("pos", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * stride).cast("int").as("byte_offset"),
        substring(hex(col("payload")), 1, 2 * 8).as("header_hex"),
        expr(s"substring(hex(payload), frame_idx * $stride * 2 + 1, 16)").as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val mmFrameSampleSql: String =
    """WITH p AS (
      |  SELECT doc_id, text::BLOB AS payload,
      |         CAST(least(octet_length(text::BLOB) // 64 + 1, 4) AS INT) AS n_frames
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(u.frame_idx AS INT) AS frame_idx,
      |       CAST(u.frame_idx * 64 AS INT) AS byte_offset,
      |       substring(hex(payload), 1, 16) AS header_hex,
      |       substring(hex(payload), u.frame_idx * 64 * 2 + 1, 16) AS frame_hex
      |FROM p, unnest(range(0, n_frames)) AS u(frame_idx)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // --- typed decode pipeline (mapPartitions batch shape) -------------------
  /** The decode path a real deployment would run: partition-wise batches of
    * [[MediaRecord]] through a decoder into [[MediaFeatures]]. The decoder
    * here is a deterministic stub (??? replaced by byte arithmetic) — the
    * partitioning, encoder plumbing, and per-partition batching are the
    * real contract a codec (libjpeg/ffmpeg behind a JNI or Pandas-UDF
    * boundary) would drop into. Used by tests; not an oracle query (the
    * typed path exists to exercise the Dataset API surface). */
  def decodeStub(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // One decoder instance per partition — the expensive-init seam where
      // a real codec context would be created once and reused.
      it.map { r =>
        val len = r.payload.length
        val crc = new java.util.zip.CRC32()
        crc.update(r.payload, 0, math.min(len, 64))
        MediaFeatures(r.doc_id, len, len % 640, (len * 7) % 480, len % 24 + 1,
          crc.getValue)
      }
    }
  }

  /** documents → typed MediaRecord dataset (the ingest-side adapter). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"), col("lang"), col("n_chars"))
      .as[MediaRecord]
  }

  // --- audio-style fixed-frame segmentation (oracle-checked) ----------------
  /** Shared with the oracle SQL so non-default call sites can't diverge. */
  val AudioChunkBytes: Int = 256
  /** Fake decode parameter: bytes-per-millisecond of the stubbed codec
    * (16 kHz mono 8-bit → 16 bytes/ms). */
  val AudioBytesPerMs: Int = 16

  /** Segment each payload into fixed-size byte frames covering the WHOLE
    * payload (unlike mm_frame_sample's capped probe): per-chunk offset,
    * length, an md5 fingerprint of the chunk bytes (via the hex view —
    * byte-identical across engines), and a stubbed duration from a fake
    * sample rate. This is the fan-out shape of audio pipelines (VAD,
    * diarization, ASR batching): 1→N bounded by payload_len/chunk, all
    * codegen'd, no decoder on the hot path. */
  def mmAudioChunks(spark: SparkSession, dir: String,
                    chunkBytes: Int = AudioChunkBytes): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      // hex the payload ONCE per document, before the fan-out — inside the
      // per-chunk projection it would re-hex the whole payload for every
      // chunk row, O(len^2/chunk) per document (the oracle's CTE computes
      // hx once for the same reason). Zero-length payloads emit no chunks
      // (the filter also keeps the sequence upper bound non-negative —
      // sequence(0, -1) would DESCEND and emit garbage rows).
      .select(col("doc_id"), hex(col("payload")).as("hx"),
        octet_length(col("payload")).as("blen"))
      .filter(col("blen") > 0)
      .select(col("doc_id"), col("hx"), col("blen"),
        posexplode(expr(s"sequence(0, int((blen + $chunkBytes - 1) div $chunkBytes) - 1)"))
          .as(Seq("pos", "chunk_idx")))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * chunkBytes).cast("int").as("byte_off"),
        least(lit(chunkBytes), col("blen") - col("chunk_idx") * chunkBytes)
          .cast("int").as("chunk_len"),
        md5(expr(s"substring(hx, chunk_idx * $chunkBytes * 2 + 1, ${2 * chunkBytes})"))
          .as("chunk_md5"),
        // -- stubbed decode: duration from the fake sample rate --
        expr(s"int(least($chunkBytes, blen - chunk_idx * $chunkBytes) div $AudioBytesPerMs)")
          .as("chunk_ms"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val mmAudioChunksSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, hex(text::BLOB) AS hx, octet_length(text::BLOB) AS blen
       |  FROM documents
       |)
       |SELECT doc_id,
       |       CAST(i AS INT) AS chunk_idx,
       |       CAST(i * $AudioChunkBytes AS INT) AS byte_off,
       |       CAST(least($AudioChunkBytes, blen - i * $AudioChunkBytes) AS INT) AS chunk_len,
       |       md5(substring(hx, CAST(i * $AudioChunkBytes * 2 + 1 AS INT), ${2 * AudioChunkBytes})) AS chunk_md5,
       |       CAST(least($AudioChunkBytes, blen - i * $AudioChunkBytes) // $AudioBytesPerMs AS INT) AS chunk_ms
       |FROM d, LATERAL unnest(range((blen + ${AudioChunkBytes - 1}) // $AudioChunkBytes)) AS t(i)
       |ORDER BY doc_id, chunk_idx""".stripMargin
}
