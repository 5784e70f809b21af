package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming MinHash-LSH near-dup detection (VERDICT r10 next-round #5):
  * the incremental form of [[Dedup.minhashLshFrom]] — documents arrive in
  * micro-batches, and each batch's near-dup pairs (batch×batch AND
  * batch×everything-seen-before) are detected AT ARRIVAL, not in a
  * nightly recluster.
  *
  * State lives in four append-only parquet tables under `stateDir`:
  *   - `sigs`   — one [[Dedup.minhashSignatures]] row per doc ever seen
  *   - `bands`  — its 15-band LSH index (doc_id, band, band_key)
  *   - `corpus` — (doc_id, text), read back ONLY for candidate
  *                verification (shingles are recomputed for candidate
  *                docs — candidates ≪ corpus, so re-shingling the few is
  *                the scale move vs storing every (doc, shingle) row)
  *   - `pairs`  — the verified output (d1, d2, jaccard), appended per
  *                batch
  *
  * Incremental completeness: every candidate pair involves ≥1 new doc
  * (new×new within the batch, new×old via the band-store join), and a
  * doc is "new" exactly once, so each pair is discovered exactly once —
  * the accumulated `pairs` table equals the one-shot batch run over the
  * union corpus (StreamingSpec pins stream == batch across micro-batches,
  * including a cross-batch near-dup pair).
  *
  * Bucket-cap semantics (deliberate divergence, PREFIX form): a bucket
  * is skipped once its ACCUMULATED size (old + new members) exceeds
  * `maxBucket`. The one-shot form drops an oversized bucket's pairs
  * retroactively; a stream cannot un-emit, so pairs found while the
  * bucket was small persist. Equality with the batch form therefore
  * holds whenever no bucket exceeds the cap — the spec pins both this
  * and the prefix behavior.
  *
  * Exactly-once: batch replay is keyed out at the DOC level — incoming
  * doc_ids already in `sigs` are dropped before any candidate
  * generation, so a checkpoint-replayed micro-batch appends nothing
  * (same discipline as the streaming incremental exact dedup).
  *
  * 100 TB shape per batch: signature build is batch-sized (linear scan);
  * the candidate join probes the band store on (band, band_key) — an
  * equi-join Spark shuffles on the band key, skew-capped by the bucket
  * guard; verification joins are candidate-sized. Nothing iterates, no
  * driver state beyond the store paths.
  */
object LshStream {

  private def path(stateDir: String, t: String) = s"$stateDir/$t"

  private def readOr(spark: SparkSession, p: String, empty: => DataFrame): DataFrame =
    try spark.read.parquet(p) catch { case _: Exception => empty }

  /** One micro-batch: detect pairs against everything seen, then admit
    * the batch into the stores. Batch-static, callable directly (the
    * spec's equivalence harness) or from [[minhashLshStream]]. */
  def processBatch(spark: SparkSession, newDocsRaw: DataFrame, stateDir: String,
                   maxBucket: Int = 50): Unit = {
    import spark.implicits._
    val sigsP = path(stateDir, "sigs"); val bandsP = path(stateDir, "bands")
    val corpusP = path(stateDir, "corpus"); val pairsP = path(stateDir, "pairs")

    val oldSigs = readOr(spark, sigsP,
      Seq.empty[(Long, Long)].toDF("doc_id", "set_n"))
    val oldBands = readOr(spark, bandsP,
      Seq.empty[(Long, Int, String)].toDF("doc_id", "band", "band_key"))

    // replay idempotence + in-batch doc dedup: one row per UNSEEN doc_id
    val newDocs = newDocsRaw.select(col("doc_id"), col("text"))
      .groupBy(col("doc_id")).agg(first(col("text")).as("text"))
      .join(oldSigs.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // read repeatedly below; lineage is batch-local
    if (newDocs.isEmpty) return

    val newSh = Dedup.shinglesOf(newDocs).persist()
    val newSigs = Dedup.minhashSignatures(newSh).localCheckpoint(true)
    val newBands = Dedup.bandsOf(newSigs).localCheckpoint(true)

    // candidate pairs: ≥1 new member, keyed (band, band_key); accumulated
    // bucket size (old+new) caps the bucket exactly once, PREFIX semantics
    val allBands = oldBands.unionByName(newBands)
    val smallBuckets = allBands.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
      .select(col("band"), col("band_key"))
    val nb = newBands.join(smallBuckets, Seq("band", "band_key"))
    val ab = allBands.join(smallBuckets, Seq("band", "band_key"))
    val cand = nb.as("a")
      .join(ab.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
      .distinct()

    // exact verification: shingles for the candidate docs only — new docs
    // from the batch, old docs re-shingled from the corpus store
    val candIds = cand.select(col("d1").as("doc_id"))
      .unionByName(cand.select(col("d2").as("doc_id"))).distinct()
    val oldCandDocs = readOr(spark, corpusP,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
      .join(candIds, Seq("doc_id"), "left_semi")
    val candSh = newSh.join(candIds, Seq("doc_id"), "left_semi")
      .unionByName(Dedup.shinglesOf(oldCandDocs))
    val sizes = oldSigs.select(col("doc_id"), col("set_n"))
      .unionByName(newSigs.select(col("doc_id"), col("set_n")))
    val inter = cand
      .join(candSh.select(col("doc_id").as("d1"), col("shingle")), "d1")
      .join(candSh.select(col("doc_id").as("d2"), col("shingle")), Seq("d2", "shingle"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(sizes.select(col("doc_id").as("d1"), col("set_n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("set_n").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter")).cast("double"))
          .as("jaccard"))

    pairs.write.mode(SaveMode.Append).parquet(pairsP)
    newSigs.write.mode(SaveMode.Append).parquet(sigsP)
    newBands.write.mode(SaveMode.Append).parquet(bandsP)
    newDocs.write.mode(SaveMode.Append).parquet(corpusP)
    newSh.unpersist()
    ()
  }

  /** The streaming query: `foreachBatch` over a documents stream
    * (doc_id, text), near-dup pairs accumulating under
    * `stateDir/pairs`. */
  def minhashLshStream(docsStream: DataFrame, stateDir: String, checkpointDir: String,
                       maxBucket: Int = 50,
                       trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, maxBucket)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Accumulated verified pairs, the batch result's shape. */
  def pairs(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    readOr(spark, path(stateDir, "pairs"),
      Seq.empty[(Long, Long, Double)].toDF("d1", "d2", "jaccard"))
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
  }
}
