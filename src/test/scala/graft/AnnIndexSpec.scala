package graft

import graft.operators.{AnnIndex, Codebooks, Similarity}
import graft.sources.CommitLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persisted, maintained ANN index (r17 verdict ask #4). Claims:
  *   - serving from the stored tables equals the in-query trained search
  *     EXACTLY, and does zero training;
  *   - assignments are maintained incrementally from the corpus table's
  *     CHANGE FEED: a new embedding becomes searchable after one
  *     trigger, exactly-once across batch replays;
  *   - a retrain swap is ATOMIC: one manifest commit moves readers from
  *     the old (codebook, assignments) pair to the new one, the old pair
  *     stays addressable (index-level time travel), and the pinned pair
  *     components only ever advance together. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(p: String): String =
    Files.createTempDirectory(p).toString

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.as[(Long, Long, Double, Int)].collect().toSeq

  test("stored-index search equals the in-query trained search; serving never trains") {
    val root = freshDir("ann_idx")
    AnnIndex.build(spark, sf, root)
    val fits = Codebooks.fitCount.get()
    val served = rows(AnnIndex.searchFrom(spark, Tables.embeddings(spark, sf), root))
    val trained = rows(Similarity.annIvfTrained(spark, sf))
    assert(served === trained,
      "store -> snapshot-read -> probe must reproduce the in-query search exactly")
    assert(Codebooks.fitCount.get() === fits, "searchFrom must not train")
  }

  test("change-feed maintenance: searchable after one trigger, exactly-once, atomic retrain swap") {
    val corpusT = freshDir("ann_corpus")
    val root = freshDir("ann_idx2")
    val ckpt = freshDir("ann_ckpt")
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    CommitLog.append(spark, corpusT, emb)
    // the index starts with the TRAINED codebook and EMPTY assignments:
    // the change feed's genesis batch is what populates them, so the
    // maintenance path is proven to build the whole index, not only to
    // top an offline build up
    AnnIndex.rebuildFrom(spark, CommitLog.read(spark, corpusT).limit(0),
      Codebooks.ivf(spark, sf), root)

    val q = spark.readStream
      .format("graft-changefeed").option("table", corpusT).load()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        AnnIndex.appendBatch(spark, root, b, "ann-maint", id); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    val corpus = CommitLog.read(spark, corpusT)
    val seeded = rows(AnnIndex.searchFrom(spark, corpus, root))
    assert(seeded === rows(Similarity.annIvfTrained(spark, sf)),
      "the stream-populated index must serve exactly the in-query result")

    // a near-clone of query 0 arrives on the corpus table; after one
    // trigger it must be query 0's rank-1 neighbor through the index
    val q0 = emb.where(col("vec_id") === 0L).select("embedding")
      .as[Array[Float]].head()
    val novel = q0.clone(); novel(0) = novel(0) + 1e-3f
    CommitLog.append(spark, corpusT, Seq((90001L, novel)).toDF("vec_id", "embedding"))
    q.processAllAvailable()
    q.stop()
    val grown = CommitLog.read(spark, corpusT)
    val after = rows(AnnIndex.searchFrom(spark, grown, root))
    assert(after.exists { case (qid, vid, _, rank) =>
      qid == 0L && vid == 90001L && rank == 1 },
      s"the new embedding must be searchable at rank 1 for query 0: " +
        s"${after.filter(_._1 == 0L).take(3)}")

    // exactly-once: replaying the second batch is a txn-marker no-op —
    // no duplicate assignment row, no re-publish
    val manifestTip = CommitLog.latestVersion(s"$root/manifest")
    AnnIndex.appendBatch(spark, root,
      Seq((90001L, novel)).toDF("vec_id", "embedding"), "ann-maint", 1L)
    assert(CommitLog.latestVersion(s"$root/manifest") === manifestTip,
      "a replayed batch must not re-publish")
    assert(CommitLog.read(spark, s"$root/assignments")
      .where(col("vec_id") === 90001L).count() === 1L)

    // maintenance: compact the per-batch assignment fragments through
    // the table layer's policy tick; the published pair serves the
    // identical rows from fewer files
    val filesBefore = CommitLog.snapshot(s"$root/assignments").files.size
    assert(AnnIndex.maintain(spark, root, maxFiles = 1, targetFiles = 1) >= 0,
      "an over-threshold tick must compact")
    assert(CommitLog.snapshot(s"$root/assignments").files.size < filesBefore)
    assert(rows(AnnIndex.searchFrom(spark, grown, root)) === after,
      "compaction must not change what the index serves")

    // retrain swap: two table overwrites, ONE manifest commit — readers
    // move atomically, the old pair stays addressable
    val mv0 = CommitLog.latestVersion(s"$root/manifest")
    val (cb0, as0) = AnnIndex.current(spark, root)
    AnnIndex.rebuildFrom(spark, grown, Codebooks.ivf(spark, sf), root)
    assert(CommitLog.latestVersion(s"$root/manifest") === mv0 + 1,
      "the swap's visibility point must be exactly one manifest commit")
    val (cb1, as1) = AnnIndex.current(spark, root)
    assert(cb1 > cb0 && as1 > as0,
      "the pinned pair must advance together, never mix old with new")
    assert(rows(AnnIndex.searchFrom(spark, grown, root, asOf = Some(mv0))) === after,
      "the pre-swap pair must stay addressable and consistent (index time travel)")
    assert(rows(AnnIndex.searchFrom(spark, grown, root)) === after,
      "same corpus + same trainer: the rebuilt index serves the same answer")
  }
}
