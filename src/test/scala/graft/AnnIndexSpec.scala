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

  test("delete propagation: a CDC corpus delete is unsearchable at the next publish, no retrain") {
    val root = freshDir("ann_del")
    val corpusT = s"$root/corpus"
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    CommitLog.append(spark, corpusT, emb)
    AnnIndex.build(spark, sf, root)
    val mvBefore = CommitLog.latestVersion(s"$root/manifest")
    val before = rows(AnnIndex.searchFrom(spark, emb, root))
    assert(before.exists { case (_, vid, _, _) => vid % 7 == 3 } &&
      before.exists { case (qid, _, _, _) => qid == 3L },
      "fixture degenerate: the delete set must contain served neighbors AND query 3")

    val v0 = CommitLog.latestVersion(corpusT)
    CommitLog.deleteWhere(spark, corpusT, col("vec_id") % 7 === 3, cdc = true)
    val fits = Codebooks.fitCount.get()
    val to = AnnIndex.syncDeletes(spark, root, corpusT, v0)
    assert(Codebooks.fitCount.get() === fits, "delete maintenance must not retrain")
    val kept = CommitLog.read(spark, corpusT)
    val served = rows(AnnIndex.searchFrom(spark, kept, root))
    assert(served.forall { case (qid, vid, _, _) => qid % 7 != 3 && vid % 7 != 3 },
      "no deleted vector may appear as a query or a neighbor")
    // oracle twin: the in-query trained search over the filtered corpus
    // under the FULL-corpus codebook (assignment is per-row, so filtering
    // assignments == assigning the kept rows)
    val cb = Codebooks.ivf(spark, sf)
    val expected = rows(Similarity.ivfSearchFrom(kept, cb,
      Similarity.assignClusters(kept, cb)))
    assert(served === expected,
      "post-delete serve must equal the filtered-corpus trained search")
    // replaying the same CDC window is idempotent in content
    assert(AnnIndex.syncDeletes(spark, root, corpusT, v0) === to)
    assert(rows(AnnIndex.searchFrom(spark, kept, root)) === served)
    // vacuum safety: the pre-delete pair stays addressable (index time
    // travel) until assignments is vacuumed — the right-to-be-forgotten
    // window is the table's retention window
    assert(rows(AnnIndex.searchFrom(spark, emb, root, asOf = Some(mvBefore))) === before)
  }

  test("a retrain racing an append publishes a clean pair, never a mixed one") {
    val root = freshDir("ann_race")
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    AnnIndex.build(spark, sf, root)
    val (cb0, _) = AnnIndex.current(spark, root)
    // the racing batch: a near-clone of query 1
    val q1 = emb.where(col("vec_id") === 1L).select("embedding")
      .as[Array[Float]].head()
    val novel = q1.clone(); novel(1) = novel(1) + 1e-3f
    val batch = Seq((90101L, novel)).toDF("vec_id", "embedding")
    // a DIFFERENT codebook for the retrain (every centroid shifted), so a
    // mixed publish would be detectable as cross-codebook rows
    val grown = emb.unionByName(batch)
    val cbNew = Codebooks.ivf(spark, sf)
      .withColumn("cl", expr("transform(cl, x -> x + 0.5d)"))
      .localCheckpoint(true)
    // inject the retrain into the widest race window: after the append
    // pinned codebook cb0, before its rows land — the stale-assigned rows
    // arrive INSIDE the post-retrain table
    var fired = false
    AnnIndex.raceSeam = () => if (!fired) {
      fired = true
      AnnIndex.rebuildFrom(spark, grown, cbNew, root)
    }
    try AnnIndex.appendBatch(spark, root, batch, "ann-race", 0L)
    finally AnnIndex.raceSeam = () => ()
    assert(fired, "the race must have been injected")
    // the published pair must be CLEAN: tip codebook is the retrain's,
    // and every assignment row agrees with a fresh assignment under it
    val (cbTip, asTip) = AnnIndex.current(spark, root)
    assert(cbTip > cb0, "the retrain's codebook must have won the tip")
    val assignments = CommitLog.read(spark, s"$root/assignments", Some(asTip))
      .as[(Long, Int)].collect().toMap
    val fresh = Similarity.assignClusters(grown,
      CommitLog.read(spark, s"$root/codebook", Some(cbTip)))
      .as[(Long, Int)].collect().toMap
    assert(assignments === fresh,
      "published assignments must all be the tip codebook's — a stale row " +
        "would make the pair mixed")
    // and the batch is searchable through the repaired publish
    val after = rows(AnnIndex.searchFrom(spark, grown, root))
    assert(after.exists { case (qid, vid, _, rank) =>
      qid == 1L && vid == 90101L && rank == 1 },
      s"the raced batch must still become searchable: ${after.filter(_._1 == 1L).take(3)}")
  }
}
