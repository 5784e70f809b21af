package graft

import graft.operators.Hybrid
import org.apache.spark.sql.functions._

/** Generalized multi-probe hybrid retrieval ([[Hybrid.hybridTopKMulti]],
  * VERDICT r12 ask #8): structural contracts the oracle hash can't state
  * directly — the single-probe query is exactly the q_id-0 slice, every
  * probe yields a full fused top-k, and the salted two-stage lexical
  * top-k changes nothing about WHICH rows win. */
class HybridSpec extends SparkSpec {

  test("hybrid_topk is exactly the q_id-0 slice of hybrid_topk_multi") {
    val single = Hybrid.hybridTopK(spark, sf)
      .select("doc_id", "lex_rank", "vec_rank", "rrf_score")
    val slice = Hybrid.hybridTopKMulti(spark, sf)
      .filter(col("q_id") === 0)
      .select("doc_id", "lex_rank", "vec_rank", "rrf_score")
    assert(single.exceptAll(slice).count() == 0 &&
      slice.exceptAll(single).count() == 0,
      "probe-0 fusion must be identical between the single and multi forms")
  }

  test("every probe yields FusedK rows with ranks from both arms represented") {
    val multi = Hybrid.hybridTopKMulti(spark, sf).cache()
    try {
      val perProbe = multi.groupBy("q_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perProbe.keySet == Set(0L, 1L, 2L, 3L, 4L),
        s"all 5 probes must fuse (got ${perProbe.keySet})")
      assert(perProbe.values.forall(_ == Hybrid.FusedK.toLong),
        s"each probe must produce FusedK=${Hybrid.FusedK} rows (got $perProbe)")
      // RRF sanity: a doc surfaced by BOTH arms outscores the best
      // possible one-arm doc at the same ranks; scores are positive and
      // bounded by 2 * RrfScale/(RrfK+1)
      val maxScore = multi.agg(max("rrf_score")).first().getLong(0)
      val minScore = multi.agg(min("rrf_score")).first().getLong(0)
      assert(minScore > 0L)
      assert(maxScore <= 2L * (Hybrid.RrfScale / (Hybrid.RrfK + 1)))
      // at least one fused row should carry both ranks (the corpus is
      // small enough that the arms overlap for some probe)
      assert(multi.filter(col("lex_rank").isNotNull && col("vec_rank").isNotNull)
        .count() > 0, "arms never overlap — fusion is vacuous")
    } finally multi.unpersist()
  }

  test("salted two-stage lexical top-k equals the direct per-probe top-k") {
    import graft.functions.TextAnalytics
    val docs = Tables.documents(spark, sf)
    // salt=64 is the production path; salt=1 degenerates the local stage
    // to a single bucket per probe, i.e. the direct one-window top-k —
    // membership AND ranks must be identical (the top-k-per-salt-bucket
    // union provably contains the global top-k)
    val twoStage = TextAnalytics
      .bm25MultiFrom(docs, TextAnalytics.Bm25Probes, Hybrid.ArmK, saltBuckets = 64)
    val direct = TextAnalytics
      .bm25MultiFrom(docs, TextAnalytics.Bm25Probes, Hybrid.ArmK, saltBuckets = 1)
    assert(twoStage.exceptAll(direct).count() == 0 &&
      direct.exceptAll(twoStage).count() == 0,
      "salting must not change the per-probe top-k membership or ranks")
  }
}
