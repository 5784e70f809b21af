package graft

/** Scale-hazard guard over every registered query's physical plan:
  * no CartesianProduct, no single-partition exchange (a window or sort
  * missing its PARTITION BY serializes the job onto one task), and
  * broadcast-nested-loop only where a broadcast cross join is the design
  * (ann_brute_force streams the corpus against broadcast queries).
  * Catches the reference's unpartitioned-window hazard (SURVEY §4.2)
  * ever re-entering the codebase. */
class PlanGuardSpec extends SparkSpec {

  // broadcast cross joins that ARE the design: a streamed corpus scan
  // against a broadcast query/centroid table (no shuffle of the big side),
  // a broadcast ONE-ROW scalar (tfidf_terms' corpus size N), or
  // ann_pq_adc's LUT construction (queries x codebook — both tiny by
  // definition; the corpus side only ever sees a broadcast hash join).
  // Counts are EXACT per query: ann_recall composes three sanctioned
  // ANN plans (brute force + both PQ LUTs; IVF joins hash) — a fourth
  // nested loop regressing in must still fail.
  private val bnljAllowed = Map("ann_brute_force" -> 1, "kmeans_assign" -> 1,
    // semdedup: the kmeans_assign centroid broadcast (corpus streams
    // against the k-row centroid table; pairs/losers are equi-joins);
    // the trained form swaps only the centroid input (same one BNLJ)
    "semdedup" -> 1, "semdedup_trained" -> 1,
    "tfidf_terms" -> 1, "ann_pq_adc" -> 1, "txt_lm_score" -> 1,
    "ann_pq_trained" -> 1, "ann_ivf_trained" -> 1, "ann_recall" -> 4,
    // occ_ann_delete: the same serve path over the delete-filtered
    // assignments — same single probe BNLJ
    "occ_ann_delete" -> 1,
    // occ_ann_serve: ann_ivf_trained's probe shape (queries x broadcast
    // codebook — both tiny) served from the stored index tables
    "occ_ann_serve" -> 1,
    "sql_q15" -> 1, "sql_q22" -> 1, "customer_rfm" -> 1,
    "customer_rfm_approx" -> 1,
    // sql_q11: the 1%-of-total threshold is a one-row broadcast joined
    // back over the per-part aggregate (the tfidf/Q15 scalar pattern)
    "sql_q11" -> 1,
    // corpus_budget_select(+_bpe): TWO one-row scalars broadcast back —
    // the token budget over the docs and the bucket cutoff over the
    // bucket table (the _bpe twin changes only the token-count
    // projection, not the scalar plumbing)
    "corpus_budget_select" -> 2,
    "corpus_budget_select_bpe" -> 2,
    "txt_collocations" -> 1, "trending_events" -> 1,
    // bm25_topk: the (N, Σdl) corpus statistics reduce map-side to ONE
    // row broadcast back over the query-term tf rows (the tfidf_terms
    // corpus-N shape)
    "bm25_topk" -> 1,
    // hybrid_topk composes both sanctioned arms: bm25's stats broadcast
    // + ann_brute_force's corpus-vs-broadcast-queries cross join
    "hybrid_topk" -> 2,
    // hybrid_topk_multi: the same two arms run once for all 5 probes
    "hybrid_topk_multi" -> 2,
    // dsir_topk: both n-gram-model totals reduce in one pass to a single
    // one-row scalar broadcast back over the HashDim-bounded model table
    // (the tfidf_terms corpus-N shape); the scoring join itself is a
    // broadcast HASH join and the top-k is TakeOrderedAndProject
    "dsir_topk" -> 1)

  // single-partition exchanges that ARE the design: a global mergeable-
  // sketch aggregation partial-aggregates map-side and exchanges only the
  // per-partition sketch buffers (bytes, not rows) to one final merge —
  // the canonical 1000-executor reduction, not a serialization hazard.
  // tfidf_terms' global count(*) is the same shape: one long per input
  // partition crosses the exchange.
  // events_funnel's count-triple roll-up, txt_lm_score's corpus N, and
  // the data-quality global metrics are the same map-side-partial
  // global-reduction shape as tfidf_terms. Counted EXACTLY like the
  // BNLJs: a further single-partition exchange regressing in behind the
  // sanctioned ones (e.g. the funnel's user window losing its PARTITION
  // BY) must still fail the guard. dq_checks unions three independent
  // global-metric branches (lineitem fused pass, orders nulls, FK count).
  // sql_q15's revenue max and sql_q22's average balance are one-row
  // scalar aggregates: per-partition partials reduce to one double each
  // before the exchange — the tfidf_terms corpus-N shape.
  private val spAllowed = Map("approx_topk_check" -> 1, "tfidf_terms" -> 1,
    "events_funnel" -> 1, "txt_lm_score" -> 1, "data_profile" -> 1,
    "profile_approx" -> 2, "dq_checks" -> 3, "sql_q15" -> 1, "sql_q22" -> 1,
    "sql_q14" -> 1, "session_funnel" -> 1, "customer_rfm" -> 1,
    // sql_q17: the avg_yearly result is a one-row scalar aggregate (the
    // sql_q14/q15 shape — partials reduce to one double each first)
    "sql_q17" -> 1,
    // customer_rfm_approx: the corpus-last scalar agg plus the combined
    // exact+sketch quintile aggregate — each a map-side-partial one-row
    // reduction (the customer_rfm shape, one more because the exact and
    // approx cut passes share one aggregate here)
    "customer_rfm_approx" -> 2,
    // dedup_incremental: the bloom front's scalar subquery reduces the
    // batch's hashes to ONE sketch row (bloom_filter_agg partials merge
    // through a single-partition exchange — a broadcast-sized reduction
    // by construction, exactly the runtime-filter shape)
    "dedup_incremental" -> 1,
    // round-10 TPC-H: q6 and q19 are one-row global revenue sums, q11's
    // threshold is a one-row scalar — all the sql_q14/q15 map-side-partial
    // shape (per-partition partials reduce to one value each before the
    // exchange)
    "sql_q6" -> 1, "sql_q19" -> 1, "sql_q11" -> 1,
    // corpus_budget_select(+_bpe): the take-while window runs over the
    // BUCKET table (≈QualityBuckets aggregate rows, bytes not docs — the
    // approx_topk_check shape) plus the one-row budget scalar
    "corpus_budget_select" -> 2,
    "corpus_budget_select_bpe" -> 2,
    "txt_collocations" -> 1, "trending_events" -> 1,
    // bm25_topk: the one-row (N, Σdl) scalar — per-partition partials
    // reduce to one (long, long) before the exchange (tfidf_terms shape)
    "bm25_topk" -> 1,
    // hybrid_topk: bm25's scalar plus the lexical-arm rank window — a
    // global window over ≤ ArmK CANDIDATE rows by construction (the
    // approx_topk_check bytes-not-rows shape)
    "hybrid_topk" -> 2,
    // hybrid_topk_multi: ONLY bm25's one-row scalar — every rank window
    // (salted local, per-probe final, fusion) keeps a PARTITION BY, so
    // the multi form has FEWER serialization points than the single
    "hybrid_topk_multi" -> 1,
    // dsir_topk: the combined (tt, rt) totals scalar — per-partition
    // partials reduce to one (long, long) before the exchange
    "dsir_topk" -> 1)

  test("no query plan contains a cartesian product or single-partition exchange") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      // each allow-listed query's design has exactly ONE sanctioned BNLJ;
      // a blanket exemption would let a SECOND, corpus-side nested loop
      // regress in unnoticed behind the sanctioned one
      val bnljCount = "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).length
      val spCount = "Exchange SinglePartition".r.findAllMatchIn(plan).length
      Seq(
        if (plan.contains("CartesianProduct")) Some(s"$name: CartesianProduct") else None,
        if (spCount > spAllowed.getOrElse(name, 0))
          Some(s"$name: $spCount Exchange SinglePartition(s), " +
            s"${spAllowed.getOrElse(name, 0)} sanctioned") else None,
        if (bnljCount > bnljAllowed.getOrElse(name, 0))
          Some(s"$name: $bnljCount BroadcastNestedLoopJoin(s), " +
            s"${bnljAllowed.getOrElse(name, 0)} sanctioned") else None
      ).flatten
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
