package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
import graft.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a
  * `(SparkSession, sfDir) => DataFrame` plus (where ANSI-SQL-expressible)
  * a DuckDB oracle twin with IDENTICAL output column names — the driver
  * hash-compares the two at sf0.01.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2): user_energy — JSON struct access,
    * filter, partitioned window-lag, scalar math, null guard, sort.
    * Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Komodo.userEnergy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference analytics (SURVEY §2.2-2.6, process.py) --
    "agg_interaction" -> ((s, d) => Komodo.aggInteraction(s, d)),
    "agg_user"        -> ((s, d) => Komodo.aggUser(s, d)),
    "user_energy"     -> ((s, d) => Komodo.userEnergy(s, d)),
    "drawing_pattern" -> ((s, d) => Komodo.drawingPattern(s, d)),
    "user_proximity"  -> ((s, d) => Komodo.userProximity(s, d)),
    // -- relational coverage (SURVEY §2.3-2.8 + §7.3 step 5) --
    "q1_agg"             -> ((s, d) => Relational.q1Agg(s, d)),
    "join_revenue"       -> ((s, d) => Relational.joinRevenue(s, d)),
    "part_join_agg"      -> ((s, d) => Relational.partJoinAgg(s, d)),
    "semi_join_customers" -> ((s, d) => Relational.semiJoinCustomers(s, d)),
    "anti_join_customers" -> ((s, d) => Relational.antiJoinCustomers(s, d)),
    "left_join_orders"   -> ((s, d) => Relational.leftJoinOrders(s, d)),
    "full_outer_join"    -> ((s, d) => Relational.fullOuterJoin(s, d)),
    "rollup_pricing"     -> ((s, d) => Relational.rollupPricing(s, d)),
    "cube_orders"        -> ((s, d) => Relational.cubeOrders(s, d)),
    "grouping_sets"      -> ((s, d) => Relational.groupingSets(s, d)),
    "window_topk_orders" -> ((s, d) => Relational.windowTopkOrders(s, d)),
    "window_running_sum" -> ((s, d) => Relational.windowRunningSum(s, d)),
    "set_union"          -> ((s, d) => Relational.setUnion(s, d)),
    "set_intersect"      -> ((s, d) => Relational.setIntersect(s, d)),
    "set_except"         -> ((s, d) => Relational.setExcept(s, d)),
    "topk_lineitem"      -> ((s, d) => Relational.topkLineitem(s, d)),
    "distinct_having"    -> ((s, d) => Relational.distinctHaving(s, d)),
    "scalar_funcs"       -> ((s, d) => Relational.scalarFuncs(s, d)),
    "date_funcs"         -> ((s, d) => Relational.dateFuncs(s, d)),
    "cond_agg"           -> ((s, d) => Relational.condAgg(s, d)),
    "approx_distinct"    -> ((s, d) => Relational.approxDistinct(s, d)),
    // -- text analysis (training-data pipeline surface) --
    "txt_token_count"    -> ((s, d) => TextAnalytics.tokenCount(s, d)),
    "txt_word_freq"      -> ((s, d) => TextAnalytics.wordFreq(s, d)),
    "txt_quality"        -> ((s, d) => TextAnalytics.qualityScore(s, d)),
    "txt_lang_id"        -> ((s, d) => TextAnalytics.langId(s, d)),
    "txt_fingerprint"    -> ((s, d) => TextAnalytics.fingerprint(s, d)),
    // -- dedup (training-data pipeline surface) --
    "dedup_exact"        -> ((s, d) => Dedup.exactDedup(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash_lsh"  -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash"      -> ((s, d) => Dedup.simhash(s, d)),
    // -- similarity search over embeddings --
    "ann_brute_force"    -> ((s, d) => Similarity.annBruteForce(s, d)),
    "emb_neardup"        -> ((s, d) => Similarity.embNearDup(s, d)),
    "ann_ivf"            -> ((s, d) => Similarity.annIvf(s, d)),
    // -- multimodal binary-column plumbing --
    "mm_features"        -> ((s, d) => Multimodal.mmFeatures(s, d)),
    "mm_frame_sample"    -> ((s, d) => Multimodal.mmFrameSample(s, d)),
    // -- event-time / sessionization (streaming batch twins) --
    "event_window_agg"   -> ((s, d) => graft.streaming.EventStream.eventWindowAgg(s, d)),
    "sessionize"         -> ((s, d) => graft.streaming.EventStream.sessionize(s, d)),
    // -- second coverage wave --
    "pivot_status"       -> ((s, d) => Extras.pivotStatus(s, d)),
    "stats_agg"          -> ((s, d) => Extras.statsAgg(s, d)),
    "regex_funcs"        -> ((s, d) => Extras.regexFuncs(s, d)),
    "array_funcs"        -> ((s, d) => Extras.arrayFuncs(s, d)),
    "sql_q3"             -> ((s, d) => Extras.sqlQ3(s, d)),
    "date_arith"         -> ((s, d) => Extras.dateArith(s, d)),
    "percentile_agg"     -> ((s, d) => Extras.percentileAgg(s, d)),
    "skew_salted_join"   -> ((s, d) => Skew.saltedJoinAgg(s, d)),
    "txt_tokenize_regex" -> ((s, d) => TextAnalytics.tokenizeRegex(s, d)),
    "asof_join"          -> ((s, d) => Extras.asofJoin(s, d)),
    "sample_per_source"  -> ((s, d) => Sampling.samplePerSource(s, d)),
    "rank_funcs"         -> ((s, d) => Extras.rankFuncs(s, d)),
    "correlated_max"     -> ((s, d) => Extras.correlatedMax(s, d)),
    // -- third coverage wave --
    "window_lead_nth"    -> ((s, d) => WindowFns.windowLeadNth(s, d)),
    "window_percent_rank" -> ((s, d) => WindowFns.windowPercentRank(s, d)),
    "window_range_frame" -> ((s, d) => WindowFns.windowRangeFrame(s, d)),
    "listagg_status"     -> ((s, d) => Relational2.listaggStatus(s, d)),
    "bitbool_aggs"       -> ((s, d) => Relational2.bitboolAggs(s, d)),
    "q18_having"         -> ((s, d) => Relational2.q18Having(s, d)),
    "unpivot_status"     -> ((s, d) => Relational2.unpivotStatus(s, d)),
    "json_funcs"         -> ((s, d) => Relational2.jsonFuncs(s, d)),
    "time_pair_join"     -> ((s, d) => Relational2.timePairJoin(s, d)),
    "dedup_chunk"        -> ((s, d) => Dedup.chunkDedup(s, d)),
    "dedup_groups_cc"    -> ((s, d) => Dedup.dedupGroups(s, d)),
    "txt_pos_tokens"     -> ((s, d) => TextAnalytics.posTokens(s, d)),
    "txt_pii_scrub"      -> ((s, d) => TextAnalytics.piiScrub(s, d)),
    "emb_centroids"      -> ((s, d) => Similarity.embCentroids(s, d)),
    "doc_filter_pipeline" -> ((s, d) => TextAnalytics.docFilterPipeline(s, d)),
    "corpus_stats"       -> ((s, d) => TextAnalytics.corpusStats(s, d)),
    "price_histogram"    -> ((s, d) => Relational2.priceHistogram(s, d)),
    "set_except_all"     -> ((s, d) => Relational2.setExceptAll(s, d)),
    "rollup_grouping"    -> ((s, d) => Relational2.rollupGrouping(s, d)),
    "variant_funcs"      -> ((s, d) => Relational2.variantFuncs(s, d)),
    "hll_distinct_check" -> ((s, d) => Sketches.hllDistinctCheck(s, d)),
    "approx_pctl_check"  -> ((s, d) => Sketches.approxPercentileCheck(s, d)),
    "kmeans_assign"      -> ((s, d) => Similarity.kmeansAssign(s, d)),
  )

  /** DuckDB oracle twins (same column names, same row order). */
  def oracleSql: Map[String, String] = Map(
    "agg_interaction" -> Komodo.aggInteractionSql,
    "agg_user"        -> Komodo.aggUserSql,
    "user_energy"     -> Komodo.userEnergySql,
    "drawing_pattern" -> Komodo.drawingPatternSql,
    "user_proximity"  -> Komodo.userProximitySql,
    "q1_agg"             -> Relational.q1AggSql,
    "join_revenue"       -> Relational.joinRevenueSql,
    "part_join_agg"      -> Relational.partJoinAggSql,
    "semi_join_customers" -> Relational.semiJoinCustomersSql,
    "anti_join_customers" -> Relational.antiJoinCustomersSql,
    "left_join_orders"   -> Relational.leftJoinOrdersSql,
    "full_outer_join"    -> Relational.fullOuterJoinSql,
    "rollup_pricing"     -> Relational.rollupPricingSql,
    "cube_orders"        -> Relational.cubeOrdersSql,
    "grouping_sets"      -> Relational.groupingSetsSql,
    "window_topk_orders" -> Relational.windowTopkOrdersSql,
    "window_running_sum" -> Relational.windowRunningSumSql,
    "set_union"          -> Relational.setUnionSql,
    "set_intersect"      -> Relational.setIntersectSql,
    "set_except"         -> Relational.setExceptSql,
    "topk_lineitem"      -> Relational.topkLineitemSql,
    "distinct_having"    -> Relational.distinctHavingSql,
    "scalar_funcs"       -> Relational.scalarFuncsSql,
    "date_funcs"         -> Relational.dateFuncsSql,
    "cond_agg"           -> Relational.condAggSql,
    // approx_distinct: HLL sketch is engine-specific → rows-only check
    "txt_token_count"    -> TextAnalytics.tokenCountSql,
    "txt_word_freq"      -> TextAnalytics.wordFreqSql,
    "txt_quality"        -> TextAnalytics.qualityScoreSql,
    "txt_lang_id"        -> TextAnalytics.langIdSql,
    "txt_fingerprint"    -> TextAnalytics.fingerprintSql,
    "dedup_exact"        -> Dedup.exactDedupSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    // dedup_minhash_lsh / dedup_simhash: xxhash64 signatures are
    // engine-specific → rows-only check
    "ann_brute_force"    -> Similarity.annBruteForceSql,
    "emb_neardup"        -> Similarity.embNearDupSql,
    "ann_ivf"            -> Similarity.annIvfSql,
    "mm_features"        -> Multimodal.mmFeaturesSql,
    "mm_frame_sample"    -> Multimodal.mmFrameSampleSql,
    "event_window_agg"   -> graft.streaming.EventStream.eventWindowAggSql,
    "sessionize"         -> graft.streaming.EventStream.sessionizeSql,
    "pivot_status"       -> Extras.pivotStatusSql,
    "stats_agg"          -> Extras.statsAggSql,
    "regex_funcs"        -> Extras.regexFuncsSql,
    "array_funcs"        -> Extras.arrayFuncsSql,
    "sql_q3"             -> Extras.sqlQ3Sql,
    "date_arith"         -> Extras.dateArithSql,
    "percentile_agg"     -> Extras.percentileAggSql,
    "skew_salted_join"   -> Skew.saltedJoinAggSql,
    "txt_tokenize_regex" -> TextAnalytics.tokenizeRegexSql,
    "asof_join"          -> Extras.asofJoinSql,
    "sample_per_source"  -> Sampling.samplePerSourceSql,
    "rank_funcs"         -> Extras.rankFuncsSql,
    "correlated_max"     -> Extras.correlatedMaxSql,
    "window_lead_nth"    -> WindowFns.windowLeadNthSql,
    "window_percent_rank" -> WindowFns.windowPercentRankSql,
    "window_range_frame" -> WindowFns.windowRangeFrameSql,
    "listagg_status"     -> Relational2.listaggStatusSql,
    "bitbool_aggs"       -> Relational2.bitboolAggsSql,
    "q18_having"         -> Relational2.q18HavingSql,
    "unpivot_status"     -> Relational2.unpivotStatusSql,
    "json_funcs"         -> Relational2.jsonFuncsSql,
    "time_pair_join"     -> Relational2.timePairJoinSql,
    "dedup_chunk"        -> Dedup.chunkDedupSql,
    "dedup_groups_cc"    -> Dedup.dedupGroupsSql,
    "txt_pos_tokens"     -> TextAnalytics.posTokensSql,
    "txt_pii_scrub"      -> TextAnalytics.piiScrubSql,
    "emb_centroids"      -> Similarity.embCentroidsSql,
    "doc_filter_pipeline" -> TextAnalytics.docFilterPipelineSql,
    "corpus_stats"       -> TextAnalytics.corpusStatsSql,
    "price_histogram"    -> Relational2.priceHistogramSql,
    "set_except_all"     -> Relational2.setExceptAllSql,
    "rollup_grouping"    -> Relational2.rollupGroupingSql,
    "variant_funcs"      -> Relational2.variantFuncsSql,
    "hll_distinct_check" -> Sketches.hllDistinctCheckSql,
    "approx_pctl_check"  -> Sketches.approxPercentileCheckSql,
    "kmeans_assign"      -> Similarity.kmeansAssignSql,
  )
}
