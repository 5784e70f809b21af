package graft

import graft.operators.{Multimodal, Relational3, TypedOps}
import graft.functions.TextAnalytics
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Semantic checks for the fourth (round-3) coverage wave — invariants the
  * DuckDB hash-compare can't express. */
class CoverageWave4Spec extends SparkSpec {

  test("ntile_cume: quartiles balanced within 1, cume_dist tops out at 1") {
    val df = Relational3.ntileCume(spark, sf).cache()
    import spark.implicits._
    val sizes = df.groupBy($"o_orderstatus", $"quartile").count()
      .groupBy($"o_orderstatus").agg((max($"count") - min($"count")).as("spread"))
    assert(sizes.filter($"spread" > 1).count() === 0)
    assert(df.filter($"quartile" < 1 || $"quartile" > 4).count() === 0)
    val maxCume = df.groupBy($"o_orderstatus").agg(max($"cum_frac").as("m"))
    assert(maxCume.filter($"m" =!= 1.0).count() === 0)
  }

  test("first_last_window: first/last non-null values are constant per user") {
    val df = Relational3.firstLastWindow(spark, sf)
    val varying = df.groupBy(col("user_id"))
      .agg(countDistinct(col("last_nv")).as("nl"))
      .filter(col("nl") > 1)
    assert(varying.count() === 0)
  }

  test("map_roundtrip is lossless: counts sum to the event count") {
    val df = Relational3.mapRoundtrip(spark, sf).cache()
    assert(df.agg(sum("n")).first().getLong(0) ===
      Tables.table(spark, sf, "events").count())
    // n_types really is the number of entries the map carried per user
    val bad = df.groupBy(col("user_id"), col("n_types")).count()
      .filter(col("n_types") =!= col("count"))
    assert(bad.count() === 0)
  }

  test("str_funcs2: lpad yields fixed width, levenshtein bounded by longer input") {
    val df = Relational3.strFuncs2(spark, sf).cache()
    assert(df.filter(length(col("padded")) =!= 12).count() === 0)
    val c = Tables.customer(spark, sf)
      .select(col("c_custkey"), greatest(length(col("c_name")), length(col("c_mktsegment"))).as("maxlen"))
    assert(df.join(c, "c_custkey").filter(col("lev") > col("maxlen")).count() === 0)
  }

  test("median_iqr: quartiles are ordered and IQR is their difference") {
    val df = Relational3.medianIqr(spark, sf).cache()
    assert(df.filter(col("q1") > col("med") || col("med") > col("q3")).count() === 0)
    assert(df.filter(abs(col("iqr") - (col("q3") - col("q1"))) > 1e-9).count() === 0)
  }

  test("sample_systematic: ceil(stratum/50) rows per stratum, indices dense from 0") {
    val df = Relational3.sampleSystematic(spark, sf).cache()
    val expected = Tables.orders(spark, sf).groupBy(col("o_orderstatus")).count()
      .select(col("o_orderstatus"), ((col("count") + 49L) / 50L).cast("long").as("want"))
    val got = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("got"), min("sample_idx").as("lo"), max("sample_idx").as("hi"))
    val joined = got.join(expected, "o_orderstatus")
    assert(joined.filter(col("got") =!= col("want")).count() === 0)
    assert(joined.filter(col("lo") =!= 0 || col("hi") =!= col("got") - 1).count() === 0)
  }

  test("sql_q5: revenue positive and nations confined to the ASIA region") {
    val df = Relational3.sqlQ5(spark, sf).cache()
    assert(df.filter(col("revenue") <= 0).count() === 0)
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"))
    assert(df.join(asiaNations, Seq("n_name"), "left_anti").count() === 0)
  }

  test("explode_outer preserves every document") {
    val df = Relational3.explodeOuterTokens(spark, sf)
    assert(df.select(countDistinct(col("doc_id"))).first().getLong(0) ===
      Tables.documents(spark, sf).count())
    // matched tokens really contain the probe letter
    assert(df.filter(col("tok").isNotNull && !col("tok").contains("q")).count() === 0)
  }

  test("typed_cust_stats agrees with the declarative aggregation") {
    val typed = TypedOps.typedCustOrderStats(spark, sf)
    val declarative = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders_d"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_d"))
    val joined = typed.join(declarative, "o_custkey")
    assert(joined.filter(col("n_orders") =!= col("n_orders_d") ||
      col("total_cents") =!= col("cents_d")).count() === 0)
  }

  test("doc_chunks: stride covers every document to its last character") {
    val df = TextAnalytics.docChunks(spark, sf).cache()
    val cover = df.groupBy(col("doc_id"))
      .agg(max(col("chunk_start") + col("chunk_len")).as("covered"))
    val docs = Tables.documents(spark, sf).select(col("doc_id"), length(col("text")).as("len"))
    assert(cover.join(docs, "doc_id").filter(col("covered") =!= col("len")).count() === 0)
    // overlap: consecutive chunks start exactly one stride apart
    assert(df.filter(col("chunk_start") % TextAnalytics.ChunkStride =!= 0).count() === 0)
  }

  test("txt_repetition: ratios in range and consistent with pigeonhole bound") {
    val df = TextAnalytics.repetitionScore(spark, sf)
    assert(df.filter(col("dup_ratio") < 0 || col("dup_ratio") >= 1).count() === 0)
    // max token count >= ceil(n/d)  ⇒  top_tok_frac * n >= n/d
    assert(df.filter(round(col("top_tok_frac") * col("n_tokens")) * col("n_distinct") <
      col("n_tokens")).count() === 0)
  }

  test("txt_bigrams: corpus-wide bigram total is sum(n_tokens - 1)") {
    val docs = Tables.documents(spark, sf)
    val expected = docs.select(sum(size(split(col("text"), " ")) - 1).as("t"))
      .first().getLong(0)
    // recompute without the top-k cut to compare totals
    val all = TextAnalytics.bigramFreq(spark, sf, topK = Int.MaxValue)
    assert(all.agg(sum("n")).first().getLong(0) === expected)
  }

  test("mm_audio_chunks: chunks tile each payload exactly") {
    val df = Multimodal.mmAudioChunks(spark, sf).cache()
    val tiled = df.groupBy(col("doc_id"))
      .agg(sum(col("chunk_len")).as("bytes"), count(lit(1)).as("n_chunks"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), octet_length(col("text").cast("binary")).as("blen"))
    val j = tiled.join(docs, "doc_id")
    assert(j.filter(col("bytes") =!= col("blen")).count() === 0)
    assert(j.filter(col("n_chunks") =!=
      ((col("blen") + Multimodal.AudioChunkBytes - 1) / Multimodal.AudioChunkBytes).cast("long"))
      .count() === 0)
  }

  test("window_sliding: every event lands in exactly two hopping windows") {
    val df = EventStream.slidingWindowAgg(spark, sf)
    assert(df.agg(sum("n_events")).first().getLong(0) ===
      2L * Tables.table(spark, sf, "events").count())
  }

  test("union_by_name: schema evolution null-fills only the legacy half") {
    val df = Relational3.unionByNameEvolved(spark, sf).cache()
    assert(df.count() === Tables.documents(spark, sf).count())
    assert(df.filter(col("doc_id") % 2 === 0 && col("source").isNotNull).count() === 0)
    assert(df.filter(col("doc_id") % 2 === 1 && col("source").isNull).count() === 0)
  }

  test("try_funcs: null exactly where the unsafe form would error") {
    val df = Relational3.tryFuncs(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    assert(df.filter(col("safe_div").isNull).count() ===
      ev.filter(col("k") % 5 === 0 || col("k").isNull).count())
    assert(df.filter(col("maybe_int").isNull).count() ===
      ev.filter(col("k") % 2 =!= 0 || col("k").isNull).count())
  }

  test("maxby_minby: selected users really own the group extremes") {
    val df = Relational3.maxbyMinby(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    // the reported extremes are the true group extremes
    val trueExt = ev.groupBy(col("event_type"))
      .agg(max(col("value")).as("true_max"), min(col("value")).as("true_min"))
    assert(df.join(trueExt, "event_type")
      .filter(col("max_value") =!= col("true_max") ||
        col("min_value") =!= col("true_min")).count() === 0)
    // top_user/bottom_user actually own an event carrying that extreme value
    val ownsMax = df.join(ev,
      df("event_type") === ev("event_type") && df("top_user") === ev("user_id") &&
        df("max_value") === ev("value"), "left_semi")
    assert(ownsMax.count() === df.count())
    val ownsMin = df.join(ev,
      df("event_type") === ev("event_type") && df("bottom_user") === ev("user_id") &&
        df("min_value") === ev("value"), "left_semi")
    assert(ownsMin.count() === df.count())
  }

  test("window_rows_frame: mov_n capped at 4 and mov_avg = mov_sum/mov_n") {
    val df = Relational3.windowRowsFrame(spark, sf).cache()
    assert(df.filter(col("mov_n") < 1 || col("mov_n") > 4).count() === 0)
    assert(df.filter(abs(col("mov_avg") * col("mov_n") - col("mov_sum")) > 1e-6).count() === 0)
  }

  test("gap_fill: grid is dense per user, zero-filled hours carry a forward value") {
    val df = EventStream.gapFill(spark, sf).cache()
    // dense grid: per user, rows = h1 - h0 + 1 and hours are consecutive
    val grid = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("rows"), (max(col("hour")) - min(col("hour")) + 1).as("span"))
    assert(grid.filter(col("rows") =!= col("span")).count() === 0)
    // events are conserved
    assert(df.agg(sum("n_events")).first().getLong(0) ===
      Tables.table(spark, sf, "events").count())
    // forward fill: the first grid hour of each user has events by
    // construction, so filled_val is never null
    assert(df.filter(col("filled_val").isNull).count() === 0)
  }

  test("sql_q7: directions are symmetric pairs over the two chosen nations") {
    val df = Relational3.sqlQ7(spark, sf).cache()
    import spark.implicits._
    val pairs = df.select($"supp_nation", $"cust_nation").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
    assert(df.filter($"revenue" <= 0 || $"n_items" < 1).count() === 0)
  }

  test("pivot_multi_agg: cells reassemble to the order count and no double-counting") {
    val df = Relational3.pivotMultiAgg(spark, sf)
    val total = df.select(
      (coalesce(col("F_n"), lit(0L)) + coalesce(col("O_n"), lit(0L)) +
        coalesce(col("P_n"), lit(0L))).as("rowsum"))
      .agg(sum("rowsum")).first().getLong(0)
    assert(total === Tables.orders(spark, sf).count())
  }

  test("dedup_incremental: kept docs are new-batch keepers absent from the corpus") {
    val df = graft.operators.Dedup.incrementalDedup(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    val newSrc = graft.operators.Dedup.IncrementalNewSource
    // every kept doc really is in the new batch
    assert(df.join(docs.filter(col("source") === newSrc), Seq("doc_id"), "left_anti")
      .count() === 0)
    // no kept doc's content exists in the prior corpus
    val keptHashes = df.join(docs, "doc_id").select(md5(col("text")).as("h"))
    val corpusHashes = docs.filter(col("source") =!= newSrc).select(md5(col("text")).as("h"))
    assert(keptHashes.join(corpusHashes, Seq("h"), "left_semi").count() === 0)
  }

  test("txt_contamination: overlaps are valid fractions across the source split") {
    val df = graft.operators.Dedup.contamination(spark, sf).cache()
    assert(df.filter(col("overlap_frac") <= 0 || col("overlap_frac") > 1).count() === 0)
    assert(df.filter(col("n_shared") > col("n_shingles")).count() === 0)
    val docs = Tables.documents(spark, sf)
    val evalSrc = graft.operators.Dedup.ContaminationEvalSource
    assert(df.join(docs.filter(col("source") =!= evalSrc)
      .select(col("doc_id").as("eval_doc")), Seq("eval_doc"), "left_semi").count() === 0)
  }

  test("approx_topk_check: sketch counts are exact at fixture cardinality") {
    val df = graft.operators.Sketches.approxTopkCheck(spark, sf)
    assert(df.filter(!col("sketch_exact")).count() === 0)
    assert(df.count() === 10)
  }

  test("streaming slidingCounts matches the batch twin on the same frame") {
    val batch = EventStream.slidingWindowAgg(spark, sf)
    val viaStreamShape = EventStream.slidingCounts(
      EventStream.withEventTime(Tables.events(spark, sf)))
      .select(unix_millis(col("window.start")).as("start_ms"), col("event_type"),
        col("n_events"), col("sum_value"))
    assert(viaStreamShape.exceptAll(batch).count() === 0 &&
      batch.exceptAll(viaStreamShape).count() === 0)
  }
}
