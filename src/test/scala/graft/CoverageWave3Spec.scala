package graft

import graft.operators.{Dedup, Relational2, WindowFns}
import graft.functions.TextAnalytics
import org.apache.spark.sql.functions._

/** Semantic checks for the third coverage wave — each asserts a property
  * the DuckDB hash-compare can't express (invariants, not golden rows). */
class CoverageWave3Spec extends SparkSpec {

  test("window_lead_nth: second_key is null exactly on 1-row prefixes") {
    val df = WindowFns.windowLeadNth(spark, sf).cache()
    import spark.implicits._
    // nth_value(2) over a growing frame is null only on each customer's
    // first-ordered row; every later row has a 2-element prefix.
    val nullsPerCust = df.filter($"second_key".isNull).groupBy($"o_custkey").count()
    assert(nullsPerCust.filter($"count" =!= 1).count() === 0)
    // first_value over the growing frame is the partition's first row on
    // every row — i.e. constant within each customer.
    val distinctFirsts = df.groupBy($"o_custkey")
      .agg(countDistinct($"first_key").as("nf")).filter($"nf" =!= 1)
    assert(distinctFirsts.count() === 0)
  }

  test("window_percent_rank: values lie in [0,1] and cume_dist is positive") {
    val df = WindowFns.windowPercentRank(spark, sf)
    assert(df.filter(col("bal_percentile") < 0 || col("bal_percentile") > 1).count() === 0)
    assert(df.filter(col("bal_cume_dist") <= 0 || col("bal_cume_dist") > 1).count() === 0)
  }

  test("window_range_frame: range sum always includes the row itself") {
    val df = WindowFns.windowRangeFrame(spark, sf)
    assert(df.filter(col("range_sum") < col("l_quantity")).count() === 0)
  }

  test("unpivot inverts pivot: per-priority long-form counts sum to order count") {
    val total = Relational2.unpivotStatus(spark, sf)
      .agg(sum("n")).first().getLong(0)
    assert(total === Tables.orders(spark, sf).count())
  }

  test("q18: every surviving order exceeds the quantity threshold") {
    val df = Relational2.q18Having(spark, sf)
    assert(df.filter(col("total_qty") <= 300.0).count() === 0)
  }

  test("json round trip recovers the struct fields") {
    val df = Relational2.jsonFuncs(spark, sf)
    assert(df.filter(col("key_back") =!= col("o_orderkey")).count() === 0)
    assert(df.filter(col("status_back").isNull).count() === 0)
  }

  test("time_pair_join: pairs are ordered, distinct-user, and positive") {
    val df = Relational2.timePairJoin(spark, sf).cache()
    assert(df.filter(col("u1") >= col("u2")).count() === 0)
    assert(df.filter(col("n_close") <= 0).count() === 0)
  }

  test("ordered-pair time_pair_join equals the literal symmetric range-join, per pair") {
    import spark.implicits._
    // the NAIVE symmetric form over the full sf0.001 events — the exact
    // semantics the DuckDB oracle states — compared row-for-row against
    // the operator's ordered-pair bucketed rewrite (not just a count)
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts_ms")
    val naive = ev.as("a").join(ev.as("b"),
        $"b.ts_ms".between($"a.ts_ms" - 120000L, $"a.ts_ms" + 120000L) &&
          $"a.user_id" < $"b.user_id")
      .groupBy($"a.user_id".as("u1"), $"b.user_id".as("u2"))
      .agg(count(lit(1)).as("n_close"))
      .selectExpr("cast(u1 as long) u1", "cast(u2 as long) u2", "n_close")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val ours = Relational2.timePairJoin(spark, sf)
      .selectExpr("cast(u1 as long) u1", "cast(u2 as long) u2", "n_close")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(ours === naive)
  }

  test("chunk dedup only reports cross-document chunks") {
    val df = Dedup.chunkDedup(spark, sf)
    assert(df.filter(col("n_docs") <= 1).count() === 0)
    assert(df.filter(col("n_occurrences") < col("n_docs")).count() === 0)
  }

  test("connected components: labels are component minima and idempotent") {
    val df = Dedup.dedupGroups(spark, sf).cache()
    // the component id is the minimum doc_id of its members
    val badMin = df.groupBy(col("component")).agg(min(col("doc_id")).as("m"))
      .filter(col("m") =!= col("component")).count()
    assert(badMin === 0)
    // every labeled doc's label is <= its own id (min-label invariant)
    assert(df.filter(col("component") > col("doc_id")).count() === 0)
  }

  test("pii scrub finds the injected identifiers and only those docs") {
    val df = TextAnalytics.piiScrub(spark, sf).cache()
    assert(df.filter(col("doc_id") % 10 === 0 &&
      (col("n_emails") < 1 || col("n_phones") < 1)).count() === 0)
    assert(df.filter(col("doc_id") % 10 =!= 0 && col("n_phones") > 0).count() === 0)
  }

  test("pos tokens: positions 0-4, at most five per document") {
    val df = TextAnalytics.posTokens(spark, sf).cache()
    assert(df.filter(col("pos") < 0 || col("pos") > 4).count() === 0)
    assert(df.groupBy(col("doc_id")).count().filter(col("count") > 5).count() === 0)
  }

  test("embedding centroids: one row per (label, dim), bounded by data range") {
    val df = graft.operators.Similarity.embCentroids(spark, sf).cache()
    val dims = df.groupBy(col("label")).count()
    assert(dims.filter(col("count") =!= 64).count() === 0)
    // a mean of standard-normal-ish components stays well inside ±1
    assert(df.filter(abs(col("centroid")) > 1.0).count() === 0)
  }

  test("doc filter pipeline: verdict honors rule order, keeps majority") {
    val df = TextAnalytics.docFilterPipeline(spark, sf).cache()
    assert(df.filter(col("verdict") === "keep" &&
      (col("n_tokens") < 20 || col("n_tokens") > 200)).count() === 0)
    assert(df.filter(col("verdict") === "keep" && col("stop_ratio") < 0.05).count() === 0)
    assert(df.filter(col("verdict") === "keep").count() > 0)
  }

  test("corpus stats: token totals and medians are consistent") {
    val df = TextAnalytics.corpusStats(spark, sf).cache()
    assert(df.filter(col("total_tokens") < col("n_docs")).count() === 0)
    assert(df.filter(col("p50_tokens") <= 0).count() === 0)
  }

  test("kmeans assignment: one row per vector, distances beat own-label centroid") {
    val assign = graft.operators.Similarity.kmeansAssign(spark, sf).cache()
    assert(assign.count() === Tables.embeddings(spark, sf).count())
    assert(assign.groupBy(col("vec_id")).count().filter(col("count") =!= 1).count() === 0)
    // assigned centroid can never be strictly worse than any other —
    // spot-check via the is_same flag being boolean-complete
    assert(assign.filter(col("is_same").isNull).count() === 0)
  }

  test("listagg produces sorted distinct status strings") {
    val rows = Relational2.listaggStatus(spark, sf).collect()
    rows.foreach { r =>
      val parts = r.getAs[String]("statuses").split(",")
      assert(parts.distinct.length === parts.length)
      assert(parts.sorted.sameElements(parts))
    }
  }
}
