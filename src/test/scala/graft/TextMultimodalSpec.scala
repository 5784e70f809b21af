package graft

import graft.functions.TextAnalytics
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {

  test("token counts: distinct ≤ total, chars consistent with single-space join") {
    val t = TextAnalytics.tokenCount(spark, sf)
    assert(t.filter(col("n_distinct_tokens") > col("n_tokens")).count() === 0)
    assert(t.filter(col("n_tokens") < 1).count() === 0)
  }

  test("word_freq totals equal the corpus token count") {
    // corpus is tiny-vocab so top-100 covers every word
    val freqSum = TextAnalytics.wordFreq(spark, sf).agg(sum("freq")).first().getLong(0)
    val tokens  = TextAnalytics.tokenCount(spark, sf).agg(sum("n_tokens")).first().getLong(0)
    assert(freqSum === tokens)
  }

  test("quality: ratios bounded, score deterministic across runs") {
    val q1 = TextAnalytics.qualityScore(spark, sf)
    assert(q1.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    val a = q1.orderBy("doc_id").collect()
    val b = TextAnalytics.qualityScore(spark, sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("fingerprints: md5 is 32 hex chars; bag_md5 is word-order invariant") {
    import spark.implicits._
    val fp = TextAnalytics.fingerprint(spark, sf)
    assert(fp.filter(length(col("content_md5")) =!= 32).count() === 0)
    // same bag of words, different order → same bag_md5
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"))
      .toDF("doc_id", "text")
    val bags = df.select(md5(concat_ws(" ",
      array_sort(array_distinct(split(lower(col("text")), " "))))).as("bag"))
      .distinct()
    assert(bags.count() === 1)
  }

  test("multimodal decode stub preserves cardinality and is deterministic") {
    val recs = Multimodal.mediaRecords(spark, sf)
    val f1 = Multimodal.decodeStub(recs).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeStub(recs).collect().sortBy(_.doc_id)
    assert(f1.length === recs.count())
    assert(f1.map(_.frame0_crc).toSeq === f2.map(_.frame0_crc).toSeq)
    assert(f1.forall(f => f.width < 640 && f.height < 480 && f.n_frames >= 1))
  }

  test("mm_features header_hex matches the payload's leading bytes") {
    val r = Multimodal.mmFeatures(spark, sf).limit(1).collect()(0)
    val doc = Tables.documents(spark, sf).orderBy("doc_id").limit(1).collect()(0)
    val expected = doc.getString(doc.fieldIndex("text")).getBytes("UTF-8")
      .take(8).map("%02X".format(_)).mkString
    assert(r.getString(r.fieldIndex("header_hex")) === expected)
  }
}
