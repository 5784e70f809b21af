package graft

import graft.functions.TextAnalytics
import org.apache.spark.sql.functions._

/** Hashing-trick linear classifier ([[TextAnalytics.hashClassifier]]):
  * an independent JVM reimplementation of the whole scoring path
  * (tokenize → unigram+bigram features → md5 bucket → md5 weight →
  * integer sum) pins the Spark pipeline value-exactly, plus structural
  * contracts on the fixture corpus.
  */
class HashClassifierSpec extends SparkSpec {

  import spark.implicits._

  /** 60-bit md5 prefix as a positive long — EngineHash.md5Bits60's
    * contract, recomputed independently via MessageDigest. */
  private def md5bits60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private val D = 1 << 18

  private def refScore(text: String): Option[(Long, Long)] = {
    val tk = text.split(" ", -1).filter(_.nonEmpty)
    val feats = tk.toSeq ++ tk.toSeq.sliding(2).filter(_.length == 2)
      .map(p => p(0) + "_" + p(1))
    if (feats.isEmpty) None
    else Some((feats.length.toLong, feats.map { f =>
      md5bits60("w_" + (md5bits60(f) % D)) % 2001 - 1000
    }.sum))
  }

  test("planted documents match an independent JVM reimplementation exactly") {
    val docs = Seq(
      1L -> "the quick brown fox",
      2L -> "one",                      // single token: no bigrams
      3L -> "",                         // zero tokens: absent from output
      4L -> "a  b",                     // double space: empty token dropped
      5L -> "répét itions répét itions" // non-ASCII + repeated features
    ).toDF("doc_id", "text")
    val got = TextAnalytics.hashClassifierFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    assert(!got.contains(3L), "zero-token doc must be absent")
    Seq(1L -> "the quick brown fox", 2L -> "one", 4L -> "a  b",
      5L -> "répét itions répét itions").foreach { case (id, text) =>
      val Some((n, s)) = refScore(text)
      val (gn, gs, gm, gl) = got(id)
      assert(gn == n, s"doc $id n_feats: got $gn want $n")
      assert(gs == s, s"doc $id score_raw: got $gs want $s")
      assert(gm == s.toDouble / n)
      assert(gl == (s >= 0))
    }
    // bigrams are position-sensitive: "a b" and "b a" score differently
    // unless their hashed weights happen to collide — check the FEATURE
    // SETS differ by construction
    val ab = refScore("a b").get._2
    val ba = refScore("b a").get._2
    assert(md5bits60("a_b") != md5bits60("b_a"),
      "distinct bigrams must hash apart")
    // (scores MAY collide by weight coincidence; the hash inequality is
    // the structural claim)
    assert(ab == refScore("a b").get._2, "deterministic") // self-consistency
    assert(ba == refScore("b a").get._2)
  }

  test("broadcast model-table form equals the inline formula exactly, and the join broadcasts") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val viaModel = TextAnalytics.hashClassifierWithModel(docs,
      TextAnalytics.syntheticModel(spark))
    val inline = TextAnalytics.hashClassifierFrom(docs)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(rows(viaModel) == rows(inline),
      "model-table scoring must equal the inline synthetic formula")
    val plan = viaModel.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the model join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "model join must never SMJ")
    // a SPARSE model (near-zero weights dropped) scores absent buckets 0
    val sparse = TextAnalytics.syntheticModel(spark)
      .filter(abs(col("weight")) > 900)
    val sparseRows = TextAnalytics.hashClassifierWithModel(docs, sparse)
    assert(sparseRows.count() == inline.count(),
      "sparse model must still score every doc with >= 1 token")
  }

  // --- hashClassifierFit (r13 verdict ask #4: the training path) -----------

  /** Planted separable corpus: positive docs draw from vocab P, negative
    * from vocab N, both mixed with shared stopwords so the fit must
    * learn to IGNORE common features, not just memorize disjoint sets. */
  private def plantedCorpus(n: Int, seed: Int)
      : (Seq[(Long, String)], Seq[(Long, Int)]) = {
    val P = Vector("sunlit", "goldrise", "freshet", "clarity", "warmhold", "brightly")
    val N = Vector("mudrot", "gloompit", "ruststain", "coldsnap", "stalecrust", "drearily")
    val shared = Vector("the", "a", "of", "and", "it", "was")
    val rnd = new scala.util.Random(seed)
    val docs = (0 until n).map { i =>
      val pos = i % 2 == 0
      val vocab = if (pos) P else N
      val words = (0 until 12).map { _ =>
        if (rnd.nextDouble() < 0.5) shared(rnd.nextInt(shared.length))
        else vocab(rnd.nextInt(vocab.length))
      }
      (i.toLong, words.mkString(" "))
    }
    (docs, docs.map { case (id, _) => (id, (1 - id % 2).toInt) })
  }

  test("fit reaches full separation on a planted corpus and the model generalizes") {
    val (train, labels) = plantedCorpus(40, seed = 7)
    val model = TextAnalytics.hashClassifierFit(
      train.toDF("doc_id", "text"), labels.toDF("doc_id", "y"))
    // the trained model is exactly what the production scorer consumes
    val scored = TextAnalytics.hashClassifierWithModel(
        train.toDF("doc_id", "text"), model)
      .select(col("doc_id"), col("score_raw")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wrong = labels.filter { case (id, y) =>
      if (y == 1) scored(id) <= 0 else scored(id) >= 0
    }
    assert(wrong.isEmpty,
      s"train docs misclassified after fit: ${wrong.take(5)}")
    // held-out docs from the SAME vocab (different seed → different
    // mixtures) must classify by the learned vocab weights alone
    val (held, heldLabels) = plantedCorpus(20, seed = 99)
    val heldScored = TextAnalytics.hashClassifierWithModel(
        held.toDF("doc_id", "text"), model)
      .select(col("doc_id"), col("score_raw")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val heldWrong = heldLabels.filter { case (id, y) =>
      if (y == 1) heldScored(id) <= 0 else heldScored(id) >= 0
    }
    assert(heldWrong.isEmpty,
      s"held-out docs misclassified: ${heldWrong.take(5)}")
  }

  test("fit is bit-deterministic run-to-run and across input partitionings") {
    val (train, labels) = plantedCorpus(30, seed = 11)
    def fit(parts: Int): Set[(Long, Long)] =
      TextAnalytics.hashClassifierFit(
          train.toDF("doc_id", "text").repartition(parts),
          labels.toDF("doc_id", "y"), rounds = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = fit(1)
    val b = fit(7)
    val c = fit(7)
    assert(b == c, "same-partitioning refit must be identical")
    assert(a == b,
      "fit must be partitioning-independent (DECIMAL-quantized score and " +
        "gradient sums — the kmeansFit rule)")
  }

  test("fit-then-score composition: trained model broadcasts and scores the fixture corpus") {
    val (train, labels) = plantedCorpus(40, seed = 7)
    val model = TextAnalytics.hashClassifierFit(
      train.toDF("doc_id", "text"), labels.toDF("doc_id", "y"), rounds = 4)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val scored = TextAnalytics.hashClassifierWithModel(docs, model)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"trained-model scoring must broadcast the weight table:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
    // every >=1-token doc scores (absent buckets coalesce to 0), exactly
    // like the synthetic-model path
    assert(scored.count() ==
      TextAnalytics.hashClassifier(spark, sf).count())
  }

  test("DSIR: importance weights rank target-like documents above raw-like ones; model broadcasts") {
    // planted corpus: the target (en) vocabulary is 'alpha/beta', the raw
    // side is 'gamma/delta'; a doc's rank must follow which model it fits
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha", "en"),
      (2L, "beta alpha beta alpha beta", "en"),
      (3L, "gamma delta gamma delta gamma", "de"),
      (4L, "delta gamma delta gamma delta", "fr"),
      (5L, "alpha beta alpha gamma beta", "de"),  // raw-labeled but target-like text
      (6L, "gamma delta gamma alpha delta", "en") // target-labeled but raw-like text
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalytics.dsirTopKFrom(docs, k = 6)
      .select("doc_id", "log_weight")
      .as[(Long, Double)].collect().toSeq
    val rank = out.map(_._1)
    val weight = out.toMap
    // pure-target text scores highest, pure-raw lowest, REGARDLESS of the
    // doc's own label: DSIR scores text against the distributions
    assert(Set(rank(0), rank(1)) === Set(1L, 2L),
      s"pure target-vocabulary docs must lead: $out")
    assert(Set(rank(4), rank(5)) === Set(3L, 4L),
      s"pure raw-vocabulary docs must trail: $out")
    assert(weight(5L) > weight(6L),
      "the mostly-target text outranks the mostly-raw text even though labels disagree")
    assert(weight(1L) > 0 && weight(3L) < 0,
      "signs follow the importance ratio")
    // the scoring join is a broadcast of the HashDim-bounded model
    val plan = TextAnalytics.dsirTopKFrom(docs, k = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the model join must broadcast — the corpus never shuffles for scoring")
  }

  test("fixture corpus: n_feats = 2*n_tokens - 1 and the plan is one explode + one doc-keyed aggregation") {
    val cls = TextAnalytics.hashClassifier(spark, sf)
    val tokens = TextAnalytics.tokenCount(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
    // fixture text is single-space separated with no leading/trailing
    // spaces, so features = unigrams (n) + bigrams (n-1)
    val bad = cls.join(tokens, "doc_id")
      .filter(col("n_feats") =!= col("n_tokens") * 2 - 1).count()
    assert(bad == 0, "n_feats must be 2n-1 on the fixture")
    // docs with >= 1 token all appear
    assert(cls.count() == tokens.filter(col("n_tokens") >= 1).count())
    // plan: no joins, no window — a scan-side explode into a hash
    // aggregate pair (the fastText inference shape)
    val plan = cls.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"classifier must not join:\n$plan")
    assert(plan.contains("Generate"), "explode must survive planning")
  }
}
