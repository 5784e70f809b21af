package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** Greedy longest-prefix subword counting ([[Bpe]]): golden hand-walked
  * counts, the ≥-whitespace invariant, and the structural contracts the
  * pack/budget twins rely on.
  */
class BpeSpec extends SparkSpec {

  private def countOf(texts: (Long, String)*): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.countCol.as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("golden greedy walks: hand-computed piece counts") {
    val got = countOf(
      // te|st|ing — 'test' not in V4, 'te' consumes 2, 'st' 2, then 'ing'
      1L -> "testing",
      // the (V3, one piece)
      2L -> "the",
      // x|y|z — no units: one piece per char
      3L -> "xyz",
      // tion (V4, one piece)
      4L -> "tion",
      // a|b word boundaries: two words, one piece each
      6L -> "a b",
      // empty text: split gives [""], zero pieces
      7L -> "",
      // ment|or: V4 then V2
      8L -> "mentor")
    assert(got(1L) == 3L)
    assert(got(2L) == 1L)
    assert(got(3L) == 3L)
    assert(got(4L) == 1L)
    assert(got(6L) == 2L)
    assert(got(7L) == 0L)
    assert(got(8L) == 2L)
  }

  test("subword count is >= whitespace count on the whole fixture corpus") {
    val df = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("ws"),
        Bpe.countCol.as("bpe"),
        length(col("text")).cast("long").as("chars"))
    val bad = df.filter(col("bpe") < col("ws")).count()
    assert(bad == 0, "every nonempty word is at least one piece")
    // and <= char count (a piece consumes at least one char)
    assert(df.filter(col("bpe") > col("chars")).count() == 0)
  }

  test("Spark fold and DuckDB-shaped recursion agree: the ladder is shared by construction") {
    // the two formulations are generated from the same stepCase ladder;
    // this pins the Spark side against an independent Scala reimplementation
    def scalaCount(text: String): Long =
      text.split(" ", -1).filter(_.nonEmpty).map { w =>
        var pos = 0; var n = 0L
        while (pos < w.length) {
          val rem = w.length - pos
          if (rem >= 4 && Bpe.V4.contains(w.substring(pos, pos + 4))) pos += 4
          else if (rem >= 3 && Bpe.V3.contains(w.substring(pos, pos + 3))) pos += 3
          else if (rem >= 2 && Bpe.V2.contains(w.substring(pos, pos + 2))) pos += 2
          else pos += 1
          n += 1
        }
        n
      }.sum
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .limit(200).collect().map(r => (r.getLong(0), r.getString(1)))
    val spark_ = countOf(docs.toSeq: _*)
    docs.foreach { case (id, text) =>
      assert(spark_(id) == scalaCount(text), s"doc $id diverged")
    }
  }

  test("bpe_count under a caller-supplied vocabulary (the 50k-vocab upgrade path)") {
    import spark.implicits._
    import org.apache.spark.sql.graft.{BpeFunctions, BpeVocab}
    val v = new BpeVocab(Seq("abcd"), Seq("qrs"), Seq("xy"))
    def countWith(s: String): Long =
      Seq(Tuple1(s)).toDF("text")
        .select(BpeFunctions.bpe_count(col("text"), v).as("n")).first().getLong(0)
    assert(countWith("abcdxyz") == 3L)      // abcd|xy|z
    assert(countWith("qrsqrs abcd") == 3L)  // qrs|qrs + abcd
    assert(countWith("zz") == 2L)           // no unit matches -> z|z
    // vocab validation is loud
    intercept[IllegalArgumentException](new BpeVocab(Seq("abc"), Nil, Nil))
  }

  test("bpe_count is callable from SQL text (extensions surface)") {
    import spark.implicits._
    org.apache.spark.sql.graft.BpeFunctions.registerSql(spark)
    Seq((1L, "the nation ingests")).toDF("doc_id", "text")
      .createOrReplaceTempView("bpe_sql_probe")
    val viaSql = spark.sql(
      "SELECT bpe_count(text) AS n FROM bpe_sql_probe").first().getLong(0)
    val viaCol = Seq((1L, "the nation ingests")).toDF("doc_id", "text")
      .select(Bpe.countCol.as("n")).first().getLong(0)
    assert(viaSql == viaCol && viaSql > 3,
      s"SQL ($viaSql) and Column ($viaCol) surfaces must agree (> whitespace count 3)")
  }
}
