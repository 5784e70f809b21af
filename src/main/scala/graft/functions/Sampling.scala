package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic per-group sampling via a custom mergeable Aggregator —
  * the §2.10 UDAF surface the reference never needed, applied to the
  * training-data problem of drawing a reproducible K-document sample per
  * group without a per-group sort shuffle.
  *
  * Bottom-K priority sampling: each row's priority is a content hash; the
  * aggregator keeps the K smallest (hash, id) pairs per group. The buffer
  * is tiny (K entries), merge is associative+commutative, so the plan is
  * a standard partial/final aggregation — one pass, no window, no global
  * sort, identical output on any partitioning. The md5 priority makes the
  * sample reproducible across engines (oracle twin = ranking window).
  */
object Sampling {

  /** Keep the K smallest (priority, id) pairs. */
  class BottomK(k: Int) extends Aggregator[(String, String, Long),
      List[(String, Long)], Seq[Long]] {
    override def zero: List[(String, Long)] = Nil
    private def trim(l: List[(String, Long)]): List[(String, Long)] =
      l.sortBy(identity).take(k)
    // The buffer is kept sorted (trim), so buf.last is the current max —
    // a candidate that can't make the bottom-k is rejected in O(1),
    // keeping per-partition cost O(n + accepted·k·log k) instead of
    // re-sorting on every input row.
    override def reduce(buf: List[(String, Long)],
                        in: (String, String, Long)): List[(String, Long)] = {
      val cand = (in._2, in._3)
      if (buf.lengthCompare(k) < 0 || Ordering[(String, Long)].lt(cand, buf.last))
        trim(cand :: buf)
      else buf
    }
    override def merge(a: List[(String, Long)],
                       b: List[(String, Long)]): List[(String, Long)] =
      trim(a ++ b)
    override def finish(buf: List[(String, Long)]): Seq[Long] =
      buf.sortBy(identity).map(_._2)
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Long)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** 3 reproducible sample documents per source. */
  def samplePerSource(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val ds = Tables.documents(spark, dir)
      .select(col("source"), md5(col("text")).as("priority"), col("doc_id"))
      .as[(String, String, Long)]
    ds.groupByKey(_._1)
      .agg(new BottomK(k).toColumn.name("sample_ids"))
      .toDF("source", "sample_ids")
      .select(col("source"), posexplode(col("sample_ids")).as(Seq("pos", "doc_id")))
      .select(col("source"), (col("pos") + 1).cast("int").as("sample_rank"), col("doc_id"))
      .orderBy(col("source"), col("sample_rank"))
  }

  val samplePerSourceSql: String =
    """SELECT source, sample_rank, doc_id FROM (
      |  SELECT source, doc_id,
      |         CAST(row_number() OVER (PARTITION BY source
      |                                 ORDER BY md5(text), doc_id) AS INT) AS sample_rank
      |  FROM documents
      |) WHERE sample_rank <= 3
      |ORDER BY source, sample_rank""".stripMargin

  // --- weighted sampling without replacement (Efraimidis–Spirakis) ----------
  /** Keep the K smallest (priority, id, payload) triples — BottomK for
    * long-scaled priorities carrying one payload column. The buffer is
    * ordered by the FULL triple, so the O(1) rejection below and the
    * sort agree on every key: a candidate that ties buf.last on
    * (priority, id) is rejected only if it also loses on payload.
    * (In practice t._2 is the unique doc_id, so (t._1, t._2) ties are
    * impossible — the full-triple order just makes that a non-issue.) */
  class BottomKWeighted(k: Int) extends Aggregator[(String, Long, Long, Long),
      List[(Long, Long, Long)], Seq[(Long, Long)]] {
    override def zero: List[(Long, Long, Long)] = Nil
    private def trim(l: List[(Long, Long, Long)]): List[(Long, Long, Long)] =
      l.sorted.take(k)
    // Sorted-buffer invariant (see BottomK): O(1) rejection of rows that
    // can't beat the current k-th smallest triple.
    override def reduce(buf: List[(Long, Long, Long)],
                        in: (String, Long, Long, Long)): List[(Long, Long, Long)] = {
      val cand = (in._2, in._3, in._4)
      if (buf.lengthCompare(k) < 0 ||
          Ordering[(Long, Long, Long)].lt(cand, buf.last))
        trim(cand :: buf)
      else buf
    }
    override def merge(a: List[(Long, Long, Long)],
                       b: List[(Long, Long, Long)]): List[(Long, Long, Long)] =
      trim(a ++ b)
    override def finish(buf: List[(Long, Long, Long)]): Seq[(Long, Long)] =
      buf.sorted.map(t => (t._2, t._3))
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long, Long)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Token-weighted document sample per source: each document draws an
    * exponential jitter e = -ln(u)/w with rate w = its token count (u
    * hash-derived, so the draw is a pure function of the id — the
    * split/mix reproducibility contract), and the k smallest e per
    * source are the sample. This IS weighted sampling without
    * replacement (A-ES): long documents are proportionally likelier,
    * no global pass, no RNG state. The "sample by token budget" primitive
    * of corpus curation.
    *
    * Engine parity: u is a single division of exact integers, and the
    * one transcendental ln quantizes to DECIMAL(18,12) before the
    * ranking (tfidf contract; scale-12 backing stays under 2^53, the
    * double-rounding bound), with doc_id as the total-order tie-break.
    * The quantized jitter then travels as its scaled-long unscaled value
    * through [[BottomKWeighted]] — the same mergeable partial/final
    * aggregation as [[samplePerSource]], so no per-source sort shuffle
    * ever touches the corpus (the file-header plan shape); the DuckDB
    * twin legitimately stays a ranking window. */
  def sampleWeighted(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val h = graft.functions.EngineHash.md5Bits60(
      concat(lit("wrs:"), col("doc_id").cast("string")))
    val ds = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"), h.as("h"))
      .withColumn("u",
        (col("h").cast("double") + lit(0.5)) / lit(1152921504606846976.0))
      // the DECIMAL(18,12)-quantized jitter times 10^12 is exactly its
      // backing integer — long comparisons ARE the decimal ordering
      .select(col("source"),
        expr("cast(cast(-ln(u) / cast(n_tokens as double) as decimal(18,12))" +
          " * 1000000000000 as bigint)").as("e"),
        col("doc_id"), col("n_tokens"))
      .as[(String, Long, Long, Long)]
    ds.groupByKey(_._1)
      .agg(new BottomKWeighted(k).toColumn.name("sample"))
      .toDF("source", "sample")
      .select(col("source"), posexplode(col("sample")).as(Seq("pos", "s")))
      .select(col("source"), (col("pos") + 1).cast("int").as("sample_rank"),
        col("s._1").as("doc_id"), col("s._2").as("n_tokens"))
      .orderBy(col("source"), col("sample_rank"))
  }

  val sampleWeightedSql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(concat('0x', substr(md5('wrs:' || CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS h
      |  FROM documents
      |), keyed AS (
      |  SELECT source, doc_id, n_tokens,
      |         CAST(-ln((CAST(h AS DOUBLE) + 0.5) / 1152921504606846976.0)
      |              / CAST(n_tokens AS DOUBLE) AS DECIMAL(18,12)) AS e
      |  FROM d
      |)
      |SELECT source, sample_rank, doc_id, n_tokens FROM (
      |  SELECT source, doc_id, n_tokens,
      |         CAST(row_number() OVER (PARTITION BY source
      |                                 ORDER BY e, doc_id) AS INT) AS sample_rank
      |  FROM keyed
      |) WHERE sample_rank <= 5
      |ORDER BY source, sample_rank""".stripMargin
}
