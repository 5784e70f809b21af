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
    override def reduce(buf: List[(String, Long)],
                        in: (String, String, Long)): List[(String, Long)] =
      trim((in._2, in._3) :: buf)
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
}
