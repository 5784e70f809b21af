package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** A greedy longest-prefix subword vocabulary, packed for the counting
  * kernel: unit lengths 4 > 3 > 2 (single codepoints are the implicit
  * fallback), each length class a sorted array of packed ASCII longs
  * probed by binary search — no per-check substring allocation.
  *
  * SERIALIZABLE and carried BY the expression (codegen binds it as a
  * reference object), so a caller can count under any published merge
  * vocab — the 50k-entry upgrade path the fixed in-repo vocab documents.
  * [[graft.functions.Bpe]]'s lists remain the default instance used by
  * the `*_bpe` oracle queries.
  *
  * Semantics contract (pinned by BpeSpec's golden word pairs and the
  * three `*_bpe` oracle queries): identical to the CASE-ladder fold —
  * words are maximal runs between single spaces, positions advance by
  * CODEPOINTS (the SQL `substring` unit; vocab entries are ASCII, so a
  * window containing any non-ASCII codepoint simply never matches), the
  * greedy order is 4 > 3 > 2 > 1, and empty words count zero.
  */
final class BpeVocab(v4: Seq[String], v3: Seq[String], v2: Seq[String])
    extends Serializable {
  require(v4.forall(_.length == 4) && v3.forall(_.length == 3) &&
    v2.forall(_.length == 2),
    "BpeVocab unit lists must be length-homogeneous (4/3/2)")
  require((v4 ++ v3 ++ v2).forall(_.forall(_ < 128)),
    "BpeVocab units must be ASCII — the packed-long probe depends on it")

  private def packs(units: Seq[String]): Array[Long] =
    units.map(_.foldLeft(0L)((a, c) => (a << 8) | (c.toLong & 0xFF))).sorted.toArray

  private val p4 = packs(v4)
  private val p3 = packs(v3)
  private val p2 = packs(v2)

  /** Pack `k` codepoints from `pos` into a long, or -1 if any is
    * non-ASCII (which no vocab entry can match). */
  private def packAt(cp: Array[Int], pos: Int, k: Int): Long = {
    var a = 0L
    var i = 0
    while (i < k) {
      val c = cp(pos + i)
      if (c >= 128) return -1L
      a = (a << 8) | c
      i += 1
    }
    a
  }

  private def hit(set: Array[Long], key: Long): Boolean =
    key >= 0 && java.util.Arrays.binarySearch(set, key) >= 0

  private def countWord(w: String): Long = {
    val cp = w.codePoints().toArray
    val len = cp.length
    var pos = 0
    var cnt = 0L
    while (pos < len) {
      var step = 1
      if (pos + 4 <= len && hit(p4, packAt(cp, pos, 4))) step = 4
      else if (pos + 3 <= len && hit(p3, packAt(cp, pos, 3))) step = 3
      else if (pos + 2 <= len && hit(p2, packAt(cp, pos, 2))) step = 2
      pos += step
      cnt += 1
    }
    cnt
  }

  def count(text: String): Long = {
    var total = 0L
    val n = text.length
    var wStart = 0
    var idx = 0
    while (idx <= n) {
      if (idx == n || text.charAt(idx) == ' ') {
        if (idx > wStart) total += countWord(text.substring(wStart, idx))
        wStart = idx + 1
      }
      idx += 1
    }
    total
  }
}

/** Default-vocab kernel — [[graft.functions.Bpe]]'s lists, the single
  * vocab source the `*_bpe` oracles pin. */
object BpeKernel {
  val default: BpeVocab = new BpeVocab(
    graft.functions.Bpe.V4, graft.functions.Bpe.V3, graft.functions.Bpe.V2)

  def count(text: String): Long = default.count(text)
}

/** Native subword-count expression: `bpe_count(text)` → BIGINT under
  * the expression's [[BpeVocab]] (default: the in-repo lists). Replaces
  * the doubly-nested `aggregate()` higher-order fold, which evaluated
  * INTERPRETED per character position — codegen emits one kernel call
  * per row (the FloatVecDot lesson applied to text).
  * [[graft.functions.Bpe.countCol]] is the Column API. */
case class BpeCount(child: Expression,
                    vocab: BpeVocab = BpeKernel.default)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(s: Any): Any =
    vocab.count(s.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab,
      classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.count($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Column API for [[BpeCount]] (ExpressionUtils is private[sql], so
    * the bridge lives here like [[VectorFunctions]]'). */
  def bpe_count(c: Column): Column =
    ExpressionUtils.column(BpeCount(ExpressionUtils.expression(c)))

  /** [[bpe_count]] under a caller-supplied vocabulary. */
  def bpe_count(c: Column, vocab: BpeVocab): Column =
    ExpressionUtils.column(BpeCount(ExpressionUtils.expression(c), vocab))

  /** Registry entry for [[graft.GraftExtensions]] — `bpe_count` from SQL
    * text resolves to the native expression (same surface as vec_dot;
    * SQL callers get the default vocab). */
  val bpeCountDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[BpeCount].getName, "bpe_count"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"bpe_count expects exactly 1 argument, got ${children.length}")
        BpeCount(children.head)
      })

  /** Make `bpe_count` callable from SQL text in an already-built session
    * (the [[VectorFunctions.registerSql]] pattern). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = bpeCountDescription
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
