package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time span removal kernel: walk the text's space-separated
  * tokens once, dropping every token whose 0-based position falls inside
  * any [s, e] span, and re-join survivors with single spaces. */
object SpanScrubKernel {
  /** `spans` as flattened (s, e) pairs, caller-guaranteed disjoint and
    * ascending (the mergeSpans contract). One linear walk with a span
    * cursor — O(tokens + spans), no per-token span scan. */
  def scrub(text: String, spans: Array[Long]): UTF8String = {
    val sb = new java.lang.StringBuilder(text.length)
    val n = text.length
    var tokIdx = 0L
    var si = 0
    var wStart = 0
    var idx = 0
    var first = true
    while (idx <= n) {
      if (idx == n || text.charAt(idx) == ' ') {
        // token [wStart, idx) has index tokIdx (empty tokens count —
        // split-on-single-space semantics, matching the span positions)
        while (si < spans.length && spans(si + 1) < tokIdx) si += 2
        val inSpan = si < spans.length &&
          tokIdx >= spans(si) && tokIdx <= spans(si + 1)
        if (!inSpan) {
          if (!first) sb.append(' ')
          sb.append(text, wStart, idx)
          first = false
        }
        tokIdx += 1
        wStart = idx + 1
      }
      idx += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native span removal: `span_scrub(text, spans)` → the text with every
  * token inside a span dropped, survivors re-joined with single spaces.
  * `spans` is an array<struct<s bigint, e bigint>> of DISJOINT,
  * position-sorted-after-sorting token intervals ([[graft.operators
  * .Dedup.mergeSpans]] output — the expression sorts defensively since
  * collect_list order is partition-dependent). Replaces the
  * `filter(..., exists(...))` higher-order form, which evaluated
  * interpreted per token × span. */
case class SpanScrub(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(StructType(Seq(
      StructField("s", LongType), StructField("e", LongType)))))
  override def dataType: DataType = StringType
  override def prettyName: String = "span_scrub"

  /** Flatten + sort the span structs (collect_list order is
    * partition-dependent; the kernel wants ascending disjoint pairs). */
  private def flatSpans(a: Any): Array[Long] = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val pairs = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, 2)
      pairs(i) = (st.getLong(0), st.getLong(1))
      i += 1
    }
    java.util.Arrays.sort(pairs, Ordering.by((p: (Long, Long)) => p._1))
    val out = new Array[Long](2 * n)
    i = 0
    while (i < n) { out(2 * i) = pairs(i)._1; out(2 * i + 1) = pairs(i)._2; i += 1 }
    out
  }

  override def nullSafeEval(t: Any, s: Any): Any =
    SpanScrubKernel.scrub(t.toString, flatSpans(s))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("spanScrub", this, classOf[SpanScrub].getName)
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $self.kernelCall($t.toString(), $s);")
  }

  /** Codegen entry: public bridge so generated code avoids the private
    * flattening helper's access rules. */
  def kernelCall(text: String, spans: Any): UTF8String =
    SpanScrubKernel.scrub(text, flatSpans(spans))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanScrubFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column API for [[SpanScrub]]. */
  def span_scrub(text: Column, spans: Column): Column =
    ExpressionUtils.column(SpanScrub(
      ExpressionUtils.expression(text), ExpressionUtils.expression(spans)))
}
