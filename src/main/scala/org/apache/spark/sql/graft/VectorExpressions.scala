package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

// Hosted under org.apache.spark.sql so the private[sql] Catalyst type-check
// (AbstractDataType) and Column<->Expression bridge (ExpressionUtils) are
// reachable — the conventional home for third-party native expressions.

/** Native Catalyst expression for the float-vector dot product — the one
  * hot-loop primitive of the similarity operators (SURVEY §4.3's
  * "evidence-gated custom Expression" slot).
  *
  * Why not the built-in higher-order fold (`aggregate(zip_with(...))`)?
  * Lambda-bearing array functions are evaluated interpreted, one
  * `InternalRow` per element, and sit outside whole-stage codegen — the
  * same bottleneck measured at 100x on the MinHash pipeline. This
  * expression generates a tight primitive `for` loop over the two
  * `ArrayData` (no boxing, no per-element rows) and participates in
  * codegen, so an ANN scan stays one fused loop per row.
  *
  * Semantics are exactly the fold's: products accumulated left-to-right
  * in DOUBLE — bit-identical to the DuckDB oracle's `list_dot_product`
  * and to the previous formulation. Assumes non-null, equal-length
  * elements (the embedding-table contract).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance between a float vector and a double vector
  * (an embedding against a computed centroid) — the k-means E-step hot
  * loop. Same rationale as [[FloatVecDot]]: the higher-order
  * `aggregate(zip_with(...))` formulation evaluates interpreted outside
  * codegen. Semantics are exactly the fold's: per-element
  * `(double(x_i) - c_i)^2` accumulated left-to-right in DOUBLE —
  * bit-identical to the lambda it replaces and to the DuckDB oracle's
  * `list_sum(list_transform(...))` ON the embedding-table contract
  * (non-null elements, equal lengths, same as [[FloatVecDot]]). Outside
  * that contract the two differ: the fold NULL-propagates a null element
  * or a zip length pad, while this expression reads null slots as 0 and
  * truncates to the shorter length — don't feed it nullable-element
  * arrays. */
case class FloatVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[FloatVecDot]]. */
  def vec_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[FloatVecSqDist]]. */
  def vec_sqdist(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVecSqDist(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Registry entry shared by [[graft.GraftExtensions]] (new sessions via
    * `spark.sql.extensions`) and [[registerSql]] (existing sessions). */
  val vecDotDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"vec_dot expects exactly 2 arguments, got ${children.length}")
        FloatVecDot(children.head, children(1))
      })

  /** Make `vec_dot` callable from SQL text in an already-built session —
    * the session-state registry is `private[sql]`, which this package
    * placement exists to reach. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = vecDotDescription
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
