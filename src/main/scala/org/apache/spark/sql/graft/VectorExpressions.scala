package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
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

/** Native SRP (signed-random-projection) signature: for each hyperplane
  * row of ±1 `signs`, the sign bit of Σ_d signs(p)(d)·round(emb(d)·10⁶)
  * — micro-unit LONG quantization, so the projection is exact integer
  * arithmetic and the resulting bucket is reproducible across
  * partitionings and engines (the DuckDB twin recomputes the identical
  * sums from the same hash-derived matrix).
  *
  * Why native: the Column-expression formulation of this is
  * planes×dims (384) chained scalar expressions in one Project — past
  * the codegen method budget, so the whole stage fell back to
  * interpreted eval and ran ~0.3 ms/row. This is one fused primitive
  * loop, inside whole-stage codegen (the FloatVecDot rationale at one
  * more level of scale).
  *
  * Rounding is EXACT half-away-from-zero on the binary double
  * (truncate, then compare the exactly-representable fractional
  * remainder against 0.5) ≡ C std::round ≡ DuckDB's round. The naive
  * `(long)(s + 0.5)` is NOT equivalent: for s just below k+0.5 the
  * addition can round UP across the boundary (e.g. s =
  * 0.49999999999999994 → s+0.5 = 1.0) and flip a bucket bit against
  * the oracle. Assumes non-null elements (the embedding-table
  * contract, as FloatVecDot). */
case class SrpSignature(child: Expression, signs: Seq[Seq[Int]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_signature"

  private lazy val matrix: Array[Array[Int]] = signs.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bucket = 0
    var p = 0
    while (p < matrix.length) {
      val row = matrix(p)
      val n = math.min(x.numElements(), row.length)
      var acc = 0L
      var d = 0
      while (d < n) {
        val s = x.getFloat(d).toDouble * 1000000.0
        var t = s.toLong
        val f = s - t // exact for |s| < 2^53
        if (f >= 0.5d) t += 1 else if (f <= -0.5d) t -= 1
        acc += row(d) * t
        d += 1
      }
      if (acc >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("srpSigns", matrix, "int[][]")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val f = ctx.freshName("f")
      s"""
         |int $bucket = 0;
         |for (int $p = 0; $p < $m.length; $p++) {
         |  int $n = java.lang.Math.min($a.numElements(), $m[$p].length);
         |  long $acc = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $s = (double) $a.getFloat($d) * 1000000.0;
         |    long $t = (long) $s;
         |    double $f = $s - $t; // exact for |s| < 2^53
         |    if ($f >= 0.5d) $t += 1L; else if ($f <= -0.5d) $t -= 1L;
         |    $acc += $m[$p][$d] * $t;
         |  }
         |  if ($acc >= 0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

  /** Column API for [[SrpSignature]]. */
  def srp_signature(a: Column, signs: Seq[Seq[Int]]): Column =
    ExpressionUtils.column(SrpSignature(ExpressionUtils.expression(a), signs))

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
