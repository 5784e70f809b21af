package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.{FloatVecDot, FloatVecSqDist}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order vector folds
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  * {{{ aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0d, (acc, v) -> acc + v) }}}
  *
  * (with the usual float→double casts) into the native codegen'd
  * [[FloatVecDot]] / [[FloatVecSqDist]]. Lambda-bearing array functions evaluate interpreted,
  * one InternalRow per element, outside whole-stage codegen — the
  * measured-17x trap documented on the Similarity operators. With this
  * rule injected (GraftExtensions / `spark.experimental
  * .extraOptimizations`), SQL-text users who write the textbook fold get
  * the fused-loop plan automatically; the library's own operators call
  * vec_dot directly.
  *
  * Soundness gates:
  *  - the multiply must be DOUBLE-typed (operands under casts). A bare
  *    float-typed `(x, y) -> x * y` over float arrays rounds each
  *    product to FLOAT before accumulating — rewriting it would change
  *    results, so it is left alone;
  *  - zip_with null-pads unequal lengths and the fold propagates that
  *    to NULL, while the native loop truncates — the rewrite emits
  *    `if(size(a) = size(b), vec_dot(a, b), null)` so the
  *    dimension-mismatch signal survives (two array-length reads per
  *    row; the dot loop dominates);
  *  - the seed must be literal +0.0 (a -0.0 seed surfaces through the
  *    fold on empty arrays where the native loop returns +0.0);
  *  - FloatVecDot reads null ELEMENT slots as 0 while the fold
  *    null-propagates. For non-nullable element types the fast form is
  *    emitted directly; for nullable-element arrays (parquet list
  *    fields resolve nullable even when no null exists) the rewrite
  *    adds a runtime `NOT exists(arr, e -> e IS NULL)` guard per
  *    nullable side, so a genuine null element still yields NULL
  *    exactly like the fold. Sessions that pin the non-null-elements
  *    contract (the embedding tables — same contract as every direct
  *    FloatVecDot call site) can set
  *    `spark.graft.rewriteVecDot.assumeNonNullElements=true`
  *    (default false) to skip the guard;
  *  - both array children must be deterministic — the rewrite
  *    duplicates them into the size guard and the dot, and a
  *    non-deterministic child could disagree between occurrences
  *    (the standard precondition for expression-duplicating rules).
  *
  * Both multiplication and the merge addition accept their operands in
  * either order (IEEE double `*` and `+` are commutative — the VALUE is
  * unchanged, only operand order), and the accumulation order of the
  * fold (left-to-right over elements) is exactly FloatVecDot's loop, so
  * the rewrite is bit-exact. Runs after constant folding, so the zero
  * literal is already a plain `0.0`.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  /** The lambda variable itself, or the variable under a cast to double
    * (the shape resolution produces for float-element arrays). */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case c: Cast if c.dataType == DoubleType => isVar(c.child, v)
    case _ => false
  }

  /** {e1, e2} == {x, y} in either order. */
  private def isPair(e1: Expression, e2: Expression,
                     x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (isVar(e1, x) && isVar(e2, y)) || (isVar(e1, y) && isVar(e2, x))

  private def floatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** `NOT exists(e, el -> el IS NULL)` when the element type is nullable
    * and the non-null contract is not assumed — the runtime guard that
    * keeps the rewrite's NULL-propagation identical to the fold's. */
  private def noNullElements(e: Expression, assumeNonNull: Boolean): Option[Expression] =
    e.dataType match {
      case ArrayType(FloatType, true) if !assumeNonNull =>
        val el = NamedLambdaVariable("el", FloatType, nullable = true)
        Some(Not(ArrayExists(e, LambdaFunction(IsNull(el), Seq(el)))))
      case _ => None
    }

  /** The shared outer shape — a +0.0-seeded double summation fold over
    * zip_with of two deterministic float arrays — with `body` the
    * per-element lambda expression. Returns the (a, b, x, y, body) parts
    * when everything but the element operation matches. */
  private object VecFold {
    def unapply(e: Expression): Option[(Expression, Expression,
        NamedLambdaVariable, NamedLambdaVariable, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(body,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(s1, s2, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fv: NamedLambdaVariable), _))
          if zero.isInstanceOf[Double] &&
            java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
            floatArray(a) && floatArray(b) &&
            a.deterministic && b.deterministic &&
            isPair(s1, s2, acc, v) &&
            fin.exprId == fv.exprId =>
        Some((a, b, x, y, body))
      case _ => None
    }
  }

  private def guarded(a: Expression, b: Expression, assumeNonNull: Boolean,
                      fused: Expression): Expression = {
    val sizeEq =
      EqualTo(Size(a, legacySizeOfNull = false), Size(b, legacySizeOfNull = false))
    val cond = (Seq(sizeEq) ++ noNullElements(a, assumeNonNull) ++
      noNullElements(b, assumeNonNull)).reduceLeft(And(_, _))
    If(cond, fused, Literal(null, DoubleType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val assumeNonNull = conf
      .getConfString("spark.graft.rewriteVecDot.assumeNonNullElements", "false")
      .toBoolean
    plan.transformAllExpressions {
      // dot product: (x, y) -> x * y under double casts
      case VecFold(a, b, x, y, Multiply(m1, m2, _))
          if m1.dataType == DoubleType && m2.dataType == DoubleType &&
            isPair(m1, m2, x, y) =>
        guarded(a, b, assumeNonNull, FloatVecDot(a, b))
      // squared L2: (x, y) -> (x - y) * (x - y) under double casts. The
      // square makes operand order free bit-exactly (IEEE negation is
      // exact), so either subtraction direction rewrites — but both
      // factors must be the SAME subtraction (a (x-y)*(y-x) product is a
      // NEGATED square, not a distance). The asymmetric native signature
      // (float[], double[]) gets its right side from an exact
      // element-wise float->double cast.
      case VecFold(a, b, x, y,
            Multiply(d1 @ Subtract(u1, u2, _), d2: Subtract, _))
          if d1.dataType == DoubleType && d1.semanticEquals(d2) &&
            isPair(u1, u2, x, y) =>
        guarded(a, b, assumeNonNull,
          FloatVecSqDist(a, Cast(b, ArrayType(DoubleType,
            b.dataType.asInstanceOf[ArrayType].containsNull))))
    }
  }
}
