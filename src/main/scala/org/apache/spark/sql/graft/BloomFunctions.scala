package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

// Hosted under org.apache.spark.sql (like VectorExpressions) so the
// private[sql] Column<->Expression bridge and Catalyst's own bloom
// expressions — the machinery behind spark.sql.optimizer.runtime
// .bloomFilter — are reachable as first-class library functions.

/** Bridges to Spark's native runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`), the exact pair
  * the optimizer's InjectRuntimeFilter rule uses, exposed so an operator
  * can place a bloom front *deliberately* where the rule's join-pattern
  * heuristics don't reach (e.g. the corpus side of an incremental-dedup
  * anti-join). Both sides must hash identically: pass `xxhash64(key)`
  * to BOTH [[bloomFilterAgg]] and [[mightContain]].
  */
object BloomFunctions {

  /** Aggregate a 64-bit-hashed key column into a serialized bloom filter
    * (one binary row). `numBits`/`expectedItems` follow the standard
    * sizing rule: bits ≈ -n·ln(p)/ln(2)², i.e. ~10 bits/item for p≈1%. */
  def bloomFilterAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a one-row bloom DataFrame (as produced by
    * [[bloomFilterAgg]]), attached as a SCALAR SUBQUERY — the same shape
    * InjectRuntimeFilter emits, so the bloom build executes once as a
    * subquery stage and its result is broadcast into the probe-side scan
    * filter; no driver-side collect enters the operator's dataflow. On an
    * empty build side the subquery yields NULL and the probe filter drops
    * every row — exactly right for an anti-join front (nothing to collide
    * with means the corpus side is irrelevant). */
  def mightContain(bloomScalar: DataFrame, hashed: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ScalarSubquery(bloomScalar.queryExecution.analyzed),
      ExpressionUtils.expression(hashed)))
}
