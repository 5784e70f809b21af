package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("semi + anti join partition the customer table") {
    val total = Tables.customer(spark, sf).count()
    val semi  = Relational.semiJoinCustomers(spark, sf).count()
    val anti  = Relational.antiJoinCustomers(spark, sf).count()
    assert(semi + anti === total)
  }

  test("rollup emits per-group rows + per-flag subtotals + grand total") {
    val groups = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus").distinct().count()
    val flags = Tables.lineitem(spark, sf).select("l_returnflag").distinct().count()
    assert(Relational.rollupPricing(spark, sf).count() === groups + flags + 1)
  }

  test("window_topk keeps at most 3 orders per customer, rank-ordered by price") {
    val t = Relational.windowTopkOrders(spark, sf)
    assert(t.groupBy("o_custkey").count().filter(col("count") > 3).count() === 0)
    // rank 1 price >= rank 2 price within every customer
    val self = t.as("a").join(t.as("b"),
      col("a.o_custkey") === col("b.o_custkey") && col("a.rn") < col("b.rn"))
    assert(self.filter(col("a.o_totalprice") < col("b.o_totalprice")).count() === 0)
  }

  test("set ops: intersect ⊆ union, except ∩ intersect = ∅") {
    val u = Relational.setUnion(spark, sf)
    val i = Relational.setIntersect(spark, sf)
    val e = Relational.setExcept(spark, sf)
    assert(i.except(u).count() === 0)
    assert(e.intersect(i).count() === 0)
  }

  test("topk_lineitem is a true descending prefix") {
    val prices = Relational.topkLineitem(spark, sf)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    assert(prices.length === 100)
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q1_agg counts cover the filtered table") {
    val total = Relational.q1Agg(spark, sf).agg(sum("count_order")).first().getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(expr("l_shipdate <= TIMESTAMP '1998-09-01'")).count()
    assert(total === expected)
  }
}
