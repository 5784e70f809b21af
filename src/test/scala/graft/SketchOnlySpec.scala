package graft

import graft.operators.Relational3

/** The production sketch-only winsorized stats (docs/SCALE.md §Check-only):
  * `winsorized_stats_sketch` is the form a 100× run ships, so it must (a)
  * agree with the exact form within the dual-arm check's tolerances and
  * (b) carry NO exact `percentile` aggregate anywhere in its physical plan
  * — the per-group value buffer is the thing it exists to avoid. */
class SketchOnlySpec extends SparkSpec {

  private def near(a: Double, e: Double, rel: Double): Boolean =
    math.abs(a - e) <= math.max(math.abs(e) * rel, 1.0)

  test("sketch form matches the exact form within the check-query tolerances") {
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getString(0) -> (r.getLong(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      }.toMap
    val exact  = keyed(Relational3.winsorizedStats(spark, sf)
      .selectExpr("l_linestatus", "n", "cast(lo as double)", "cast(hi as double)",
        "w_mean", "w_sd"))
    val sketch = keyed(Relational3.winsorizedStatsSketch(spark, sf)
      .selectExpr("l_linestatus", "n", "lo", "hi", "w_mean", "w_sd"))
    assert(sketch.keySet == exact.keySet)
    exact.foreach { case (k, (n, lo, hi, mean, sd)) =>
      val (na, loA, hiA, meanA, sdA) = sketch(k)
      assert(na == n, s"$k: row count must be exact")
      assert(near(loA, lo, 0.01) && near(hiA, hi, 0.01), s"$k: bounds off")
      assert(near(meanA, mean, 0.01), s"$k: mean off")
      assert(near(sdA, sd, 0.05), s"$k: sd off")
    }
  }

  test("sketch form's physical plan has no exact percentile aggregate") {
    val plan = Relational3.winsorizedStatsSketch(spark, sf)
      .queryExecution.executedPlan.toString()
    // both spellings of the sketch aggregate are fine; after removing
    // them, any surviving `percentile(` is the exact buffer-backed one
    val residue = plan
      .replace("approx_percentile(", "")
      .replace("percentile_approx(", "")
    assert(!residue.contains("percentile("),
      s"exact percentile found in sketch-only plan:\n${plan.take(3000)}")
    assert(plan.contains("approx_percentile(") || plan.contains("percentile_approx("),
      "sketch aggregate missing from plan")
  }
}
