package graft

/** Guards the driver contract itself: every oracle key maps to a
  * registered query, and every registered query runs end-to-end on the
  * smallest fixture (catches a broken query before the round gate does). */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query has an oracle (zero rows-only since r8)") {
    // approx_distinct, the last rows-only row, carries the Sketches-style
    // bound oracle now — a new query without an oracle is a regression
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracles: $rowsOnly")
  }

  test("every registered query executes on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows and matches the registered flagship") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
