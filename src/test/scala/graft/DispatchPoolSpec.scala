package graft

import graft.sources.Dispatch
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dispatch under CONCURRENCY + failure (VERDICT r10 item 8): the pooled
  * `Dispatch.run` pass (16 worker threads over independent Spark jobs) is
  * killed in the crash window between result durability (CSVs on disk) and
  * fulfillment durability (the ledger append — the pass's LAST step), then
  * restarted. The contract to prove, at pool width:
  *   - at-least-once: every valid request is eventually fulfilled;
  *   - no double-fulfillment: a request ledgered by an earlier pass is
  *     never re-run by a later one (one CSV dir, one ledger row each);
  *   - skip semantics survive the pool: invalid-arg and unknown-function
  *     requests are never ledgered and never block the pass.
  */
class DispatchPoolSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** 24 requests: 21 valid across all three routed functions (pool fully
    * engaged at width 16), 2 with invalid args, 1 unknown function. */
  private def mkRequests = {
    import spark.implicits._
    val valid = (0 until 21).map { i =>
      val id = 100L + i
      i % 3 match {
        case 0 => (id, "aggregate_interaction_type", 0,
          s"""{"sessionId": "click", "interactionType": ${i % 10}}""")
        case 1 => (id, "aggregate_user", 0,
          s"""{"sessionId": "view", "clientId": ${i % 5}}""")
        case _ => (id, "user_energy", 0,
          s"""{"clientId": ${i % 5}, "entityType": ${i % 4}}""")
      }
    }
    val skipped = Seq(
      (900L, "aggregate_user", 0, """{"sessionId": "view"}"""), // missing clientId
      (901L, "user_energy", 0, """{"clientId": null, "entityType": 1}"""),
      (902L, "no_such_function", 0, """{"sessionId": "view"}"""))
    (valid ++ skipped)
      .toDF("request_id", "aggregation_function", "is_it_fulfilled", "message")
  }

  private def csvDirsFor(outDir: String, id: Long): Array[java.io.File] =
    Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.endsWith(s"_req$id"))

  test("pool crash between CSVs and ledger: restart fulfills exactly once, skips stay unledgered") {
    import spark.implicits._
    val requests = mkRequests
    val validIds = (100L until 121L).toSeq

    // Phase A — the kill: a regular FILE on the ledger path's parent makes
    // the ledger append (the pass's last step) fail AFTER the pooled
    // workers wrote their CSVs: exactly a crash between result and
    // fulfillment durability, with the pool fully engaged.
    val outA = tmp("poolA")
    val blocker = Files.createTempFile("pool_blocker", ".txt")
    intercept[Exception] {
      Dispatch.run(spark, sf, requests, outA, s"$blocker/ledger")
    }
    validIds.foreach { id =>
      assert(csvDirsFor(outA, id).length == 1, s"request $id CSV missing before the crash")
    }
    Seq(900L, 901L, 902L).foreach { id =>
      assert(csvDirsFor(outA, id).isEmpty, s"skipped request $id must write nothing")
    }

    // Phase B — a prior pass that died after ledgering a SUBSET: serve the
    // first half against a healthy ledger (this is the only way a partial
    // ledger arises — the append is all-or-nothing per pass).
    val outB = tmp("poolB")
    val ledger = tmp("poolLedger") + "/ledger"
    val half = requests.filter(col("request_id") < 110 || col("request_id") >= 900)
    val done1 = Dispatch.run(spark, sf, half, outB, ledger)
    assert(done1.map(_._1).sorted == (100L until 110L), s"first half: $done1")

    // Phase C — restart over the FULL set: only the unfulfilled remainder
    // runs; fulfilled requests are not re-run (still exactly one CSV dir
    // each) and the ledger ends with one row per valid request.
    val done2 = Dispatch.run(spark, sf, requests, outB, ledger)
    assert(done2.map(_._1).sorted == (110L until 121L), s"remainder: $done2")
    validIds.foreach { id =>
      assert(csvDirsFor(outB, id).length == 1,
        s"request $id has ${csvDirsFor(outB, id).length} CSV dirs — re-run or lost")
    }
    val ledgered = spark.read.parquet(ledger)
      .select("request_id").as[Long].collect().sorted.toSeq
    assert(ledgered == validIds, s"ledger must hold each valid id exactly once: $ledgered")

    // Phase D — idempotence: a further pass over the same set is a no-op.
    assert(Dispatch.run(spark, sf, requests, outB, ledger).isEmpty)
    assert(spark.read.parquet(ledger).count() == validIds.size)
  }

  test("sql-mode request: raw SQL over a registered log table, read-only, exactly-once") {
    import spark.implicits._
    import graft.sources.CommitLog
    val t = tmp("pool_sqltbl")
    CommitLog.append(spark, t,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"))
    spark.sql("DROP TABLE IF EXISTS pool_sql_tbl")
    spark.catalog.createTable("pool_sql_tbl", "graft-commitlog", Map("table" -> t))
    try {
      val q = "SELECT k, v * 2 AS v2 FROM pool_sql_tbl WHERE k >= 2 ORDER BY k"
      val requests = Seq(
        (500L, "sql", 0, s"""{"sql": "$q"}"""),
        // a write statement must be REFUSED before execution (and, being a
        // failure rather than an invalid-arg skip, stays pending)
        (501L, "sql", 0, """{"sql": "INSERT INTO pool_sql_tbl VALUES (9, 9.0)"}"""),
        // CTE-wrapped write: the guard scans the whole tree, not the root
        (502L, "sql", 0,
          """{"sql": "WITH c AS (SELECT 9 AS k, 9.0 AS v) INSERT INTO pool_sql_tbl SELECT * FROM c"}"""),
        (503L, "sql", 0, """{"other": 1}""")) // missing sql arg: skip
        .toDF("request_id", "aggregation_function", "is_it_fulfilled", "message")
      val out = tmp("pool_sqlout")
      val ledger = tmp("pool_sqlled") + "/ledger"
      val done = Dispatch.run(spark, sf, requests, out, ledger)
      assert(done.map(_._1) == Seq(500L), s"only the read-only statement fulfills: $done")
      val dirs = csvDirsFor(out, 500L)
      assert(dirs.length == 1)
      val lines = java.nio.file.Files.readAllLines(
        new java.io.File(dirs.head, "part-00000.csv").toPath)
      assert(lines.toArray.toSeq == Seq("k,v2", "2,40.0", "3,60.0"),
        s"the CSV must hold the statement's result: $lines")
      assert(CommitLog.read(spark, t).count() == 3,
        "a refused write statement must mutate NOTHING")
      Seq(501L, 502L, 503L).foreach(id =>
        assert(csvDirsFor(out, id).isEmpty, s"request $id must write nothing"))
      // exactly-once across passes: the fulfilled request is never re-run
      assert(Dispatch.run(spark, sf, requests, out, ledger).isEmpty)
      assert(csvDirsFor(out, 500L).length == 1)
      assert(spark.read.parquet(ledger).select("request_id").as[Long]
        .collect().toSeq == Seq(500L))
    } finally spark.sql("DROP TABLE IF EXISTS pool_sql_tbl")
  }

  test("sql-mode guard: allowlist refuses every write shape incl. InsertIntoDir") {
    def refused(sql: String): Boolean =
      try { Dispatch.requireReadOnly(spark, sql); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("read-only") }

    // The r18 ADVICE hole: InsertIntoDir extends neither Command nor
    // ParsedStatement, so the old blacklist EXECUTED this eagerly —
    // deleting/overwriting an arbitrary directory from the serving loop.
    val dir = tmp("pool_guard_dir")
    assert(refused(s"INSERT OVERWRITE DIRECTORY '$dir' USING parquet SELECT 1 AS a"),
      "INSERT OVERWRITE DIRECTORY must be refused")
    assert(refused(s"INSERT OVERWRITE LOCAL DIRECTORY '$dir' USING csv SELECT 1 AS a"))
    assert(!new java.io.File(dir, "_SUCCESS").exists,
      "the refused statement must not have written the directory")
    // the rest of the write/DDL/command surface stays refused
    Seq(
      "INSERT INTO t VALUES (1)",
      "WITH c AS (SELECT 1 AS k) INSERT INTO t SELECT * FROM c",
      "CREATE TABLE t (a INT) USING parquet",
      "CREATE TABLE t2 AS SELECT 1 AS a",
      "DROP TABLE IF EXISTS t",
      "TRUNCATE TABLE t",
      "ALTER TABLE t ADD COLUMNS (b INT)",
      "UPDATE t SET a = 1",
      "DELETE FROM t WHERE a = 1",
      "MERGE INTO t USING s ON t.a = s.a WHEN MATCHED THEN DELETE",
      "CACHE TABLE t",
      "UNCACHE TABLE t",
      "REFRESH TABLE t",
      "SET spark.sql.shuffle.partitions=1",
      "ANALYZE TABLE t COMPUTE STATISTICS",
      "SHOW TABLES",
      "DESCRIBE TABLE t",
      "EXPLAIN SELECT 1").foreach(s => assert(refused(s), s"must refuse: $s"))

    // fail-closed must not over-refuse: the read-only shapes the serving
    // loop exists for (each exercising distinct parser nodes) all pass
    Seq(
      "SELECT 1 AS a",
      "SELECT a, count(*) AS c FROM t WHERE a > 0 GROUP BY a HAVING count(*) > 1 ORDER BY a LIMIT 5",
      "SELECT a, count(*) AS c FROM t GROUP BY a LIMIT 5 OFFSET 2",
      "WITH c AS (SELECT 1 AS k) SELECT * FROM c JOIN c c2 ON c.k = c2.k",
      "SELECT DISTINCT a FROM t",
      "SELECT a FROM t UNION ALL SELECT a FROM u",
      "SELECT a FROM t INTERSECT SELECT a FROM u",
      "SELECT a FROM t EXCEPT SELECT a FROM u",
      "SELECT a, row_number() OVER (PARTITION BY b ORDER BY a) AS rn FROM t",
      "SELECT a, row_number() OVER w AS rn FROM t WINDOW w AS (ORDER BY a)",
      "SELECT * FROM t TABLESAMPLE (10 PERCENT)",
      "SELECT * FROM range(10)",
      "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS v(k, s)",
      "SELECT t.a, e.x FROM t LATERAL VIEW explode(arr) e AS x",
      "SELECT * FROM t, LATERAL (SELECT a + 1 AS b)",
      "SELECT * FROM (SELECT a, b FROM t) PIVOT (sum(b) FOR a IN (1, 2))",
      "SELECT * FROM t UNPIVOT (v FOR c IN (a, b))",
      "SELECT /*+ BROADCAST(t) */ a FROM t",
      "SELECT a FROM t WHERE a IN (SELECT a FROM u WHERE u.b = t.b)",
      "SELECT (SELECT max(a) FROM u) AS m FROM t").foreach(s =>
      assert(!refused(s), s"allowlist must accept read-only: $s"))
  }
}
