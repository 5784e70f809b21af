package graft

import java.nio.file.Files

/** Totality on empty input: every registered query must execute (not
  * throw) against a fixture directory whose tables have the right schema
  * and ZERO rows — the shape of an empty partition, a new tenant, or a
  * filtered-to-nothing date range at 100 TB. Catches eager `.head`,
  * divisions that only work with data, and iterative loops that assume a
  * non-empty graph. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("empty_sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      Tables.table(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query executes on zero-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
