package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev loop: optional 3rd arg = comma-separated query names to dump
    // (the driver always passes exactly two args → full run)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Vacuity guard (r13 judge ask #3): a 0-row dump makes the oracle
    // compare meaningless (empty == empty always hash-matches), so any
    // zero-row result not in SparkEntry.allowEmpty is flagged loudly on
    // stderr AND recorded in vacuity.json next to oracle_sql.json —
    // visible in the round artifact, not just the local log.
    val zeroRows = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val n = spark.read.parquet(s"$outDir/$name").count()
        if (n == 0 && !SparkEntry.allowEmpty.contains(name)) {
          zeroRows += name
          System.err.println(s"[verify] VACUOUS: $name returned 0 rows at " +
            s"$sfDir and is not in SparkEntry.allowEmpty — its oracle " +
            "pass proves nothing")
        }
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Self-contained oracle SQL: rewrite bare fixture-table references to
    // read_parquet over the actual verify dir, so the DuckDB side works
    // whether or not the harness registered views for every table
    // (documents/embeddings are not in TESTDATA.md's table list).
    // Constraint on oracle authors: reference fixture tables UNALIASED
    // ("FROM orders", never "FROM orders o") — the rewrite appends
    // "AS <table>"; alias through a CTE when correlation names are needed.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val absDir = new java.io.File(sfDir).getAbsolutePath
    def inline(sql: String): String =
      tables.foldLeft(sql) { (s, t) =>
        s.replaceAll(s"(?i)\\b(FROM|JOIN)\\s+$t\\b",
          s"$$1 read_parquet('$absDir/$t.parquet') AS $t")
      }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(inline(v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val vac = s"""{"sf_dir":${q(sfDir)},""" +
      s""""vacuous_not_allowlisted":${zeroRows.sorted.map(q).mkString("[", ",", "]")},""" +
      s""""allow_empty":${SparkEntry.allowEmpty.keys.toSeq.sorted.map(q).mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(s"$outDir/vacuity.json"), vac)
    spark.stop()
  }
}
