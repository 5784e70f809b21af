package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): times the
  * queries named in args (or a default slow set) with N repeats each and
  * prints per-run seconds, so bench-tail regressions can be separated from
  * host variance.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("user_proximity", "dedup_minhash_lsh", "window_topk_orders",
        "set_except", "set_intersect", "skew_salted_join", "sql_q3",
        "dedup_simhash", "dedup_ngram_jaccard", "window_running_sum")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $n%-22s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
