package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of selected queries so scan
  * pruning (ReadSchema/PushedFilters), join strategies, and codegen spans
  * can be audited. Usage: runMain graft.PlanAudit [queryName ...]
  * (no args = a representative subset). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "join_revenue", "user_energy", "user_proximity",
        "dedup_ngram_jaccard", "ann_brute_force", "txt_word_freq")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
