package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `plans/r19/<query>_<suffix>.txt` files — the
  * `.explain("formatted")` output of the named queries on the CURRENT
  * tree — so optimization rounds can commit before/after plan evidence.
  * Usage: runMain graft.PlanSnap <suffix> <query> [query ...]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <suffix> <query> [query ...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r19"))
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      println(s"[plansnap] $n")
      val qe = SparkEntry.queries(n)(spark, dir).queryExecution
      val text = qe.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        text.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
