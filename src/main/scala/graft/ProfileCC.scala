package graft
import org.apache.spark.sql.SparkSession

/** Scratch: per-stage timing of dedupGroups internals at sf0.1. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CC $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val r = t("total dedupGroups+count") {
      graft.operators.Dedup.dedupGroups(spark, sfDir).count()
    }
    println(s"CC rows $r")
    spark.stop()
  }
}
