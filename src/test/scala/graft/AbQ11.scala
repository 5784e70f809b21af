package graft

import graft.operators.Relational4
import org.apache.spark.sql.SparkSession

/** Controlled same-session A/B for the r13 sql_q11 bench anomaly
  * (VERDICT r13 "What's wrong" #2): the committed artifact recorded
  * 0.41 s and the driver's rerun on the identical tree 2.8–3.3 s. Runs
  * the legacy twice-consumed shape and the fixed single-consumer shape
  * back-to-back N times in ONE JVM against the same fixture and prints a
  * JSON line with every sample — the evidence BASELINE.md's resolution
  * note cites.
  *
  *   sbt "Test/runMain graft.AbQ11 /root/testdata/sf0.1 6"
  */
object AbQ11 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one warmup each (codegen + JIT), then interleaved samples so a host
    // stall cannot bias one arm
    Relational4.sqlQ11TwiceConsumed(spark, sfDir).count()
    Relational4.sqlQ11(spark, sfDir).count()
    val legacy = scala.collection.mutable.ListBuffer.empty[Double]
    val fixed = scala.collection.mutable.ListBuffer.empty[Double]
    (1 to n).foreach { _ =>
      legacy += timed(Relational4.sqlQ11TwiceConsumed(spark, sfDir).count())
      fixed += timed(Relational4.sqlQ11(spark, sfDir).count())
    }
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"q11_ab","sf":"$sfDir","n":$n,""" +
      s""""legacy_twice_consumed_sec":${arr(legacy.toSeq)},""" +
      s""""fixed_single_consumer_sec":${arr(fixed.toSeq)},""" +
      s""""legacy_min":${f"${legacy.min}%.3f"},"fixed_min":${f"${fixed.min}%.3f"}}""")
    spark.stop()
  }
}
