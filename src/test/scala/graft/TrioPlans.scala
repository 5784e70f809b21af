package graft

import graft.operators.{Relational3, Relational4}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-JVM plan-variance evidence for the sql_q10/q11/q12 trio
  * (VERDICT r15 task 5): the driver's JVM ran all three at ~1.0 s where
  * the builder's ran 0.32–0.48 s on the identical tree. This harness
  * prints each query's FINAL (post-AQE) physical-plan shape signature —
  * join operators, exchange kinds, aggregate counts — plus timing
  * samples, as one JSON line. Run it in two FRESH JVMs and diff the
  * signatures: identical shapes = the delta is JVM/page-cache drift
  * (record in BASELINE.md, stop tracking); different shapes = pin the
  * intended one in PlanGuardSpec.
  *
  *   sbt "Test/runMain graft.TrioPlans /root/testdata/sf0.1 5"
  */
object TrioPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "sql_q10" -> (() => Relational3.sqlQ10(spark, sfDir)),
      "sql_q11" -> (() => Relational4.sqlQ11(spark, sfDir)),
      "sql_q12" -> (() => Relational3.sqlQ12(spark, sfDir)))

    // (label, regex): HashAggregate needs the lookbehind or it would
    // also count every ObjectHashAggregate, hiding an HA<->OHA flip
    // from the very diff this harness exists to make
    val ops = Seq(
      "BroadcastHashJoin" -> "BroadcastHashJoin",
      "SortMergeJoin" -> "SortMergeJoin",
      "ShuffledHashJoin" -> "ShuffledHashJoin",
      "BroadcastNestedLoopJoin" -> "BroadcastNestedLoopJoin",
      "Exchange_hashpartitioning" -> "Exchange hashpartitioning",
      "Exchange_rangepartitioning" -> "Exchange rangepartitioning",
      "Exchange_SinglePartition" -> "Exchange SinglePartition",
      "BroadcastExchange" -> "BroadcastExchange",
      "HashAggregate" -> "(?<!Object)HashAggregate",
      "ObjectHashAggregate" -> "ObjectHashAggregate",
      "SortAggregate" -> "SortAggregate")

    val parts = queries.map { case (name, mk) =>
      // warmup drives codegen + JIT and lets AQE finalize the plan
      val warm = mk(); warm.count()
      val plan = warm.queryExecution.executedPlan.toString
      val sig = ops.map { case (label, re) =>
        s""""$label":${re.r.findAllMatchIn(plan).length}""" }
        .mkString("{", ",", "}")
      val samples = (1 to n).map { _ =>
        val t0 = System.nanoTime(); mk().count(); (System.nanoTime() - t0) / 1e9
      }
      val arr = samples.map(x => f"$x%.3f").mkString("[", ",", "]")
      s""""$name":{"sig":$sig,"sec":$arr,"min":${f"${samples.min}%.3f"}}"""
    }
    println(s"""{"metric":"trio_plans","sf":"$sfDir","cpus":$cpus,${parts.mkString(",")}}""")
    spark.stop()
  }
}
