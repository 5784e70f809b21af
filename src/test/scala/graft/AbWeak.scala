package graft

import graft.operators.{Hybrid, Relational, Skew}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Isolated same-JVM A/B for the three r16 sf1 bench outliers
  * (VERDICT r16 task 1): `skew_salted_join` (10.95 s vs a 3.7-4.7 s
  * four-round band), `grouping_sets` (4.15 s vs 1.3-1.7 s) and
  * `hybrid_topk` (3.06 s vs 1.2-1.4 s) — none touched in r16, all flat
  * at sf0.1, so the suspects are host drift vs the 64g heap's GC
  * geometry. This harness runs ONLY the three queries, INTERLEAVED
  * (round-robin over rounds, so a host-load burst hits all three
  * equally instead of whichever query the full bench reached), in one
  * fresh JVM, and prints per-query samples + min/median as one JSON
  * line. Run it twice — SPARK_DRIVER_MEM=64g and 8g — and compare to
  * the band: in-band at both heaps = drift (record in BASELINE.md,
  * clear the weak marks); out-of-band only at 64g = the heap geometry
  * is real (tune it).
  *
  *   SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.AbWeak /root/testdata/sf1 5"
  *
  * r18: generalized — an optional third arg names ANY comma-separated
  * subset of [[SparkEntry.queries]] (the r17 verdict's task 1 runs it on
  * `split_leakage,events_funnel` at sf0.1); no third arg keeps the r16
  * trio, so every recorded BASELINE.md A/B stays reproducible verbatim.
  */
object AbWeak {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf1"
    val rounds = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries: Seq[(String, () => DataFrame)] =
      if (args.length > 2)
        args(2).split(',').toSeq.map { name =>
          val fn = SparkEntry.queries.getOrElse(name,
            throw new IllegalArgumentException(s"unknown query $name"))
          name -> (() => fn(spark, sfDir))
        }
      else Seq(
        "skew_salted_join" -> (() => Skew.saltedJoinAgg(spark, sfDir)),
        "grouping_sets" -> (() => Relational.groupingSets(spark, sfDir)),
        "hybrid_topk" -> (() => Hybrid.hybridTopK(spark, sfDir)))

    // warmup round: codegen + JIT + page cache, not measured
    queries.foreach { case (_, mk) => mk().count() }

    val samples = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      queries.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        mk().count()
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val heap = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
    val parts = queries.map { case (name, _) =>
      val xs = samples(name)
      val sorted = xs.sorted
      val med = sorted(sorted.size / 2)
      val arr = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      s""""$name":{"sec":$arr,"min":${f"${xs.min}%.3f"},"median":${f"$med%.3f"}}"""
    }
    println(s"""{"metric":"ab_weak","sf":"$sfDir","cpus":$cpus,"heap":"$heap",${parts.mkString(",")}}""")
    spark.stop()
  }
}
