package graft

import graft.sources.CommitLog
import graft.streaming.CdcReplica
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Phase profile of `occ_replica_stream` (r17 verdict task #6): the query
  * costs 3.5–4.2 s at sf0.1 while its DATA is the 25-row nation table at
  * EVERY scale factor — so the suspect split is fixed streaming-machinery
  * latency (query start, per-trigger planning, checkpoint writes, stop)
  * vs actual apply work. Prints one JSON line with per-phase seconds,
  * per-batch apply seconds, and a machinery-only control (the SAME
  * stream shape over an EMPTY-since-bootstrap source window — zero apply
  * work). Run:
  *   sbt "Test/runMain graft.ProfileReplica /root/testdata/sf0.1 3"
  */
object ProfileReplica {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // warmup: one full query (codegen + state-store classes + JIT)
    CdcReplica.occReplicaStream(spark, sfDir).count()

    val out = (1 to rounds).map { _ =>
      // phase 1: history build (3 commits: append, cdc merge, cdc delete)
      var t0 = System.nanoTime()
      val src = Files.createTempDirectory("prof_repl_src").toString
      val replica = Files.createTempDirectory("prof_repl_dst").toString
      val ckpt = Files.createTempDirectory("prof_repl_ckpt").toString
      val nation = Tables.nation(spark, sfDir)
        .select("n_nationkey", "n_name", "n_regionkey")
      CommitLog.append(spark, src, nation)
      val updates = nation.where(col("n_nationkey") < 5)
        .withColumn("n_regionkey", col("n_regionkey") + 100)
      val inserts = nation.where(col("n_nationkey") < 5)
        .withColumn("n_nationkey", col("n_nationkey") + 100)
      CommitLog.mergeInto(spark, src, updates.unionByName(inserts),
        Seq("n_nationkey"), cdc = true)
      CommitLog.deleteWhere(spark, src,
        col("n_nationkey") >= 20 && col("n_nationkey") < 100, cdc = true)
      val buildSec = sec(t0)

      // phase 2: the paced stream, with per-batch apply times observed
      // from inside foreachBatch (machinery latency = lifecycle − applies)
      val applySecs = collection.mutable.ArrayBuffer.empty[Double]
      t0 = System.nanoTime()
      val q = spark.readStream
        .format("graft-changefeed").option("table", src).option("cdc", "true")
        .option("maxVersionsPerTrigger", "2").load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val a0 = System.nanoTime()
          CommitLog.applyChanges(batch.sparkSession, replica, batch,
            Seq("n_nationkey"), txn = Some(("prof_replica", batchId)))
          applySecs += sec(a0)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("0 seconds"))
        .start()
      try q.processAllAvailable() finally q.stop()
      val streamSec = sec(t0)

      // phase 3: the final ordered read of the replica
      t0 = System.nanoTime()
      CommitLog.read(spark, replica).orderBy("n_nationkey").count()
      val readSec = sec(t0)

      // control: RESTART the same stream from its own (caught-up)
      // checkpoint — no new commits, foreachBatch never fires = the
      // machinery floor (query start + offset resolution + stop)
      t0 = System.nanoTime()
      val q2 = spark.readStream
        .format("graft-changefeed").option("table", src).option("cdc", "true")
        .option("maxVersionsPerTrigger", "2").load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          CommitLog.applyChanges(batch.sparkSession, replica, batch,
            Seq("n_nationkey"), txn = Some(("prof_replica", batchId)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("0 seconds"))
        .start()
      try q2.processAllAvailable() finally q2.stop()
      val emptyStreamSec = sec(t0)

      (buildSec, streamSec, applySecs.toSeq, readSec, emptyStreamSec)
    }
    def f(d: Double) = f"$d%.3f"
    val parts = out.map { case (b, s, as, r, e) =>
      s"""{"build":${f(b)},"stream":${f(s)},"applies":[${as.map(f).mkString(",")}],""" +
        s""""read":${f(r)},"empty_stream":${f(e)}}"""
    }
    println(s"""{"metric":"profile_replica","sf":"$sfDir","rounds":[${parts.mkString(",")}]}""")
    spark.stop()
  }
}
