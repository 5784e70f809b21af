package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool (not part of the driver contract): runs named queries with a
  * SparkListener attached and prints, per query, every Spark job with its
  * wall time, stage count, task count, executor-cpu sum, shuffle bytes and
  * records — the substitute for the (disabled) UI when deciding where a
  * query's seconds actually go. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileJobs q1 q2 ..."
  */
object ProfileJobs {
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

    case class JobRec(id: Int, desc: String, t0: Long, var t1: Long = 0L,
                      var stages: Int = 0, var tasks: Int = 0,
                      var cpuNs: Long = 0L, var shufR: Long = 0L,
                      var shufW: Long = 0L, var recs: Long = 0L,
                      var names: List[String] = Nil)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties).flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, d, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1
          j.tasks += si.numTasks
          j.names = si.name.take(70) :: j.names
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
          val m = e.taskMetrics
          if (m != null) {
            j.cpuNs += m.executorCpuTime
            j.shufR += m.shuffleReadMetrics.totalBytesRead
            j.shufW += m.shuffleWriteMetrics.bytesWritten
            j.recs += m.inputMetrics.recordsRead
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (n <- args.toSeq) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warmup (codegen+JIT), not profiled
      spark.catalog.clearCache()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"\n=== $n  wall=$wall%.3f s  jobs=${jobs.size} ===")
      var covered = 0L
      jobs.synchronized {
        jobs.values.foreach { j =>
          val w = (j.t1 - j.t0) / 1e3
          covered += (j.t1 - j.t0)
          println(f"  job ${j.id}%3d  ${w}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d " +
            f"cpu=${j.cpuNs / 1e9}%7.2f s  shufR=${j.shufR / 1024}%8d KB shufW=${j.shufW / 1024}%8d KB " +
            f"in=${j.recs}%9d  ${j.names.mkString(" | ").take(90)}")
        }
      }
      println(f"  job-covered wall: ${covered / 1e3}%.3f s of $wall%.3f s (gap = driver/planning/IO)")
    }
    spark.stop()
  }
}
