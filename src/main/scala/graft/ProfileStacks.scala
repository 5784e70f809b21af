package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): the driver-gap microscope.
  * Runs each named query warm, then samples EVERY live thread's stack at
  * ~5 ms while the timed invocation runs, and prints the most frequent
  * (thread-group, leaf-ish frame) pairs — a substitute for a profiler
  * when deciding what the "gap = driver/planning/IO" in [[ProfileJobs]]
  * actually consists of. Frames are bucketed by the first interesting
  * Spark/graft frame from the top of the stack.
  */
object ProfileStacks {
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

    def interesting(st: Array[StackTraceElement]): String = {
      val s = st.find { e =>
        val c = e.getClassName
        (c.startsWith("org.apache.spark.sql.catalyst") ||
         c.startsWith("org.apache.spark.sql.execution") ||
         c.startsWith("org.apache.spark.sql.sources") ||
         c.startsWith("graft") ||
         c.startsWith("org.apache.parquet") ||
         c.startsWith("org.apache.hadoop") ||
         c.startsWith("org.apache.spark.scheduler") ||
         c.startsWith("java.io") || c.startsWith("java.nio") ||
         c.startsWith("org.codehaus.janino")) &&
        !c.contains("Logging")
      }.orElse(st.headOption)
      s.map(e => e.getClassName.replaceAll("^org\\.apache\\.spark\\.sql\\.", "sql.")
        .replaceAll("^org\\.apache\\.", "") + "." + e.getMethodName)
        .getOrElse("<empty>")
    }

    for (n <- args.toSeq) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warmup
      spark.catalog.clearCache()
      val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var run = true
      val sampler = new Thread(() => {
        while (run) {
          val all = Thread.getAllStackTraces
          all.forEach { (t, st) =>
            if (st.nonEmpty && t.getState == Thread.State.RUNNABLE &&
                !t.getName.contains("sampler")) {
              val grp =
                if (t.getName == "main") "main"
                else if (t.getName.contains("Executor task launch")) "task"
                else t.getName.replaceAll("-\\d+$", "")
              counts.merge(grp + " | " + interesting(st), 1, (a, b) => a + b)
            }
          }
          Thread.sleep(5)
        }
      }, "sampler")
      sampler.setDaemon(true)
      val t0 = System.nanoTime()
      sampler.start()
      fn(spark, sfDir).count()
      run = false
      val wall = (System.nanoTime() - t0) / 1e9
      sampler.join(200)
      println(f"\n=== $n  wall=$wall%.3f s ===")
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2.intValue).take(28).foreach {
        case (k, v) => println(f"  $v%5d  $k")
      }
    }
    spark.stop()
  }
}
