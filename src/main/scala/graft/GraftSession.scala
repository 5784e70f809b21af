package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for running this library at scale.
  * The driver harness builds its own sessions for Verify/Bench; library
  * users get the same knobs here.
  */
object GraftSession {

  /** Apply the engine's standing configuration to a builder:
    *  - AQE on (runtime coalescing, skew-join split, join re-planning) —
    *    the mechanism that turns these statically-declared plans into
    *    right-sized ones at 100 TB;
    *  - shuffle partitions sized to the cluster, not the 200 default;
    *  - UTC session timezone (oracle parity and sane event-time math);
    *  - nanosAsLong is set per-read in [[Tables]], not here, since it is
    *    a runtime-settable legacy conf.
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)

  /** Local session for tests/tools: `local[cores]`, shuffle = cores. */
  def local(cores: Int, appName: String = "graft"): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]").appName(appName), cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
