package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak fixture amplifier (dev tool, not part of the library API).
  *
  * The driver ships fixtures at sf0.001/0.01/0.1 only; the sf1 soak the
  * round-10 verdict asked for needs a 10x table set with the SAME schema
  * and the SAME referential structure. This main derives it from the
  * driver's own sf0.1 parquet — no synthetic generation — by key-offset
  * replication: each fact/dim row is emitted K times with every key column
  * (primary and foreign alike) shifted by `copy * stride`, where stride =
  * the key's max value in the source. That preserves, exactly:
  *   - all FK joins (each copy joins only to its own copy's rows),
  *   - per-key group sizes and per-user event streams (windows see the
  *     same partitions, K times as many of them),
  *   - value distributions (amounts, dates, text, vectors untouched).
  * `region`/`nation` stay fixed, as TPC-H itself scales them.
  *
  * Every table lands as a SINGLE parquet file named `<table>.parquet`
  * (written via one task, then moved into place) because the DuckDB oracle
  * side reads `read_parquet('<dir>/<table>.parquet')` — a directory would
  * break it; Spark still parallelizes the read across row groups.
  *
  * Usage: Amplify <srcSfDir> <dstDir> [K=10]
  */
object Amplify {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // stride = max + 1: several fixture key domains are 0-based, and a
    // stride of max alone would collide copy i's key 0 with copy i-1's
    // max key (duplicate ids would then break uniqueness invariants and
    // tie-break determinism downstream)
    def maxKey(t: String, c: String): Long =
      read(t).agg(max(col(c))).first().getLong(0) + 1

    // strides come from each key's HOME table so foreign keys shift in
    // lockstep with the primary keys they reference
    val stride = Map(
      "cust"  -> maxKey("customer", "c_custkey"),
      "supp"  -> maxKey("supplier", "s_suppkey"),
      "part"  -> maxKey("part", "p_partkey"),
      "order" -> maxKey("orders", "o_orderkey"),
      "event" -> maxKey("events", "event_id"),
      "user"  -> maxKey("events", "user_id"),
      "doc"   -> maxKey("documents", "doc_id"),
      "vec"   -> maxKey("embeddings", "vec_id"))

    /** Emit K key-shifted copies of `df` in one scan (explode, no self-
      * union), preserving column order and types. */
    def amplify(df: DataFrame, keys: Map[String, String]): DataFrame = {
      val cols = df.columns
      df.withColumn("__i", explode(sequence(lit(0L), lit(k - 1L))))
        .select(cols.map { c =>
          keys.get(c) match {
            case Some(s) => (col(c) + col("__i") * stride(s)).as(c)
            case None    => col(c)
          }
        }: _*)
    }

    def writeSingleFile(df: DataFrame, t: String): Unit = {
      val tmp = s"$dst/__tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $t"))
      val target = new java.io.File(s"$dst/$t.parquet")
      if (target.exists()) target.delete()
      if (!part.renameTo(target)) sys.error(s"rename failed for $t")
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
    }

    val plan: Seq[(String, Map[String, String])] = Seq(
      "region"   -> Map.empty,
      "nation"   -> Map.empty,
      "customer" -> Map("c_custkey" -> "cust"),
      "supplier" -> Map("s_suppkey" -> "supp"),
      "part"     -> Map("p_partkey" -> "part"),
      "orders"   -> Map("o_orderkey" -> "order", "o_custkey" -> "cust"),
      "lineitem" -> Map("l_orderkey" -> "order", "l_partkey" -> "part",
                        "l_suppkey" -> "supp"),
      "events"   -> Map("event_id" -> "event", "user_id" -> "user"),
      "documents" -> Map("doc_id" -> "doc"),
      "embeddings" -> Map("vec_id" -> "vec"))

    plan.foreach { case (t, keys) =>
      val df = read(t)
      val out = if (keys.isEmpty) df else amplify(df, keys)
      writeSingleFile(out, t)
      println(s"$t: ${read(t).count()} -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
