package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scaler (round-11 sf1 soak, VERDICT r10 #1):
  * replicates a driver-generated sf directory `copies`× with
  * referential-integrity-preserving key remaps, so the full 165-query
  * registry can be oracle-gated and benched at 10× the committed scale.
  * Pure column arithmetic, no randomness — run twice, get identical bytes
  * of data (parquet layout aside).
  *
  * Key remap: copy `i` shifts every primary key by `i * (max(key)+1)` and
  * every foreign key by its REFERENCED table's stride, so each copy is a
  * self-consistent replica (joins never cross copies). `region`/`nation`
  * are fixed-size TPC-H dimensions and stay single-copy (nationkey
  * references from copies resolve against them, as at any TPC-H SF).
  *
  * Content perturbation (what keeps the 10× soak HONEST instead of
  * degenerate):
  *   - `documents.text`: 30 % of docs per copy (doc_id % 10 < 3) keep
  *     identical text — cross-copy exact-duplicate groups of size
  *     `copies` that stress exact dedup and LSH bucket caps. The rest get
  *     a per-copy token prefix (disjoint vocabularies), so the
  *     rare-shingle similarity graph becomes `copies` disjoint replicas —
  *     same diameter, 10× the edges — instead of collapsing (identical
  *     text everywhere would push every shingle's doc-count past the
  *     rare-band and leave the CC family with an empty graph).
  *     `n_chars` is recomputed (the fixture's n_chars == length(text)
  *     contract holds by construction).
  *   - `embeddings`: element 0 shifted by `i/1000` per copy — copies are
  *     NEAR-duplicates of the originals (emb_neardup/ANN get real 10×
  *     structure) without the exact-tie explosion identical vectors
  *     would create.
  *   - `events`: event_id/user_id strided, everything else (ts included —
  *     raw, untouched, per the fixture ts contract) verbatim: 10× the
  *     users with identical per-user event shapes.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val inDir  = args(0)
    val outDir = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    // mode (arg 3):
    //   - default ("perturbed"): the honest soak for the oracle gate.
    //   - "plain": NO content perturbation — every copy is byte-identical
    //     in its non-key columns. Degenerate on purpose: reproduces 10x
    //     exact-duplication pathologies (it found the rare-shingle
    //     blocking collapse fixed in Dedup.dedupGroups).
    //   - "extend" (r13, VERDICT r12 ask #7): perturbed content PLUS a
    //     per-copy TIME-AXIS shift of events.ts by i * (span + 1 h) —
    //     real corpus growth extends the time range instead of stacking
    //     copies into the same window, so interval-join pair density
    //     grows ~linearly with copies instead of ~quadratically. This is
    //     the fixture that makes BASELINE.md's "time_pair_join's sf1
    //     cost is overlay density" claim testable. BENCH-ONLY: shifted
    //     timestamps change every event-family result, so the recorded
    //     CORRECTNESS_sf1 oracle does not apply to an extend fixture.
    val mode = if (args.length > 3) args(3) else "perturbed"
    val plain = mode == "plain"
    val extend = mode == "extend"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(name: String): DataFrame = spark.read.parquet(s"$inDir/$name.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).first().getLong(0) + 1L
    /** Single parquet FILE per table (the driver fixture's layout — the
      * DuckDB oracle reads `read_parquet('<dir>/<name>.parquet')`, which
      * does not glob a directory): write coalesced, then promote the one
      * part file to `<name>.parquet`. */
    def wr(df: DataFrame, name: String): Unit = {
      val staging = s"$outDir/_stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $name"))
      val dest = new java.io.File(s"$outDir/$name.parquet")
      if (dest.exists()) dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      new java.io.File(staging).listFiles().foreach(_.delete())
      new java.io.File(staging).delete()
      ()
    }
    /** copies× union of per-copy frames — copy 0 must be the identity. */
    def rep(f: Int => DataFrame): DataFrame =
      (0 until copies).map(f).reduce(_ unionByName _)

    val customer = rd("customer"); val supplier = rd("supplier")
    val part = rd("part"); val orders = rd("orders"); val lineitem = rd("lineitem")
    val events = rd("events"); val documents = rd("documents"); val embeddings = rd("embeddings")
    val sC = stride(customer, "c_custkey"); val sS = stride(supplier, "s_suppkey")
    val sP = stride(part, "p_partkey");     val sO = stride(orders, "o_orderkey")
    val sE = stride(events, "event_id");    val sU = stride(events, "user_id")
    val sD = stride(documents, "doc_id");   val sV = stride(embeddings, "vec_id")

    wr(rd("region"), "region")
    wr(rd("nation"), "nation")
    wr(rep(i => customer.withColumn("c_custkey", col("c_custkey") + lit(i * sC))), "customer")
    wr(rep(i => supplier.withColumn("s_suppkey", col("s_suppkey") + lit(i * sS))), "supplier")
    wr(rep(i => part.withColumn("p_partkey", col("p_partkey") + lit(i * sP))), "part")
    wr(rep(i => orders
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * sO))
      .withColumn("o_custkey", col("o_custkey") + lit(i * sC))), "orders")
    wr(rep(i => lineitem
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * sO))
      .withColumn("l_partkey", col("l_partkey") + lit(i * sP))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * sS))), "lineitem")
    // extend mode: copy i's events shift by i * (span + 1 h), handling
    // both fixture ts encodings (timestamp[us] and NANOS-as-long — the
    // Tables.events contract)
    val tsIsLong = events.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val tsSpan: Long =
      if (!extend) 0L
      else if (tsIsLong) {
        val r = events.agg(min(col("ts")), max(col("ts"))).first()
        (r.getLong(1) - r.getLong(0)) + 3600L * 1000000000L
      } else {
        // TIMESTAMP and TIMESTAMP_NTZ both reduce through unix_micros
        // after a cast (session tz is pinned UTC) — getTimestamp would
        // ClassCastException on the NTZ java8 LocalDateTime
        val r = events
          .select(unix_micros(col("ts").cast("timestamp")).as("t"))
          .agg(min(col("t")), max(col("t"))).first()
        (r.getLong(1) - r.getLong(0)) + 3600L * 1000000L
      }
    def tsShift(i: Int) =
      if (!extend || i == 0) col("ts")
      else if (tsIsLong) col("ts") + lit(i * tsSpan)
      else expr(s"timestampadd(MICROSECOND, CAST(${i * tsSpan} AS BIGINT), ts)")
    wr(rep(i => events
      .withColumn("event_id", col("event_id") + lit(i * sE))
      .withColumn("user_id", col("user_id") + lit(i * sU))
      .withColumn("ts", tsShift(i))), "events")
    wr(rep { i =>
      val txt =
        if (plain || i == 0) col("text")
        else when(col("doc_id") % 10 < 3, col("text"))
          .otherwise(concat_ws(" ",
            expr(s"transform(split(text, ' '), t -> concat('c$i', t))")))
      documents
        .withColumn("text", txt)
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("doc_id", col("doc_id") + lit(i * sD))
    }, "documents")
    wr(rep { i =>
      val emb =
        if (plain) col("embedding")
        else expr(s"transform(embedding, (x, j) -> IF(j = 0, cast(x + $i / 1000.0 as float), x))")
      embeddings
        .withColumn("embedding", emb)
        .withColumn("vec_id", col("vec_id") + lit(i * sV))
    }, "embeddings")

    println(s"[genscale] wrote ${copies}x of $inDir to $outDir")
    spark.stop()
  }
}
