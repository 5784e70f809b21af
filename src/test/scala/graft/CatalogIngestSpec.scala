package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Catalog/DDL surface (SURVEY §2.1 S5-S8, S11) and batch capture ingest
  * (S1/S2, X6 capture_id split). */
class CatalogIngestSpec extends SparkSpec {

  test("catalog: create table as select, probe existence, insert-select, overwrite") {
    val wh = Files.createTempDirectory("wh").toString
    spark.sql("DROP TABLE IF EXISTS aggregate_interaction") // S5
    assert(!spark.catalog.tableExists("aggregate_interaction")) // S11

    // S6+S7: materialize an aggregation result as a table
    graft.operators.Komodo.aggInteraction(spark, sf)
      .write.option("path", s"$wh/aggregate_interaction")
      .saveAsTable("aggregate_interaction")
    assert(spark.catalog.tableExists("aggregate_interaction"))
    val n1 = spark.table("aggregate_interaction").count()
    assert(n1 > 0)

    // S8: INSERT INTO ... VALUES
    spark.sql("INSERT INTO aggregate_interaction VALUES (999999, 1)")
    assert(spark.table("aggregate_interaction").count() === n1 + 1)

    // overwrite = the reference's DROP/CREATE/INSERT-SELECT cycle
    graft.operators.Komodo.aggInteraction(spark, sf)
      .write.mode("overwrite").saveAsTable("aggregate_interaction")
    assert(spark.table("aggregate_interaction").count() === n1)
    spark.sql("DROP TABLE aggregate_interaction")
  }

  test("batch ingest: explicit schema, capture_id split, session partitioning") {
    val in = Files.createTempDirectory("cap").toString
    val out = Files.createTempDirectory("fact").toString
    val rec =
      """{"capture_id":"126_1630443513898","session_id":126,"client_id":5,
        |"type":"sync","ts":1630443513898,"seq":1,
        |"message":{"clientId":5,"entityType":2,"interactionType":1,
        |"pos":{"x":0.5,"y":1.5,"z":2.5},"strokeType":7,"strokeId":3}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(java.nio.file.Paths.get(s"$in/c.json"), rec)

    val df = Ingest.readCaptures(spark, in)
    val row = df.first()
    // X6: "{session}_{startMs}" split
    assert(row.getAs[Int]("session_from_id") === 126)
    assert(row.getAs[Long]("start_ms") === 1630443513898L)
    // typed JSON struct access, no inference
    assert(df.select(col("message.pos.y")).first().getDouble(0) === 1.5)
    assert(df.select(col("message.entityType")).first().getInt(0) === 2)

    Ingest.appendToFactTable(df, out)
    // partitioned layout: session_id=126 directory exists
    assert(new java.io.File(s"$out/session_id=126").exists())
    assert(spark.read.parquet(out).filter(col("session_id") === 126).count() === 1)
  }

  test("compaction shrinks a partition's file count, preserves rows, leaves others alone") {
    import spark.implicits._
    val out = Files.createTempDirectory("compact").toString + "/fact"
    // simulate 12 micro-batch appends into session 1, plus a session 2
    (1 to 12).foreach { i =>
      Seq((1, i.toLong, s"p$i")).toDF("session_id", "seq", "payload")
        .write.mode("append").partitionBy("session_id").parquet(out)
    }
    Seq((2, 99L, "other")).toDF("session_id", "seq", "payload")
      .write.mode("append").partitionBy("session_id").parquet(out)
    def files(p: Int) = new java.io.File(s"$out/session_id=$p")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = spark.read.parquet(out).agg(sum("seq")).first().getLong(0)
    assert(files(1) === 12)

    Ingest.compactSessions(spark, out, Seq(1), targetFiles = 1)

    assert(files(1) === 1)                  // compacted
    assert(files(2) === 1)                  // untouched partition intact
    assert(spark.read.parquet(out).agg(sum("seq")).first().getLong(0) === before)
    assert(spark.read.parquet(out).count() === 13)
  }

  test("malformed capture records surface as nulls, not job failures") {
    val in = Files.createTempDirectory("bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$in/bad.json"),
      """{"capture_id":"1_2","session_id":"not_an_int"}""")
    val df = Ingest.readCaptures(spark, in)
    assert(df.count() === 1) // permissive mode: row kept
    assert(df.select("session_id").first().isNullAt(0))
  }
}
