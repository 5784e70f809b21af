package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format coverage (SURVEY §2.1 S1/S4): every interchange
  * format the engine reads and writes round-trips schema and values —
  * CSV with header (the reference's export format), JSON lines (its
  * ingest format), and ORC (the second columnar format Spark ships).
  * Parquet is exercised everywhere else (fact table, Verify dumps).
  */
class FormatsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val sample = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), col("ts_ms"))
    .limit(200)
    .cache()

  private def assertRoundTrip(back: org.apache.spark.sql.DataFrame): Unit = {
    assert(back.count() === sample.count())
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      sample.schema.map(f => (f.name, f.dataType)))
    assert(back.except(sample).count() === 0)
    assert(sample.except(back).count() === 0)
  }

  test("csv round trip with header and explicit read schema") {
    val dir = tmp("csv")
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    assertRoundTrip(
      spark.read.schema(sample.schema).option("header", "true").csv(dir))
  }

  test("json lines round trip with explicit read schema") {
    val dir = tmp("json")
    sample.write.mode("overwrite").json(dir)
    assertRoundTrip(spark.read.schema(sample.schema).json(dir))
  }

  test("orc round trip preserves schema without a read-side schema") {
    val dir = tmp("orc")
    sample.write.mode("overwrite").orc(dir)
    assertRoundTrip(spark.read.orc(dir))
  }

  test("csv export shape: single file with header, reference S4 contract") {
    val dir = tmp("export")
    sample.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val firstLine = scala.io.Source.fromFile(files.head).getLines().next()
    assert(firstLine === "event_id,user_id,event_type,value,ts_ms")
  }

  test("parquet schema evolution: widened writes merge, old rows null-extend") {
    import spark.implicits._
    val dir = tmp("evolve")
    // v1 of the fact table: two columns
    Seq((1L, "click"), (2L, "view")).toDF("event_id", "event_type")
      .write.mode("append").parquet(dir)
    // v2 adds a column (the long-lived-table reality at 100 TB: schema
    // grows; historical files stay untouched)
    Seq((3L, "click", 0.5)).toDF("event_id", "event_type", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("event_id", "event_type", "score"))
    assert(merged.count() === 3)
    assert(merged.filter(col("score").isNull).count() === 2)
    assert(merged.filter(col("event_id") === 3L).select("score").first().getDouble(0) === 0.5)
  }

  test("map and generator functions: build, merge, extract, explode_outer") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b"), Seq(10, 20)),
      (2L, Seq.empty[String], Seq.empty[Int])
    ).toDF("id", "ks", "vs")
      .withColumn("m", map_from_arrays(col("ks"), col("vs")))
      .withColumn("m2", map_concat(col("m"), map(lit("z"), lit(99))))
    val r1 = df.filter($"id" === 1)
      .select(element_at($"m2", "a"), size(map_keys($"m2")), element_at(map_values($"m2"), -1))
      .collect()(0)
    assert(r1.getInt(0) === 10 && r1.getInt(1) === 3 && r1.getInt(2) === 99)
    // explode_outer keeps rows whose array is empty (null-extended) —
    // the left-lateral generator shape; plain explode would drop id 2.
    val outer = df.select($"id", explode_outer($"ks").as("k"))
    assert(outer.count() === 3)
    assert(outer.filter($"id" === 2 && $"k".isNull).count() === 1)
    assert(df.select($"id", explode($"ks")).count() === 2)
  }
}
