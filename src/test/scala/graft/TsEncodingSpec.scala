package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Fixture-schema contract for `events.ts` (VERDICT r9 #2).
  *
  * The driver-generated fixture has shipped `ts` as parquet
  * TIMESTAMP(NANOS) (readable only as nanos-longs) and as timestamp[us]
  * (read as TIMESTAMP_NTZ); a silent re-encoding once took out 27 queries.
  * This spec writes the same instants under each encoding [[Tables.events]]
  * supports and asserts the derived `ts_ms` is bit-identical across all of
  * them — so the next fixture change is a named test failure, not a wall of
  * downstream analysis errors.
  */
class TsEncodingSpec extends SparkSpec {

  /** (event_id, epoch-micros) rows spanning sub-second precision. */
  private val rows = Seq(
    (1L, 1700000000000000L), // exact second
    (2L, 1700000000123456L), // sub-ms micros (truncation direction matters)
    (3L, 1700000000999999L), // just under the next ms boundary
    (4L, 1712345678901234L),
    (5L, 86400000000L),      // 1970-01-02, small positive
    (6L, -123456789L)        // pre-1970: floor vs truncate-toward-zero diverge
  )

  // Floor division, NOT `us / 1000`: unix_millis floors, so the nanos-long
  // branch must floor too or row 6 (-123456789 us) would read -123456 ms
  // from the long encoding and -123457 ms from the timestamp encodings.
  private val expectedMs: Map[Long, Long] =
    rows.map { case (id, us) => id -> Math.floorDiv(us, 1000L) }.toMap

  private def writeVariant(kind: String): String = {
    val dir = Files.createTempDirectory(s"ts-enc-$kind").toFile.getAbsolutePath
    val s   = spark
    import s.implicits._
    val base = rows
      .toDF("event_id", "us")
      .withColumn("user_id", col("event_id") % 2)
      .withColumn("event_type", lit("move"))
      .withColumn("value", col("event_id").cast("double"))
      .withColumn("props", lit("""{"k": 3}"""))
    val withTs = kind match {
      case "nanos-long" => base.withColumn("ts", col("us") * 1000L)
      case "ntz"        => base.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      case "ltz"        => base.withColumn("ts", timestamp_micros(col("us")))
    }
    withTs
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** A TRUE parquet TIMESTAMP(NANOS, isAdjustedToUTC=false) file, written
    * through parquet-mr directly (Spark itself cannot write nanos). This is
    * the encoding fixture rounds ≤8 actually shipped: without
    * `spark.sql.legacy.parquet.nanosAsLong` the scan fails with
    * [PARQUET_TYPE_ILLEGAL], so this pins the rescue branch independently of
    * whatever encoding the current fixture happens to carry (ADVICE r10).
    */
  private def writeTrueNanos(): String = {
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

    val dir = Files.createTempDirectory("ts-enc-true-nanos").toFile.getAbsolutePath
    val schema = Types
      .buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new HPath(s"$dir/events.parquet"))
      .withType(schema)
      .withConf(new Configuration())
      .build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, us) =>
      val g = factory.newGroup()
      g.append("event_id", id)
      g.append("ts", us * 1000L)
      g.append("user_id", id % 2)
      g.append("event_type", "move")
      g.append("value", id.toDouble)
      g.append("props", """{"k": 3}""")
      writer.write(g)
    } finally writer.close()
    dir
  }

  private def tsMsOf(dir: String): Map[Long, Long] =
    Tables
      .events(spark, dir)
      .select("event_id", "ts_ms")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("ts_ms is identical across nanos-long, TIMESTAMP_NTZ and TIMESTAMP encodings") {
    val byKind = Seq("nanos-long", "ntz", "ltz").map(k => k -> tsMsOf(writeVariant(k))).toMap
    byKind.foreach { case (kind, got) =>
      assert(got == expectedMs, s"encoding $kind diverged from exact floor(micros/1000)")
    }
  }

  test("a TRUE parquet TIMESTAMP(NANOS) file reads through the nanosAsLong rescue branch") {
    val dir = writeTrueNanos()
    // Without the conf the scan must reject the type — proving this file
    // really carries the illegal-for-Spark NANOS annotation (i.e. the test
    // would catch the rescue conf being dropped, not vacuously pass on a
    // plain INT64 column).
    val sessionConf = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.set(sessionConf, "false")
    val rejected = intercept[Exception] {
      spark.read.parquet(s"$dir/events.parquet").collect()
    }
    assert(rejected.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
      rejected.getMessage.toLowerCase.contains("illegal parquet type"),
      s"expected a NANOS-type rejection, got: ${rejected.getMessage.take(200)}")
    assert(tsMsOf(dir) == expectedMs, "true-NANOS encoding diverged from floor(micros/1000)")
  }

  test("the shipped fixture reads through the contract and matches DuckDB's epoch_ns path shape") {
    val df = Tables.events(spark, sf).select("event_id", "ts_ms", "k", "x", "y", "z")
    assert(df.count() > 0)
    // ts_ms must be a bigint (the reference's epoch-ms ts, process.py:204)
    assert(df.schema("ts_ms").dataType.typeName == "long")
  }

  test("an unsupported ts encoding fails loudly with the contract message") {
    val dir = Files.createTempDirectory("ts-enc-bad").toFile.getAbsolutePath
    val s   = spark
    import s.implicits._
    rows
      .toDF("event_id", "us")
      .withColumn("ts", col("us").cast("string")) // string ts: no valid derivation
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("move"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("fixture schema contract"))
  }
}
