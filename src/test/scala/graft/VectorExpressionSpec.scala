package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions.vec_dot

class VectorExpressionSpec extends SparkSpec {

  test("vec_dot is bit-identical to the interpreted higher-order fold") {
    val e = Tables.embeddings(spark, sf)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val pairs = a.crossJoin(broadcast(b)).filter(col("v1") < col("v2")).limit(5000)
    val diff = pairs.select(
        vec_dot(col("e1"), col("e2")).as("custom"),
        expr("aggregate(zip_with(e1, e2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("fold"))
      .filter(col("custom") =!= col("fold"))
    assert(diff.count() === 0)
  }

  test("vec_sqdist is bit-identical to the interpreted higher-order fold") {
    import org.apache.spark.sql.graft.VectorFunctions.vec_sqdist
    val e = Tables.embeddings(spark, sf)
    // centroid side is array<double>, as in the k-means E-step
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("v2"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE) * 1.0000001)").as("c2"))
    val pairs = a.crossJoin(broadcast(b)).filter(col("v1") < col("v2")).limit(5000)
    val diff = pairs.select(
        vec_sqdist(col("e1"), col("c2")).as("custom"),
        expr("aggregate(zip_with(e1, c2, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("fold"))
      .filter(col("custom") =!= col("fold"))
    assert(diff.count() === 0)
    // self-distance against own exact double copy is zero
    val self = e.select(vec_sqdist(col("embedding"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as("d"))
      .filter(col("d") =!= 0.0)
    assert(self.count() === 0)
  }

  test("vec_dot: null array yields null, self-dot is the squared norm") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(1.0f, 2.0f, 3.0f))),
      (None, Some(Array(1.0f, 2.0f, 3.0f)))
    ).toDF("a", "b")
    val rows = df.select(vec_dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) === 14.0)
    assert(rows(1).isNullAt(0))
  }

  test("vec_dot survives both codegen and interpreted evaluation paths") {
    import spark.implicits._
    val df = Seq((Array(0.5f, -0.5f), Array(2.0f, 2.0f))).toDF("a", "b")
    val viaCodegen = df.select(vec_dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(viaCodegen === 0.0)
  }

  test("vec_dot is callable from SQL text once registered (extensions path)") {
    // GraftExtensions injects the same description into sessions built
    // through GraftSession; registerSql applies it to an existing one.
    org.apache.spark.sql.graft.VectorFunctions.registerSql(spark)
    val v = spark.sql(
      "SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(v === 11.0)
    // the injected plan is the native expression, not a UDF wrapper
    val plan = spark.sql(
      "SELECT vec_dot(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT)))")
      .queryExecution.analyzed.toString
    assert(plan.contains("vec_dot"))
  }
}
