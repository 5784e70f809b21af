package graft

import graft.plans.VecDotRewrite
import org.apache.spark.sql.functions._

/** The optimizer rewrite of the textbook higher-order dot product into
  * the native FloatVecDot: fires on the canonical pattern (either
  * operand order), is bit-exact against both the fold it replaces and
  * the direct vec_dot call, and leaves non-dot folds untouched. Injected
  * here via `spark.experimental.extraOptimizations` (the shared test
  * session predates GraftExtensions; production sessions get the rule
  * from there). */
class VecDotRewriteSpec extends SparkSpec {

  private val dotSql =
    "aggregate(zip_with(embedding, e2, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0 as double), (acc, v) -> acc + v)"

  private def frame = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"),
      reverse(col("embedding")).as("e2"))

  test("the canonical fold is rewritten to vec_dot and stays bit-exact") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      val df = frame.selectExpr("vec_id", s"$dotSql AS d")
      assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        "rule did not fire")
      val direct = frame.select(col("vec_id"),
        org.apache.spark.sql.graft.VectorFunctions.vec_dot(col("embedding"), col("e2")).as("d"))
      assert(df.orderBy("vec_id").collect().toSeq ==
        direct.orderBy("vec_id").collect().toSeq)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rewrite equals the interpreted fold it replaces, value for value") {
    val folded = frame.selectExpr("vec_id", s"$dotSql AS d")
      .orderBy("vec_id").collect() // no rule injected: the real fold
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      val rewritten = frame.selectExpr("vec_id", s"$dotSql AS d")
        .orderBy("vec_id").collect()
      assert(rewritten.toSeq == folded.toSeq)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("non-dot folds are left untouched") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      val diff = frame.selectExpr("vec_id",
        "aggregate(zip_with(embedding, e2, (x, y) -> cast(x as double) - cast(y as double)), " +
          "cast(0 as double), (acc, v) -> acc + v) AS d")
      assert(!diff.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      val mx = frame.selectExpr("vec_id",
        s"aggregate(zip_with(embedding, e2, (x, y) -> cast(x as double) * cast(y as double)), " +
          "cast(1 as double), (acc, v) -> acc + v) AS d") // nonzero seed
      assert(!mx.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("soundness gates: float-typed multiply and -0.0 seed are not rewritten") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      // bare float multiply rounds each product to FLOAT before the
      // accumulation — rewriting would change results
      val bare = frame.selectExpr("vec_id",
        "aggregate(zip_with(embedding, e2, (x, y) -> x * y), " +
          "cast(0 as double), (acc, v) -> acc + v) AS d")
      assert(!bare.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      val negZero = frame.selectExpr("vec_id",
        "aggregate(zip_with(embedding, e2, (x, y) -> cast(x as double) * cast(y as double)), " +
          "-0.0d, (acc, v) -> acc + v) AS d")
      assert(!negZero.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("unequal lengths still yield NULL under the rewrite (zip_with pad semantics)") {
    import spark.implicits._
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      // ConvertToLocalRelation folds this tiny frame to a LocalRelation
      // (the BucketingSpec-documented trap), so the plan string can't be
      // inspected — the VALUE is the contract: the rewrite's size guard
      // must preserve the fold's NULL on dimension mismatch
      val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f, 4f)),
        (Array(1f, 2f), Array(3f, 4f))).toDF("embedding", "e2")
        .selectExpr(s"$dotSql AS d")
      val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(got.toSeq == Seq(None, Some(11.0)))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("nullable elements get a runtime null-element guard (default assume=false)") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      // parquet-read list elements resolve nullable → the rewrite still
      // fires, but guarded by NOT exists(arr, e -> e IS NULL) so a real
      // null element yields NULL exactly like the fold
      val plan = frame.selectExpr("vec_id", s"$dotSql AS d")
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("vec_dot"), "guarded rewrite did not fire")
      assert(plan.contains("exists"), "null-element guard missing")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("a genuine null element yields NULL under the guarded rewrite, like the fold") {
    // build a nullable-element float array via an expression (element_at
    // of a map with a missing key is typed nullable), one row poisoned
    val mk = "transform(embedding, (e, i) -> " +
      "CASE WHEN vec_id = 3 AND i = 0 THEN cast(null as float) ELSE e END)"
    def q = frame.selectExpr("vec_id", s"$mk AS embedding", "e2")
      .selectExpr("vec_id", s"$dotSql AS d").orderBy("vec_id")
    val folded = q.collect() // no rule: real fold semantics
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      val got = q
      assert(got.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      val rows = got.collect()
      assert(rows.toSeq == folded.toSeq)
      assert(rows.exists(_.isNullAt(1)), "poisoned row should be NULL")
      assert(rows.exists(!_.isNullAt(1)), "clean rows should stay non-NULL")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("assumeNonNullElements=true skips the guard (embedding-table contract)") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    spark.conf.set("spark.graft.rewriteVecDot.assumeNonNullElements", "true")
    try {
      val plan = frame.selectExpr("vec_id", s"$dotSql AS d")
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("vec_dot"))
      assert(!plan.contains("exists"), "guard should be skipped under the contract flag")
    } finally {
      spark.conf.unset("spark.graft.rewriteVecDot.assumeNonNullElements")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("squared-L2 fold is rewritten to vec_sqdist and stays bit-exact") {
    val distSql =
      "aggregate(zip_with(embedding, e2, (x, y) -> (cast(x as double) - cast(y as double)) " +
        "* (cast(x as double) - cast(y as double))), " +
        "cast(0 as double), (acc, v) -> acc + v)"
    def q = frame.selectExpr("vec_id", s"$distSql AS d").orderBy("vec_id")
    val folded = q.collect() // no rule: the real fold
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      val df = q
      assert(df.queryExecution.optimizedPlan.toString.contains("vec_sqdist"),
        "sqdist rule did not fire")
      assert(df.collect().toSeq == folded.toSeq)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("a (x-y)*(y-x) product is a negated square — never rewritten") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      val df = frame.selectExpr("vec_id",
        "aggregate(zip_with(embedding, e2, (x, y) -> (cast(x as double) - cast(y as double)) " +
          "* (cast(y as double) - cast(x as double))), " +
          "cast(0 as double), (acc, v) -> acc + v) AS d")
      assert(!df.queryExecution.optimizedPlan.toString.contains("vec_sqdist"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("non-deterministic array children are not rewritten") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VecDotRewrite
    try {
      // shuffle() is non-deterministic; the rewrite would duplicate it
      // into the size guard and the dot with possibly different values
      val df = frame.selectExpr("vec_id",
        "aggregate(zip_with(shuffle(embedding), e2, (x, y) -> cast(x as double) * cast(y as double)), " +
          "cast(0 as double), (acc, v) -> acc + v) AS d")
      assert(!df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    } finally spark.experimental.extraOptimizations = prev
  }
}
