package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.VectorFunctions

/** SQL front-door for the library's native expressions: sessions built
  * with `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) can call `vec_dot`
  * directly from SQL text — the same surface the reference exposes for
  * its queries (SURVEY §3: its "IR" is SQL text). Catalyst resolves the
  * function to the codegen'd [[org.apache.spark.sql.graft.FloatVecDot]],
  * so SQL callers get the fused-loop plan, not a UDF.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorFunctions.vecDotDescription)
    ext.injectFunction(org.apache.spark.sql.graft.BpeFunctions.bpeCountDescription)
    // the media kernels: PNG + baseline-JPEG pixel codecs and the
    // perceptual block-mean downsample, callable from raw SQL strings
    org.apache.spark.sql.graft.PngFunctions.descriptions.foreach(ext.injectFunction)
    org.apache.spark.sql.graft.JpegFunctions.descriptions.foreach(ext.injectFunction)
    // declarative aggregate(zip_with(...)) dot products → FloatVecDot
    // (see graft.plans.VecDotRewrite for the soundness gate)
    ext.injectOptimizerRule(_ => graft.plans.VecDotRewrite)
  }
}
