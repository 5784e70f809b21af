package graft

import java.nio.file.Files

import graft.sources.CommitLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r19 optimization guard: staging stats (per-file row count + index
  * bounds) now come from the staged parquet FOOTERS on the driver
  * instead of a Spark job; a non-primitive / annotated stat column must
  * fall back to the job aggregate with identical bounds semantics. The
  * spec pins both paths through the public pruning surface — if the
  * footer decode ever recorded wrong bounds, pruning would either lose
  * rows (readWhere mismatch) or stop pruning (file-count assertion). */
class FooterStatsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4, "footer-stats-spec")
  private val dir = "/root/testdata/sf0.01"

  test("footer path: INT64 index bounds prune files and lose no rows") {
    val table = Files.createTempDirectory("fs_long").toString
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    CommitLog.appendIndexed(spark, table,
      o.repartitionByRange(8, col("o_orderkey")), "o_orderkey")
    // range-disjoint files: a narrow key range must open a strict subset
    val pruned = CommitLog.prunedFiles(table, 1000d, 2000d)
    assert(pruned.nonEmpty && pruned.size < 8,
      s"expected bounds-pruning to a strict subset of 8 files, got ${pruned.size}")
    val got = CommitLog.readWhere(spark, table, "o_orderkey", 1000d, 2000d)
      .orderBy("o_orderkey").collect().map(_.getLong(0))
    val want = o.where(col("o_orderkey").between(1000, 2000))
      .orderBy("o_orderkey").collect().map(_.getLong(0))
    assert(got.sameElements(want), "bounds pruning lost or invented rows")
  }

  test("footer path: DOUBLE index bounds match a plain filter") {
    val table = Files.createTempDirectory("fs_double").toString
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    CommitLog.appendIndexed(spark, table,
      o.repartitionByRange(8, col("o_totalprice")), "o_totalprice")
    val got = CommitLog.readWhere(spark, table, "o_totalprice", 1000d, 50000d)
      .agg(count(lit(1)), sum("o_orderkey")).collect()(0)
    val want = o.where(col("o_totalprice").between(1000d, 50000d))
      .agg(count(lit(1)), sum("o_orderkey")).collect()(0)
    assert(got == want, s"double-bounds read diverged: $got vs $want")
  }

  test("fallback path: DECIMAL (annotated INT64) stat column keeps exact bounds semantics") {
    // decimals ride INT32/INT64 with a DecimalLogicalTypeAnnotation —
    // the footer reader must REFUSE them (a raw backing-int decode would
    // be scale-shifted) and the job fallback must record correct bounds
    val table = Files.createTempDirectory("fs_dec").toString
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price_dec"))
    CommitLog.appendIndexed(spark, table,
      o.repartitionByRange(4, col("price_dec")), "price_dec")
    val pruned = CommitLog.prunedFiles(table, 1000d, 2000d)
    assert(pruned.size < 4,
      s"fallback bounds must still prune (got ${pruned.size} of 4 files)")
    val got = CommitLog.readWhere(spark, table, "price_dec", 1000d, 50000d)
      .agg(count(lit(1))).collect()(0).getLong(0)
    val want = o.where(col("price_dec").between(1000d, 50000d)).count()
    assert(got == want, s"decimal-bounds read diverged: $got vs $want")
  }
}
