package graft

import graft.sources.CommitLog
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Commit-recorded bloom filters — point-lookup file skipping for the
  * table layer (the public precedent is Delta's bloom filter index /
  * parquet column blooms, lifted to FILE granularity in the commit
  * metadata so pruning happens at LISTING time, before any footer read
  * or task launch).
  *
  * Why it exists: min/max stats prune RANGES; on an unclustered table
  * every file spans the whole key domain and `key = x` keeps all of
  * them. The bloom keeps O(1) files. The invariant that makes it safe
  * is NO FALSE NEGATIVES — a file containing the key always tests
  * positive — which the sweep test checks for every key in the table,
  * write-side SQL hashing against driver-side catalyst evaluation. */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("bloomskip").toString

  private def bloomedTable(n: Int = 400, files: Int = 8,
                           bits: Int = 1 << 14): String = {
    val t = freshTable()
    CommitLog.appendBloomed(spark, t,
      (0 until n).map(i => (i.toLong, s"v$i")).toDF("k", "s")
        .repartition(files), // round-robin: range stats would keep ALL files
      "k", bits)
    t
  }

  test("no false negatives: every present key's file survives pruning, for every key") {
    val t = bloomedTable()
    // ground truth: which file holds which key (metadata column)
    val truth = CommitLog.read(spark, t)
      .withColumn("f", col("_metadata.file_name"))
      .select("k", "f").as[(Long, String)].collect()
      .map { case (k, f) => k -> s"data/$f" }.toMap
    truth.foreach { case (k, f) =>
      val kept = CommitLog.prunedFilesBloom(t, "k", k)
      assert(kept.contains(f),
        s"bloom lost key $k (its file $f was pruned) — false negative")
    }
  }

  test("pruning is effective: a point lookup keeps few files, not all") {
    val t = bloomedTable()
    val total = CommitLog.snapshot(t).files.size
    assert(total === 8)
    // 400 keys / 8 files = 50 keys per file; 2^14 bits => ~0.03 bits/key
    // loaded, false positives ~0 — expect essentially 1 file per key
    val keptCounts = (0L until 400L by 7L).map(k =>
      CommitLog.prunedFilesBloom(t, "k", k).size)
    assert(keptCounts.max <= 3, s"pruning too weak: kept up to ${keptCounts.max}/8")
    assert(keptCounts.min >= 1)
    // an absent key prunes everything (modulo false positives)
    val absent = CommitLog.prunedFilesBloom(t, "k", 999999L)
    assert(absent.size <= 2, s"absent key kept ${absent.size}/8 files")
  }

  test("readWhereEquals returns exactly the right rows (false positives filtered)") {
    val t = bloomedTable()
    assert(CommitLog.readWhereEquals(spark, t, "k", 123L)
      .select("s").as[String].collect().toSeq === Seq("v123"))
    assert(CommitLog.readWhereEquals(spark, t, "k", 999999L).count() === 0L)
    // schema-stable empty result
    assert(CommitLog.readWhereEquals(spark, t, "k", 999999L).columns.toSeq
      === Seq("k", "s"))
  }

  test("string key columns prune too (canonical string hashing)") {
    val t = freshTable()
    CommitLog.appendBloomed(spark, t,
      (0 until 200).map(i => (s"id_$i", i)).toDF("id", "n").repartition(4),
      "id", bits = 1 << 13)
    val kept = CommitLog.prunedFilesBloom(t, "id", "id_77")
    assert(kept.size < 4)
    assert(CommitLog.readWhereEquals(spark, t, "id", "id_77")
      .select("n").as[Int].collect().toSeq === Seq(77))
  }

  test("type-mismatched probes canonicalize through the column type (no silent empties)") {
    // the r16 advisory's bloom false-negative: the write side hashed
    // CAST(k AS STRING) ("11") while a Double 11.0 probe stringified as
    // "11.0" — every file tested negative and the lookup silently
    // returned empty even though col === lit(11.0) matches after Spark's
    // implicit cast. Probes now cast through the column's log-carried
    // type, so every value form of the same key prunes to the same files.
    val t = bloomedTable()
    val keptLong = CommitLog.prunedFilesBloom(t, "k", 11L).toSet
    assert(keptLong.size < CommitLog.snapshot(t).files.size)
    // same key, mismatched runtime types: Double, Int, String
    assert(CommitLog.prunedFilesBloom(t, "k", 11.0d).toSet === keptLong)
    assert(CommitLog.prunedFilesBloom(t, "k", 11).toSet === keptLong)
    assert(CommitLog.prunedFilesBloom(t, "k", "11").toSet === keptLong)
    assert(CommitLog.readWhereEquals(spark, t, "k", 11.0d)
      .select("s").as[String].collect().toSeq === Seq("v11"),
      "a Double probe of a bigint key must return the row, not silent empty")
    // a value the column type cannot represent exactly fails the
    // round-trip guard: pruning is DISABLED (all files kept), and the
    // exact predicate decides — never a wrong answer, never a false miss
    assert(CommitLog.prunedFilesBloom(t, "k", 11.5d).size
      === CommitLog.snapshot(t).files.size)
    assert(CommitLog.readWhereEquals(spark, t, "k", 11.5d).count() === 0L)
  }

  test("lookups on other columns and bloom-less files stay conservative") {
    val t = bloomedTable(n = 100, files = 2)
    // a lookup on a DIFFERENT column keeps everything
    assert(CommitLog.prunedFilesBloom(t, "s", "v5").size === 2)
    // a plain (bloom-less) append: its files are always kept
    CommitLog.append(spark, t, Seq((9999L, "late")).toDF("k", "s"))
    assert(CommitLog.prunedFilesBloom(t, "k", 9999L).nonEmpty)
    assert(CommitLog.readWhereEquals(spark, t, "k", 9999L).count() === 1L)
  }

  test("null keys: never hashed in, never looked up, equality semantics hold") {
    val t = freshTable()
    CommitLog.appendBloomed(spark, t,
      Seq((Some(1L), "a"), (None, "nullk"), (Some(3L), "c"))
        .toDF("k", "s"), "k", bits = 1 << 10)
    assert(CommitLog.readWhereEquals(spark, t, "k", 1L)
      .select("s").as[String].collect().toSeq === Seq("a"))
    intercept[IllegalArgumentException] {
      CommitLog.readWhereEquals(spark, t, "k", null)
    }
  }

  test("blooms survive checkpoints and restores; compaction drops them conservatively") {
    val t = bloomedTable(n = 100, files = 4, bits = 1 << 13)
    CommitLog.checkpoint(t)
    CommitLog.append(spark, t, Seq((5000L, "x")).toDF("k", "s"))
    // corrupt the pre-checkpoint commit: pruning must work off the checkpoint
    Files.write(Paths.get(t, "_log", f"v${0L}%012d.json"), "garbage".getBytes("UTF-8"))
    assert(CommitLog.prunedFilesBloom(t, "k", 50L).size < 5)
    // compaction rewrites without blooms: lookups degrade to keep-all, never wrong
    CommitLog.compact(spark, t, targetFiles = 1)
    assert(CommitLog.prunedFilesBloom(t, "k", 50L).size === 1)
    assert(CommitLog.readWhereEquals(spark, t, "k", 50L).count() === 1L)
  }

  test("restore re-adds files WITH their blooms (pruning survives the round trip)") {
    val t = bloomedTable(n = 100, files = 4, bits = 1 << 13)
    val prunedBefore = CommitLog.prunedFilesBloom(t, "k", 42L)
    CommitLog.compact(spark, t, targetFiles = 1) // v1: blooms gone
    CommitLog.restore(spark, t, asOf = 0L)       // v2: originals + blooms back
    assert(CommitLog.prunedFilesBloom(t, "k", 42L).toSet === prunedBefore.toSet,
      "restored files must carry their recorded blooms")
  }

  test("point lookup composes with deletion vectors: a dv-deleted key reads empty") {
    val t = bloomedTable(n = 100, files = 4, bits = 1 << 13)
    CommitLog.deleteWhereDv(spark, t, col("k") === 42L)
    assert(CommitLog.readWhereEquals(spark, t, "k", 42L).count() === 0L)
    assert(CommitLog.readWhereEquals(spark, t, "k", 41L).count() === 1L)
  }

  test("driver-side probe positions equal the SQL job's hash (the parity the invariant rests on)") {
    // the same (value, seed) pair through functions.xxhash64 and through
    // the catalyst Literal evaluation — if these ever diverge, pruning
    // would silently lose keys, so the equality is pinned directly
    val m = 8192L
    val vals = Seq("0", "42", "id_7", "-1", "999999999999")
    val sqlPos = vals.toDF("v")
      .select(col("v"), explode(array((0 until 4).map(i =>
        pmod(xxhash64(col("v"), lit(i)), lit(m))): _*)).as("p"))
      .groupBy("v").agg(collect_list("p").as("ps"))
      .as[(String, Seq[Long])].collect().toMap
    val probeM = CommitLog.getClass.getDeclaredMethods
      .find(_.getName == "bloomProbes").get
    probeM.setAccessible(true)
    vals.foreach { v =>
      val driver = probeM.invoke(CommitLog, v, Long.box(m), Int.box(4))
        .asInstanceOf[Seq[Int]].map(_.toLong)
      assert(driver.sorted === sqlPos(v).sorted,
        s"hash divergence for '$v': driver=$driver sql=${sqlPos(v)}")
    }
  }
}
