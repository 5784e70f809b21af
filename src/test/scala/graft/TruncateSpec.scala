package graft

import java.nio.file.Files

import graft.operators.{Dedup, Similarity, Truncate}

/** The reliable-checkpoint seam (VERDICT r10 next-round #2): iterative
  * loops truncate lineage via an injected [[Truncate]] strategy, and the
  * cluster-safe path (`checkpoint` to a reliable dir) must produce
  * byte-identical results to the single-JVM `localCheckpoint` path — the
  * ONLY thing the strategy may change is where the truncated blocks live.
  */
class TruncateSpec extends SparkSpec {

  private def reliableDir(tag: String): String =
    Files.createTempDirectory(s"graft-ck-$tag").toFile.getAbsolutePath

  test("dedupGroups: reliable checkpoint path equals localCheckpoint components exactly") {
    val local = Dedup.dedupGroups(spark, sf, truncate = Some(Truncate.Local))
      .collect().toSeq
    val dir = reliableDir("cc")
    val reliable = Dedup.dedupGroups(spark, sf, truncate = Some(Truncate.Reliable(dir)))
      .collect().toSeq
    assert(reliable == local)
    // the reliable path must have actually written RDD checkpoint data —
    // otherwise this test silently degenerates to local-vs-local
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    assert(walk(new java.io.File(dir)).nonEmpty,
      s"reliable checkpoint dir $dir is empty — checkpoint() never ran")
  }

  test("kmeansFit: reliable checkpoint path equals localCheckpoint fit exactly") {
    val local = Similarity.kmeansFit(spark, sf, k = 4, maxIters = 20,
      truncate = Some(Truncate.Local)).collect().toSeq
    val dir = reliableDir("km")
    val reliable = Similarity.kmeansFit(spark, sf, k = 4, maxIters = 20,
      truncate = Some(Truncate.Reliable(dir))).collect().toSeq
    assert(reliable == local)
  }

  test("Reliable sets the context checkpoint dir ONCE across truncations") {
    import spark.implicits._
    val dir = reliableDir("once")
    val t = Truncate.Reliable(dir)
    t(Seq(1, 2, 3).toDF("x"))
    val after1 = spark.sparkContext.getCheckpointDir
    t(Seq(4, 5, 6).toDF("x"))
    val after2 = spark.sparkContext.getCheckpointDir
    // setCheckpointDir appends a fresh UUID per call; a second set would
    // show up as a different stored dir (and a second UUID subdirectory)
    assert(after1 == after2,
      s"checkpoint dir re-set between truncations: $after1 -> $after2")
    val uuidDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(uuidDirs.length == 1,
      s"expected ONE UUID checkpoint subdir, found ${uuidDirs.length}")
  }

  test("Reliable handles a scheme'd dir CONTAINING A SPACE: still sets once") {
    import spark.implicits._
    // "file:/…/graft ck …" is URI-ILLEGAL (space) but a legal filesystem
    // path; the old java.net.URI fallback cwd-prefixed it, the containment
    // check then failed every call, and setCheckpointDir re-ran per
    // truncation — scattering each round's blocks across fresh UUID dirs
    val base = Files.createTempDirectory("graft ck sp").toFile.getAbsolutePath
    val t = Truncate.Reliable("file:" + base)
    t(Seq(1, 2).toDF("x"))
    val after1 = spark.sparkContext.getCheckpointDir
    t(Seq(3, 4).toDF("x"))
    assert(spark.sparkContext.getCheckpointDir == after1,
      "checkpoint dir re-set between truncations on a scheme'd+space dir")
    val uuidDirs = new java.io.File(base).listFiles().filter(_.isDirectory)
    assert(uuidDirs.length == 1,
      s"expected ONE UUID checkpoint subdir, found ${uuidDirs.length}")
  }

  test("resolve: explicit strategy wins; env-less default is Local") {
    assert(Truncate.resolve(Some(Truncate.Local)) == Truncate.Local)
    val r = Truncate.Reliable("/tmp/x")
    assert(Truncate.resolve(Some(r)) == r)
    // the test JVM does not set GRAFT_CC_CHECKPOINT_DIR
    if (!sys.env.contains("GRAFT_CC_CHECKPOINT_DIR"))
      assert(Truncate.resolve(None) == Truncate.Local)
  }
}
