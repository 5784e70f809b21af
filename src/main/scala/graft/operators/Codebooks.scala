package graft.operators

import java.io.File
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once materialization of the ANN codebooks — the maintenance
  * pass that closes the "at production you train once" caveat on the
  * trained-ANN family: [[Similarity.pqTrainedCodebook]] is a pure
  * function of the corpus, so its output is a TABLE, not a per-query
  * computation. `fit` trains both quantizers (the 4×16 PQ codebook and
  * the full-vector IVF coarse quantizer) and writes each as a parquet
  * codebook table; `pq`/`ivf` return the materialized table, training
  * it first only if absent — so in any one session (a Verify pass, a
  * Bench run, a production cluster between refreshes) the Lloyd cost is
  * paid once, no matter how many of `ann_pq_trained` /
  * `ann_ivf_trained` / `ann_recall` run.
  *
  * The table lives OUTSIDE the corpus directory (the fixture dirs are
  * read-only here; in production the codebook table would sit beside
  * the corpus in the warehouse) under a key that includes a fingerprint
  * of `embeddings.parquet` (length + mtime): a refreshed corpus can
  * never silently serve a stale codebook — the key changes and the
  * next access retrains. Doubles round-trip parquet bit-exactly, so
  * the materialized table is value-identical to a fresh trainer run
  * (spec-pinned), and the DuckDB oracles keep their UNROLLED trainer
  * replay — the twin stays an independent re-derivation of the
  * training, not a read of our own artifact.
  *
  * Scale shape: codebooks are k×subspaces×width doubles (kilobytes) —
  * coalesce(1) parquet, broadcast on read, exactly as before. */
object Codebooks {

  /** Training passes actually executed (per family) — spec
    * instrumentation for the train-once contract. */
  private[graft] val fitCount = new AtomicInteger(0)

  private def fingerprint(dir: String): String = {
    val f = new File(dir, "embeddings.parquet")
    java.lang.Long.toHexString(f.length * 31L + f.lastModified)
  }

  private def cacheRoot(dir: String): File = {
    val slug = new File(dir).getAbsolutePath
      .replaceAll("[^A-Za-z0-9._-]", "_")
    new File(new File(sys.props("java.io.tmpdir"), "graft_codebooks"),
      s"$slug-${fingerprint(dir)}")
  }

  /** Drop the materialized codebooks for `dir` (spec/maintenance hook —
    * production would call this as part of a corpus refresh). */
  private[graft] def invalidate(dir: String): Unit = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(cacheRoot(dir))
  }

  private def done(dest: File): Boolean = new File(dest, "_SUCCESS").exists()

  /** Materialize-if-absent, atomically: train into a temp dir, rename
    * into place. A concurrent loser of the rename race discards its
    * copy and reads the winner's — both trained the same pure function
    * of the corpus, so either copy is correct. */
  private def ensure(dest: File)(train: => DataFrame): Unit =
    if (!done(dest)) synchronized {
      if (!done(dest)) {
        fitCount.incrementAndGet()
        dest.getParentFile.mkdirs()
        val tmp = new File(dest.getParentFile,
          s".${dest.getName}-tmp-${java.util.UUID.randomUUID()}")
        train.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        if (!tmp.renameTo(dest)) {
          val ok = done(dest) // another JVM won the race
          def rm(f: File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(tmp)
          if (!ok) sys.error(s"codebook materialization failed: $dest")
        }
      }
    }

  /** The trained PQ codebook table (c_label, s, cl) — 4 subspaces ×
    * 16 dims × [[Similarity.PqTrainCodes]] centroids. */
  def pq(spark: SparkSession, dir: String): DataFrame = {
    val dest = new File(cacheRoot(dir), "pq")
    ensure(dest)(Similarity.pqTrainedCodebook(spark, dir))
    spark.read.parquet(dest.getAbsolutePath)
  }

  /** The trained IVF coarse quantizer table — the same trainer
    * degenerated to ONE whole-vector subspace,
    * [[Similarity.IvfTrainClusters]] centroids. */
  def ivf(spark: SparkSession, dir: String): DataFrame = {
    val dest = new File(cacheRoot(dir), "ivf")
    ensure(dest)(Similarity.pqTrainedCodebook(spark, dir,
      subspaces = 1, width = 64, k = Similarity.IvfTrainClusters))
    spark.read.parquet(dest.getAbsolutePath)
  }

  /** The maintenance pass: train and materialize both codebook tables.
    * Idempotent; a no-op when both tables are already current. */
  def fit(spark: SparkSession, dir: String): Unit = {
    pq(spark, dir); ivf(spark, dir); ()
  }
}
