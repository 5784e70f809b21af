package graft

import graft.operators.Pipeline
import graft.sources.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-7 corpus-assembly + layout operators: invariants the oracle's
  * hash-match can't express — packing fill guarantees, split totality,
  * mixing rates, and the z-order locality bound that makes the layout
  * worth its sort. */
class PipelineLayoutSpec extends SparkSpec {

  test("corpus_budget_select: budget respected on the fixture, greedy floor on a one-bucket corpus") {
    import spark.implicits._
    // fixture: selected tokens fit the budget, and adding the next bucket
    // down would overshoot (maximality of the bucket-granular selection)
    val docs = graft.Tables.documents(spark, sf)
    val sel = Pipeline.corpusBudgetSelect(spark, sf).collect()
    assert(sel.nonEmpty)
    val allTok = docs.select(expr("CAST(sum(size(split(text, ' '))) AS LONG)"))
      .as[Long].head()
    val budget = math.floor(Pipeline.BudgetFraction * allTok).toLong
    val selTok = sel.map(_.getInt(2).toLong).sum
    assert(selTok <= budget, s"selection $selTok exceeds budget $budget")
    // degenerate corpus: every doc identical → ONE quality bucket whose
    // tokens exceed any 50% budget; the greedy floor must keep it, not
    // return an empty corpus
    val flat = (1L to 20L).map(i => (i, "alpha beta gamma delta")).toDF("doc_id", "text")
    val kept = Pipeline.corpusBudgetSelectFrom(flat).collect()
    assert(kept.length == 20, s"greedy floor lost the top bucket: ${kept.length}")
  }

  test("pack_sequences fills every non-final sequence to exactly the budget") {
    val packed = Pipeline.packSequences(spark, sf).collect()
    val bySource = packed.groupBy(_.getString(0))
    bySource.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // seq ids are contiguous from 0 (concat-and-chunk leaves no holes)
      assert(sorted.map(_.getLong(1)).toSeq == sorted.indices.map(_.toLong),
        s"$src: seq_id gap")
      sorted.dropRight(1).foreach { r =>
        assert(r.getLong(3) == Pipeline.PackBudget,
          s"$src seq ${r.getLong(1)}: ${r.getLong(3)} tokens in a non-final sequence")
      }
      assert(sorted.last.getLong(3) <= Pipeline.PackBudget)
    }
    // packing conserves tokens: manifest total == corpus total
    val corpusToks = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).first.getLong(0)
    assert(packed.map(_.getLong(3)).sum == corpusToks)
  }

  test("pack_manifest spans tile each sequence exactly (consistency with pack_sequences)") {
    import org.apache.spark.sql.functions._
    val manifest = graft.operators.Pipeline.packManifest(spark, sf)
    // spans are non-empty, inside the budget, and doc starts strictly
    // increase within a sequence (gap- and overlap-free tiling)
    val rows = manifest.collect()
    rows.foreach { r =>
      val (s0, e0) = (r.getLong(3), r.getLong(4))
      assert(s0 >= 0 && e0 > s0 && e0 <= graft.operators.Pipeline.PackBudget, r.toString)
    }
    // per (source, seq_id): span lengths sum to pack_sequences' n_tokens
    // and the row count equals its n_docs — the two views must agree
    val fromManifest = manifest.groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs_m"),
        sum(col("end_in_seq") - col("start_in_seq")).as("n_tokens_m"))
    val packed = graft.operators.Pipeline.packSequences(spark, sf)
    val mismatches = packed.join(fromManifest, Seq("source", "seq_id"), "full_outer")
      .filter(col("n_docs").isNull || col("n_docs_m").isNull ||
        col("n_docs") =!= col("n_docs_m") || col("n_tokens") =!= col("n_tokens_m"))
      .count()
    assert(mismatches == 0, "manifest and packing manifest disagree")
  }

  test("split_assign partitions the corpus and is stable across runs") {
    val a = Pipeline.splitAssign(spark, sf).collect()
    val b = Pipeline.splitAssign(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "split must be deterministic")
    val nDocs = Tables.documents(spark, sf).count()
    assert(a.map(_.getLong(2)).sum == nDocs, "splits must partition the corpus")
    val bySplit = a.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    // 90/5/5 hash split: train strictly dominates on any non-tiny corpus
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("mix_weighted keeps at the configured per-mille rate") {
    Pipeline.mixWeighted(spark, sf).collect().foreach { r =>
      val (src, wPm, total, kept) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))
      val srcNum = src.stripPrefix("src").toInt
      assert(wPm == Seq(1000, 500, 250)(srcNum % 3), s"$src: wrong weight")
      assert(kept <= total)
      if (wPm == 1000) assert(kept == total, s"$src: weight 1000 must keep all")
      // hash-uniformity: keep rate within ±20pp of target on 25-doc sources
      else assert(math.abs(kept.toDouble / total - wPm / 1000.0) < 0.2,
        s"$src: kept $kept/$total vs target ${wPm / 1000.0}")
    }
  }

  test("tfidf_terms returns at most k terms per doc, ranked by score") {
    val rows = Pipeline.tfidfTerms(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      assert(rs.length <= Pipeline.TfidfTopK, s"doc $doc: ${rs.length} terms")
      val scores = rs.map(_.getDouble(4)).toSeq
      assert(scores == scores.sorted.reverse, s"doc $doc: not score-ordered")
    }
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(3) >= 1))
  }

  test("z-order buckets bound both dimensions (the zonemap-pruning guarantee)") {
    val side = 1L << (Layout.ZBucketShift / 2) // 128: bucket rectangle side
    val rows = Layout.zorderLayout(spark, sf).collect()
    assert(rows.length > 10, "fixture should populate many buckets")
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < side,
        s"bucket ${r.getLong(0)}: xk range ${r.getLong(2)}..${r.getLong(3)}")
      assert(r.getLong(5) - r.getLong(4) < side,
        s"bucket ${r.getLong(0)}: yk range ${r.getLong(4)}..${r.getLong(5)}")
    }
  }

  test("compact merges a fragmented table without changing its content") {
    val dir = Files.createTempDirectory("cmp").toString + "/docs"
    val docs = Tables.documents(spark, sf)
    docs.repartition(64).write.parquet(dir) // simulate micro-batch fragmentation
    // bit_xor: order-independent row checksum with no ANSI overflow hazard
    val checksumBefore = spark.read.parquet(dir)
      .agg(expr("bit_xor(xxhash64(doc_id, text, source))")).first.getLong(0)
    val (before, after) = Layout.compact(spark, dir, targetRowsPerFile = 200)
    assert(before == 64, s"fixture should start fragmented, had $before files")
    val expectFiles = math.ceil(docs.count() / 200.0).toInt
    assert(after == expectFiles, s"expected $expectFiles files, got $after")
    val checksumAfter = spark.read.parquet(dir)
      .agg(expr("bit_xor(xxhash64(doc_id, text, source))")).first.getLong(0)
    assert(checksumAfter == checksumBefore, "compaction must preserve content")
  }

  test("compact refuses to run over a stale backup from an interrupted swap") {
    val base = Files.createTempDirectory("cmp2").toString
    val dir = s"$base/docs"
    Tables.documents(spark, sf).limit(10).write.parquet(dir)
    Files.createDirectory(java.nio.file.Paths.get(s"$base/docs_precompact"))
    val e = intercept[IllegalStateException] {
      Layout.compact(spark, dir, targetRowsPerFile = 5)
    }
    assert(e.getMessage.contains("interrupted compaction"))
    // and the live table is untouched
    assert(spark.read.parquet(dir).count() === 10)
  }

  test("kmeansFit on an empty corpus returns an empty assignment") {
    val emptyDir = Files.createTempDirectory("kmempty").toString
    Tables.embeddings(spark, sf).limit(0)
      .write.parquet(s"$emptyDir/embeddings.parquet")
    assert(graft.operators.Similarity.kmeansFit(spark, emptyDir, k = 4).count() === 0)
  }

  test("kmeansFit converges deterministically and never assigns farther than init") {
    import graft.operators.Similarity
    val a = Similarity.kmeansFit(spark, sf, k = 4, maxIters = 20).collect()
    val b = Similarity.kmeansFit(spark, sf, k = 4, maxIters = 20).collect()
    assert(a.toSeq == b.toSeq, "fit must be deterministic run-to-run")
    val n = Tables.embeddings(spark, sf).count()
    assert(a.length == n, "every vector gets exactly one cluster")
    assert(a.map(_.getInt(1)).distinct.length > 1, "fixture should use >1 cluster")
    // Lloyd guarantee (quantized means -> tiny epsilon): total inertia of
    // the converged fit is no worse than one E-step against the raw init
    val initInertia = {
      val init = Tables.embeddings(spark, sf).filter(col("vec_id") < 4)
        .select(col("vec_id").as("c_label"),
          expr("transform(embedding, x -> round(cast(x as double), 6))").as("cl"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy("d", "c_label")
      Tables.embeddings(spark, sf).crossJoin(broadcast(init))
        .withColumn("d", org.apache.spark.sql.graft.VectorFunctions
          .vec_sqdist(col("embedding"), col("cl")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .agg(sum(col("d"))).first.getDouble(0)
    }
    val finalInertia = a.map(_.getDouble(2)).sum
    assert(finalInertia <= initInertia * (1 + 1e-9),
      s"inertia worsened: $initInertia -> $finalInertia")
  }

  test("zorderWrite produces files owning disjoint z-ranges") {
    val out = Files.createTempDirectory("zw").toString + "/orders_z"
    val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
      .cast("long")
    Layout.zorderWrite(Tables.orders(spark, sf), col("o_custkey"), day, out, 4)
    val back = spark.read.parquet(out)
    val dayB = datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
      .cast("long")
    val ranges = back
      .withColumn("z", Layout.zvalue16(col("o_custkey").bitwiseAND(lit(65535L)),
        dayB.bitwiseAND(lit(65535L))))
      .groupBy(input_file_name().as("f"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4, s"expected 4 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file z-ranges overlap: $ranges")
      case _ =>
    }
  }
}
