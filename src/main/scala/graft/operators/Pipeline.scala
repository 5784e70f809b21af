package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus assembly operators — the steps between "cleaned
  * documents" and "batches on accelerators" that every large-scale LLM
  * data pipeline runs after dedup/filtering (builder prompt; SURVEY §4.3):
  * sequence packing to a fixed token budget, deterministic train/val/test
  * splitting, and weighted corpus mixing. Plus TF-IDF term scoring, the
  * classic corpus-statistics operator.
  *
  * Everything is engine-independent integer / md5 arithmetic (the simhash
  * r7 lesson), so every operator here carries a full DuckDB hash-match
  * oracle. Randomness is *hash* randomness: split and mixing decisions are
  * pure functions of the document id, which is what makes them
  * reproducible across runs, machines, and engine versions — a property
  * production pipelines need anyway (re-running the split must not
  * reshuffle documents between train and test).
  */
object Pipeline {

  /** Whitespace token count; `split` on the raw text keeps this exactly
    * the `len(string_split(...))` the oracle computes. */
  private def nToks: Column = size(split(col("text"), " "))

  /** 60-bit positive hash of a string column via md5 — byte-identical in
    * every engine (the shared construction behind simhash/minhash too). */
  private def h60(c: Column): Column = graft.functions.EngineHash.md5Bits60(c)

  // --- sequence packing (concat-and-chunk to a fixed token budget) ----------
  /** Shared with the oracle SQL so non-default call sites can't diverge. */
  val PackBudget: Int = 256

  /** GPT-style sequence packing: per source, documents are concatenated in
    * doc_id order and sliced into fixed `budget`-token sequences; a
    * document whose tokens straddle a boundary contributes to both
    * sequences. Output is the packing manifest — per (source, seq_id) the
    * number of contributing documents and the token fill (== budget for
    * every sequence but each source's last, i.e. zero padding waste by
    * construction).
    *
    * Scale shape: one partitioned running-sum window (the per-source
    * prefix offset) + an explode bounded by each doc's own span — no
    * joins, no driver state. At 100 TB the partition key is
    * (source, shard) with shard = a hash bucket, which keeps each window
    * partition executor-sized while leaving per-shard packing exact; the
    * per-source form here is that plan with one shard. */
  def packSequences(spark: SparkSession, dir: String,
                    budget: Int = PackBudget,
                    tokCol: Column = nToks): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), tokCol.cast("long").as("n_toks"))
      // sequence(hi, lo) would generate a DESCENDING range for a 0-token
      // row (DuckDB's range(hi, lo+1) is empty) — enforce the n_toks >= 1
      // invariant rather than assume it (no-op on today's tokenizer,
      // where split of "" yields [""]). Offsets are unaffected: a
      // 0-token row contributes 0 to every prefix sum.
      .filter(col("n_toks") > 0)
      .withColumn("off", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col("source"), col("off"), col("n_toks"),
        explode(expr(s"sequence(off div $budget, (off + n_toks - 1) div $budget)"))
          .as("seq_id"))
      .select(col("source"), col("seq_id"),
        (least((col("seq_id") + 1) * budget, col("off") + col("n_toks"))
          - greatest(col("seq_id") * budget, col("off"))).as("tok"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("source"), col("seq_id"))
  }

  /** Offset/slice/rollup SQL shared VERBATIM by [[packSequencesSql]] and
    * [[packSequencesBpeSql]]: the twins may differ only in how the `d`
    * CTE counts tokens — the packing math has ONE copy, so an edit
    * cannot drift the twins apart. */
  private val PackOffsetsSqlSuffix: String =
    s"""), o AS (
       |  SELECT source, n_toks,
       |         CAST(COALESCE(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM d
       |), x AS (
       |  SELECT source, s AS seq_id,
       |         least((s + 1) * $PackBudget, off + n_toks)
       |           - greatest(s * $PackBudget, off) AS tok
       |  FROM o, LATERAL unnest(range(off // $PackBudget,
       |                               (off + n_toks - 1) // $PackBudget + 1)) AS t(s)
       |)
       |SELECT source, CAST(seq_id AS BIGINT) AS seq_id, count(*) AS n_docs,
       |       CAST(sum(tok) AS BIGINT) AS n_tokens
       |FROM x GROUP BY 1, 2
       |ORDER BY source, seq_id""".stripMargin

  val packSequencesSql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents
       |""".stripMargin + PackOffsetsSqlSuffix

  /** [[packSequences]] budgeted in SUBWORD tokens ([[graft.functions.Bpe]])
    * — the counter a real context window is measured in (a
    * whitespace-budgeted pack overflows real windows on code/CJK-ish
    * text). Same single-window + bounded-explode plan; only the
    * token-count projection changes. */
  def packSequencesBpe(spark: SparkSession, dir: String,
                       budget: Int = PackBudget): DataFrame =
    packSequences(spark, dir, budget, graft.functions.Bpe.countCol)

  val packSequencesBpeSql: String =
    graft.functions.Bpe.oracleCte +
      """,
       |d AS (
       |  SELECT source, doc_id, CAST(COALESCE(n_bpe, 0) AS BIGINT) AS n_toks
       |  FROM documents LEFT JOIN bpe USING (doc_id)
       |  WHERE COALESCE(n_bpe, 0) > 0
       |""".stripMargin + PackOffsetsSqlSuffix

  // --- packing manifest with document boundaries ----------------------------
  /** [[packSequences]]'s companion at the granularity training actually
    * consumes: one row per (sequence, contributing document) with the
    * document's token span INSIDE the sequence — exactly the offsets a
    * loss-mask / attention-reset builder needs to keep cross-document
    * attention from leaking between packed neighbors. Same single
    * prefix-sum window + bounded explode as the packing itself; spans
    * are pure arithmetic on the running offset ([start_in_seq,
    * end_in_seq) within the budget-sized sequence). (source, seq_id,
    * start_in_seq) is unique by construction — document starts strictly
    * increase within a sequence — so the ordering is total. */
  def packManifest(spark: SparkSession, dir: String,
                   budget: Int = PackBudget): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), nToks.cast("long").as("n_toks"))
      .filter(col("n_toks") > 0) // packSequences' descending-range guard
      .withColumn("off", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col("source"), col("doc_id"), col("off"), col("n_toks"),
        explode(expr(s"sequence(off div $budget, (off + n_toks - 1) div $budget)"))
          .as("seq_id"))
      .select(col("source"), col("seq_id"), col("doc_id"),
        greatest(lit(0L), col("off") - col("seq_id") * budget).as("start_in_seq"),
        least(lit(budget.toLong),
          col("off") + col("n_toks") - col("seq_id") * budget).as("end_in_seq"))
      .orderBy(col("source"), col("seq_id"), col("start_in_seq"), col("doc_id"))
  }

  val packManifestSql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents
       |), o AS (
       |  SELECT source, doc_id, n_toks,
       |         CAST(COALESCE(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM d WHERE n_toks > 0
       |), x AS (
       |  SELECT source, doc_id, off, n_toks, s AS seq_id
       |  FROM o, LATERAL unnest(range(off // $PackBudget,
       |                               (off + n_toks - 1) // $PackBudget + 1)) AS t(s)
       |)
       |SELECT source, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       |       CAST(greatest(0, off - seq_id * $PackBudget) AS BIGINT) AS start_in_seq,
       |       CAST(least($PackBudget, off + n_toks - seq_id * $PackBudget) AS BIGINT) AS end_in_seq
       |FROM x
       |ORDER BY source, seq_id, start_in_seq, doc_id""".stripMargin

  // --- deterministic shard assignment (export layout) -----------------------
  /** Shared with the oracle SQL so non-default call sites can't diverge. */
  val ShardCount: Int = 32

  /** Training-export sharding manifest: every document gets a shard (md5
    * of its id, salted — independent of the split/mix decisions) and a
    * deterministic position within that shard (hash order, doc_id
    * tie-break), i.e. the (file, offset) a sharded dataset writer would
    * give it. Hash-ordering within the shard doubles as a reproducible
    * global shuffle of the corpus — the property training actually wants
    * from "shuffled" shards, with no RNG state to lose.
    *
    * Scale shape: the shard is a pure projection; positions are one
    * row_number window per shard (sort is spillable, and the real writer
    * is `repartition($"shard").sortWithinPartitions($"h", $"doc_id")` —
    * the same exchange this plan performs). Shard count scales with
    * output-file sizing, not cluster size. */
  def shardAssign(spark: SparkSession, dir: String,
                  shards: Int = ShardCount): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        h60(concat(lit("shard:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val shardAssignSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(concat('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |              AS BIGINT) AS h
       |  FROM documents
       |)
       |SELECT doc_id, CAST(h % $ShardCount AS INT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY h % $ShardCount
       |                               ORDER BY h, doc_id) AS INT) AS pos
       |FROM d
       |ORDER BY shard, pos""".stripMargin

  // --- deterministic train/val/test split -----------------------------------
  /** Hash-bucket split manifest: each document lands in train/val/test by
    * the md5 of its OWN id (90/5/5) — stable under corpus growth (adding
    * documents never moves an existing one between splits, unlike any
    * rank- or sample-based split) and embarrassingly parallel (a pure
    * projection; the only shuffle is the reporting groupBy). */
  /** The per-doc split as a pure Column — ONE definition shared by
    * [[splitAssign]] and [[splitLeakage]] so the leakage check can never
    * audit a different split than the one the manifest reports. */
  private[graft] def splitOf(docId: Column): Column = {
    val b = h60(docId.cast("string")) % 100
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("split", splitOf(col("doc_id")))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(nToks.cast("long")).as("n_tokens"))
      .orderBy(col("source"), col("split"))

  val splitAssignSql: String =
    """WITH d AS (
      |  SELECT source,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      |           % 100 AS b,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents
      |)
      |SELECT source,
      |       CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
      |       count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens
      |FROM d GROUP BY 1, 2
      |ORDER BY source, split""".stripMargin

  // --- weighted corpus mixing ------------------------------------------------
  /** Corpus-mixing subsample: each source gets a target keep rate (here a
    * deterministic per-mille weight derived from the source number — a
    * stand-in for the "wiki 3x, web 0.25x"-style mixture table every
    * pretraining run configures), and a document survives iff its id hash
    * falls under the rate. Same hash-randomness properties as the split:
    * reproducible, parallel, and independent per document (no global
    * sort/sample pass over 100 TB). The salt distinguishes this decision
    * from the split's, so mixing never correlates with split membership. */
  def mixWeighted(spark: SparkSession, dir: String): DataFrame = {
    // Naming contract with the DuckDB twin: sources are 'src<N>' — 3-char
    // prefix, then the WHOLE remaining suffix is the number. Take the full
    // tail on both sides (not a fixed 8-char slice) so a long numeric
    // suffix can never desync the engines' w_pm weights.
    val srcNum = substring(col("source"), 4, Int.MaxValue).cast("int")
    val wPm = when(srcNum % 3 === 0, 1000)
      .when(srcNum % 3 === 1, 500).otherwise(250)
    Tables.documents(spark, dir)
      .withColumn("w_pm", wPm)
      .withColumn("kept",
        h60(concat(lit("mix:"), col("doc_id").cast("string"))) % 1000 < col("w_pm"))
      .groupBy(col("source"), col("w_pm"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), nToks.cast("long")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  val mixWeightedSql: String =
    """WITH d AS (
      |  SELECT source,
      |         CASE CAST(substr(source, 4) AS INT) % 3
      |           WHEN 0 THEN 1000 WHEN 1 THEN 500 ELSE 250 END AS w_pm,
      |         CAST(concat('0x', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) % 1000 AS r,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents
      |)
      |SELECT source, w_pm, count(*) AS n_total,
      |       CAST(sum(CASE WHEN r < w_pm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN r < w_pm THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM d GROUP BY 1, 2
      |ORDER BY source""".stripMargin

  // --- train/test split leakage audit ----------------------------------------
  /** Near-duplicate pairs that STRADDLE a split boundary — the
    * train/test contamination a hash split cannot prevent (the split is
    * per-document, but near-duplicates are different documents with
    * different hashes, so a pair can land on both sides and leak test
    * content into training). Composes the MinHash-LSH candidate pipeline
    * with the split assignment: the split is a pure function of doc_id
    * ([[splitOf]]), so attaching it to each pair side is a projection —
    * no join against a split table at any scale. Output is the
    * cross-split subset of the verified near-dup pairs, worst first —
    * at 100 TB this IS the decontamination worklist (drop or re-split
    * every row). */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(spark, dir)
      .withColumn("split_1", splitOf(col("d1")))
      .withColumn("split_2", splitOf(col("d2")))
      .filter(col("split_1") =!= col("split_2"))
      .select(col("d1"), col("d2"), col("jaccard"), col("split_1"), col("split_2"))
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))

  val splitLeakageSql: String = {
    val splitCase = (c: String) =>
      s"""CASE WHEN CAST(concat('0x', substr(md5(CAST($c AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'train'
         |     WHEN CAST(concat('0x', substr(md5(CAST($c AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95 THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH pairs AS (
       |${Dedup.minhashLshSql.linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT d1, d2, jaccard,
       |       ${splitCase("d1")} AS split_1,
       |       ${splitCase("d2")} AS split_2
       |FROM pairs
       |WHERE ${splitCase("d1")} <> ${splitCase("d2")}
       |ORDER BY jaccard DESC, d1, d2""".stripMargin
  }

  // --- budget-constrained corpus selection -----------------------------------
  /** Shared with the oracle SQL so non-default call sites can't diverge. */
  val BudgetFraction: Double = 0.5
  val QualityBuckets: Int = 1000

  /** "Best documents under a token budget" — keep the highest-quality
    * docs whose combined tokens fit `BudgetFraction` of the corpus. The
    * naive form is a global quality sort + running token sum + take-while:
    * a single-partition window over every document, the one shape this
    * repo bans. At scale you select by THRESHOLD instead: quantize
    * quality to integer buckets (txt_quality's score × 1000, floor), sum
    * tokens per bucket (a ~[[QualityBuckets]]-row aggregate), run the
    * take-while over BUCKETS from the top down (single-partition window
    * over the bucket table — aggregate-sized bytes, the sanctioned
    * approx_topk_check shape), and the resulting cutoff bucket broadcasts
    * back over the docs as a one-row scalar. Selection is
    * bucket-granular: the budget may be undershot by at most one
    * bucket's tokens — the documented trade for never sorting the
    * corpus — and when even the TOP bucket alone exceeds the budget the
    * selector keeps that one bucket (greedy floor) rather than
    * returning an empty corpus.
    * Every quantity is integer/exact-double arithmetic with identical
    * expression shape in the oracle, so the cutoff — and therefore the
    * selected set — is engine- and partitioning-independent. */
  def corpusBudgetSelect(spark: SparkSession, dir: String): DataFrame =
    corpusBudgetSelectFrom(Tables.documents(spark, dir))

  /** Corpus-parameterized body (the minhashLshFrom pattern) so the spec
    * can drive the degenerate single-bucket case through the REAL
    * pipeline. */
  private[graft] def corpusBudgetSelectFrom(documents: DataFrame,
                                            tokCol: Column = nToks): DataFrame = {
    val docs = documents
      .select(col("doc_id"),
        floor(graft.functions.TextAnalytics.qualityCol * QualityBuckets)
          .cast("int").as("quality_bucket"),
        tokCol.cast("int").as("n_tokens"))
    val buckets = docs.groupBy(col("quality_bucket"))
      .agg(sum(col("n_tokens").cast("long")).as("btok"))
    val wcum = Window.orderBy(col("quality_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the budget comes from the bucket aggregate, not a second scan of
    // documents: sum of per-bucket longs == sum of per-doc ints exactly
    val budget = buckets
      .agg(floor(lit(BudgetFraction) * sum(col("btok"))).cast("long").as("budget"))
    // greedy floor: if even the TOP bucket exceeds the budget, select it
    // anyway (a budget selector that returns nothing is useless; the
    // overshoot case is as bucket-granular as the undershoot case)
    val cutoff = buckets.withColumn("cum", sum(col("btok")).over(wcum))
      .crossJoin(broadcast(budget))
      .agg(coalesce(
        min(when(col("cum") <= col("budget"), col("quality_bucket"))),
        max(col("quality_bucket"))).as("qb_cut"))
    docs.crossJoin(broadcast(cutoff))
      .filter(col("quality_bucket") >= col("qb_cut"))
      .select(col("doc_id"), col("quality_bucket"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The `d` CTE body shared by both budget-select oracles: quality
    * bucketing is identical, only the token-count expression (and the
    * optional bpe join) differ — ONE copy of the formula, so the twins
    * cannot drift. */
  private def budgetSelectDSql(nTokensExpr: String, joinClause: String): String =
    s"""  SELECT doc_id,
       |         CAST(floor(((stop / n) * 0.5
       |              + ((CAST(length(text) AS DOUBLE) - (n - 1.0)) / n) * 0.1)
       |              * $QualityBuckets) AS INT) AS quality_bucket,
       |         $nTokensExpr AS n_tokens
       |  FROM (
       |    SELECT doc_id, text,
       |           CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
       |           CAST(len(list_filter(string_split(text, ' '),
       |                 t -> t IN ('the','and','of','to','a','in','is'))) AS DOUBLE) AS stop
       |    FROM documents
       |  )$joinClause
       |""".stripMargin

  /** Bucket/cutoff/selection SQL shared VERBATIM by both budget-select
    * oracles (same single-copy discipline as [[PackOffsetsSqlSuffix]]). */
  private val BudgetCutoffSqlSuffix: String =
    s"""), buckets AS (
       |  SELECT quality_bucket, CAST(sum(n_tokens) AS BIGINT) AS btok
       |  FROM d GROUP BY 1
       |), cum AS (
       |  SELECT quality_bucket,
       |         sum(btok) OVER (ORDER BY quality_bucket DESC
       |                         ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM buckets
       |), tot AS (
       |  SELECT CAST(floor($BudgetFraction * sum(btok)) AS BIGINT) AS budget FROM buckets
       |), cut AS (
       |  SELECT coalesce(min(CASE WHEN cum <= budget THEN quality_bucket END),
       |                  max(quality_bucket)) AS qb_cut
       |  FROM cum, tot
       |)
       |SELECT doc_id, quality_bucket, n_tokens
       |FROM d, cut
       |WHERE quality_bucket >= qb_cut
       |ORDER BY doc_id""".stripMargin

  val corpusBudgetSelectSql: String =
    "WITH d AS (\n" +
      budgetSelectDSql("CAST(len(string_split(text, ' ')) AS INT)", "") +
      BudgetCutoffSqlSuffix

  /** [[corpusBudgetSelect]] budgeted in SUBWORD tokens — the bucket
    * cutoff machinery is untouched (1000 integer quality buckets +
    * broadcast cutoff scalar, never a global sort); only the per-doc
    * token weight switches to [[graft.functions.Bpe]]. */
  def corpusBudgetSelectBpe(spark: SparkSession, dir: String): DataFrame =
    corpusBudgetSelectFrom(Tables.documents(spark, dir), graft.functions.Bpe.countCol)

  val corpusBudgetSelectBpeSql: String =
    graft.functions.Bpe.oracleCte + ",\nd AS (\n" +
      budgetSelectDSql("CAST(COALESCE(n_bpe, 0) AS INT)",
        " LEFT JOIN bpe USING (doc_id)") +
      BudgetCutoffSqlSuffix

  // --- TF-IDF top terms -------------------------------------------------------
  /** Shared with the oracle SQL so non-default call sites can't diverge. */
  val TfidfSource: String = "src1"
  val TfidfTopK: Int = 3

  /** Top-k TF-IDF terms per document (reported for one source; document
    * frequency is CORPUS-wide). tf and df are exact integers; the one
    * transcendental, ln(N/df), is quantized to DECIMAL(18,4) before both
    * the ranking and the output so the two engines' last-ulp ln
    * differences can never reorder rows or fail the hash gate.
    *
    * Scale shape: the df table is vocabulary-sized (tiny next to the
    * corpus) so Catalyst broadcasts it into the tf scan; N arrives as a
    * broadcast one-row cross join, not a driver-side collect. One shuffle
    * for the (doc, term) tf aggregation, one partitioned top-k window. */
  def tfidfTerms(spark: SparkSession, dir: String,
                 source: String = TfidfSource, topK: Int = TfidfTopK): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("tok"))
    val df = toks.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_corpus"))
    val tf = toks.filter(col("source") === source)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val scored = tf.join(broadcast(df), "tok").crossJoin(broadcast(n))
      .withColumn("score", expr(
        "cast(cast(tf * ln(cast(n_corpus as double) / cast(df as double)) as decimal(18,4)) as double)"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("score").desc, col("tok"))
  }

  val tfidfTermsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents
       |), dfreq AS (
       |  SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks)
       |  GROUP BY tok
       |), n AS (
       |  SELECT count(*) AS n_corpus FROM documents
       |), tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM toks
       |  WHERE source = '$TfidfSource' GROUP BY 1, 2
       |), scored AS (
       |  SELECT doc_id, tok, tf, df,
       |         CAST(CAST(tf * ln(CAST(n_corpus AS DOUBLE) / CAST(df AS DOUBLE))
       |              AS DECIMAL(18,4)) AS DOUBLE) AS score
       |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n
       |)
       |SELECT doc_id, tok, tf, df, score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY score DESC, tok) AS rk
       |  FROM scored
       |) WHERE rk <= $TfidfTopK
       |ORDER BY doc_id, score DESC, tok""".stripMargin
}
