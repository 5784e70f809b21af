package graft.operators

import graft.Tables
import graft.functions.TextAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval (VERDICT r11 next-round #8): reciprocal-rank fusion
  * of the lexical arm (BM25, [[TextAnalytics.bm25TopK]]'s scorer) and the
  * vector arm (brute-force cosine, [[Similarity.annBruteForce]]'s scorer)
  * over the shared document id space — the standard two-tower retrieval
  * composition (Cormack et al. 2009's RRF: score = Σ 1/(60+rank)), used
  * here to surface the training documents most relevant to a probe both
  * by its terms and by its embedding.
  *
  * No reference analog (the reference has no retrieval surface at all);
  * this completes the builder prompt's similarity-search family by
  * composing its two registered halves.
  *
  * Determinism: RRF is computed in EXACT integer arithmetic —
  * `1e12 DIV (60 + rank)` per arm (floor division on positive longs in
  * both engines) — so the fused score is a pure function of the two rank
  * lists, with none of the float-summation ordering hazards the BM25
  * DECIMAL quantization exists to kill. Rank ties inside each arm break
  * on doc id (the arms' own pinned contracts).
  *
  * Scale shape: each arm keeps its own audited plan (BM25's only
  * corpus-scale shuffle carries query-matching token rows; the cosine arm
  * streams the corpus against broadcast queries). Everything downstream
  * of the arms — the rank window, the full-outer fusion join, the final
  * top-k — runs over ≤ [[ArmK]] rows PER ARM BY CONSTRUCTION, so the
  * fusion stage is constant-sized no matter the corpus.
  */
object Hybrid {

  /** Candidates retained per arm before fusion (wider than the fused k so
    * an id strong in one arm and absent from the other can still win). */
  val ArmK: Int = 50
  /** Fused result size. */
  val FusedK: Int = 20
  /** The RRF dampener (k = 60, the published constant). */
  val RrfK: Int = 60
  /** Integer RRF scale: contribution = RrfScale DIV (RrfK + rank). */
  val RrfScale: Long = 1000000000000L

  /** Per-arm RRF contribution as a SQL fragment — `DIV`/`//` spellings
    * differ by engine, but both are exact floor division on positive
    * longs, so the two cannot drift. */
  private def rrfSpark(rankCol: String) =
    expr(s"coalesce($RrfScale DIV ($RrfK + $rankCol), CAST(0 AS BIGINT))")
  private def rrfDuck(rankCol: String) =
    s"COALESCE($RrfScale // ($RrfK + $rankCol), 0)"

  /** Top-[[FusedK]] documents by reciprocal-rank fusion of the BM25 arm
    * (query = [[TextAnalytics.Bm25Query]]) and the cosine arm (query =
    * embedding 0, the annBruteForce q_id-0 ranking), both truncated to
    * [[ArmK]] candidates. Output: doc_id, the two arm ranks (null where
    * an arm did not surface the doc), and the exact integer RRF score. */
  def hybridTopK(spark: SparkSession, dir: String): DataFrame = {
    // lexical arm: BM25 top-ArmK, ranked 1.. by (score desc, doc_id).
    // The global rank window runs over ≤ ArmK rows by construction —
    // candidates, not corpus (sanctioned in PlanGuardSpec).
    val lex = TextAnalytics
      .bm25From(Tables.documents(spark, dir), TextAnalytics.Bm25Query, ArmK)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("int"))
      .select(col("doc_id").as("id"), col("lex_rank"))
    // vector arm: the registered brute-force scorer at k = ArmK,
    // restricted to probe 0 INSIDE the broadcast query relation (ADVICE
    // r12: the old post-window q_id filter scored all 5 probes and
    // discarded 4/5 of the work)
    val vec = Similarity.annBruteForceProbes(spark, dir, ArmK, Some(Seq(0)))
      .select(col("vec_id").as("id"), col("rank").as("vec_rank"))
    lex.join(vec, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"), col("lex_rank"), col("vec_rank"),
        (rrfSpark("lex_rank") + rrfSpark("vec_rank")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(FusedK)
  }

  /** The two component twins nested verbatim as CTEs at k = [[ArmK]]
    * (the annRecall pattern), fused by the same integer RRF. */
  val hybridTopKSql: String =
    s"""WITH lexraw AS (${TextAnalytics.bm25Sql(ArmK)}
       |), lex AS (
       |  SELECT doc_id AS id,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
       |  FROM lexraw
       |), vecraw AS (${Similarity.annBruteForceSqlK(ArmK, Some(Seq(0)))}
       |), vec AS (
       |  SELECT vec_id AS id, CAST(rank AS INT) AS vec_rank
       |  FROM vecraw
       |)
       |SELECT COALESCE(lex.id, vec.id) AS doc_id, lex_rank, vec_rank,
       |       CAST(${rrfDuck("lex_rank")} + ${rrfDuck("vec_rank")} AS BIGINT) AS rrf_score
       |FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
       |ORDER BY rrf_score DESC, doc_id
       |LIMIT $FusedK""".stripMargin

  /** The GENERALIZED form (VERDICT r12 ask #8): per-query RRF fusion over
    * the FULL probe set — all 5 embedding probes on the vector arm, the
    * matching [[TextAnalytics.Bm25Probes]] term lists on the lexical arm
    * (probe 0 ≡ the single-probe query, so [[hybridTopK]] is exactly this
    * operator's q_id-0 slice). Both arms run their corpus work ONCE for
    * all probes (one exploded-token join / one broadcast-probe scan);
    * fusion joins on (q_id, id) and ranks per probe.
    *
    * Scale shape: the lexical arm's per-probe top-k is two-stage salted
    * (see [[TextAnalytics.bm25MultiFrom]]) so the probe-count (tiny)
    * never bounds window parallelism; everything past the arms — the
    * fusion join and the final per-probe rank — runs over ≤ 2·[[ArmK]]
    * rows per probe by construction. */
  def hybridTopKMulti(spark: SparkSession, dir: String): DataFrame = {
    val lex = TextAnalytics
      .bm25MultiFrom(Tables.documents(spark, dir), TextAnalytics.Bm25Probes, ArmK)
      .select(col("q_id"), col("doc_id").as("id"), col("rank").as("lex_rank"))
    val vec = Similarity.annBruteForce(spark, dir, ArmK)
      .select(col("q_id"), col("vec_id").as("id"), col("rank").as("vec_rank"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("rrf_score").desc, col("doc_id"))
    lex.join(vec, Seq("q_id", "id"), "full_outer")
      .select(col("q_id"), col("id").as("doc_id"), col("lex_rank"), col("vec_rank"),
        (rrfSpark("lex_rank") + rrfSpark("vec_rank")).as("rrf_score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= FusedK)
      .drop("rk")
      .orderBy(col("q_id"), col("rrf_score").desc, col("doc_id"))
  }

  /** DuckDB twin of [[hybridTopKMulti]]: both multi-probe component twins
    * nested as CTEs, fused by the same integer RRF, per-probe rank. */
  val hybridTopKMultiSql: String =
    s"""WITH lexmulti AS (${TextAnalytics.bm25MultiSql(ArmK)}
       |), lex AS (
       |  SELECT q_id, doc_id AS id, rank AS lex_rank FROM lexmulti
       |), vecraw AS (${Similarity.annBruteForceSqlK(ArmK)}
       |), vec AS (
       |  SELECT q_id, vec_id AS id, CAST(rank AS INT) AS vec_rank FROM vecraw
       |), fused AS (
       |  SELECT COALESCE(lex.q_id, vec.q_id) AS q_id,
       |         COALESCE(lex.id, vec.id) AS doc_id,
       |         lex_rank, vec_rank,
       |         CAST(${rrfDuck("lex_rank")} + ${rrfDuck("vec_rank")} AS BIGINT) AS rrf_score
       |  FROM lex FULL OUTER JOIN vec ON lex.q_id = vec.q_id AND lex.id = vec.id
       |)
       |SELECT q_id, doc_id, lex_rank, vec_rank, rrf_score FROM (
       |  SELECT q_id, doc_id, lex_rank, vec_rank, rrf_score,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY rrf_score DESC, doc_id) AS rk
       |  FROM fused
       |) WHERE rk <= $FusedK
       |ORDER BY q_id, rrf_score DESC, doc_id""".stripMargin
}
