package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The LLM-data-pipeline query inventory (SURVEY.md §7.1): dedup,
  * similarity search and text analysis over the `documents` /
  * `embeddings` fixtures, wrapping the reusable operators in [[Dedup]],
  * [[Similarity]] and [[TextAnalysis]] into the driver contract.
  *
  * Determinism: every query has a total ORDER BY; floating scores are
  * rounded through the same `round(x*10^k)/10^k` IEEE pipeline the
  * relational inventory uses, so the DuckDB oracles hash-match exactly.
  */
object LlmQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  // ---------------------------------------------------------------- q27
  /** Exact dedup over documents: one row per distinct normalized
    * content. At 100 TB the shuffle key is the 64-char sha256, never the
    * document body, and map-side partial aggregation collapses
    * duplicates before the exchange. */
  def q27_dedup_exact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(spark, dir), "doc_id", "text")
      .orderBy(col("content_hash"))

  // ---------------------------------------------------------------- q28
  /** Near-duplicate pairs by exact word-trigram Jaccard ≥ 0.8 via the
    * inverted-index shingle join (never all-pairs). */
  def q28_dedup_jaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(spark, dir), "doc_id", "text", n = 3, tau = 0.8)
      .orderBy(col("d1"), col("d2"))

  // ---------------------------------------------------------------- q29
  /** The same pairs through MinHash-LSH banding (16 bands × 2 rows) with
    * exact-Jaccard verification of candidates — the O(n·near-dups) scale
    * path. Verified output is a subset of q28's with per-true-pair miss
    * probability (1-s²)^16 ≤ 3e-12 at the fixtures' s ≥ 0.9, so the same
    * SQL oracle gates both. */
  def q29_dedup_minhash_lsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(docs(spark, dir), "doc_id", "text",
      n = 3, tau = 0.8, bands = 16, rowsPerBand = 2)
      .orderBy(col("d1"), col("d2"))

  // ---------------------------------------------------------------- q30
  /** SimHash near-dup pairs (hamming ≤ 3) via the 4×16-bit block
    * pigeonhole join. Fingerprints depend on Spark's xxhash64, which
    * DuckDB cannot reproduce — rows-only gated here; the recall property
    * vs q28 is asserted in DedupSpec. */
  def q30_dedup_simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(spark, dir), "doc_id", "text", maxHamming = 3)
      .orderBy(col("d1"), col("d2"))

  // ---------------------------------------------------------------- q31
  /** Brute-force cosine top-5 neighbors for the first 10 vectors — the
    * ANN exactness baseline: one corpus pass, query side broadcast by
    * construction (fixed probe count, not SF-scaled). */
  def q31_ann_cosine_topk(spark: SparkSession, dir: String): DataFrame = {
    val norm = Similarity.normalized(Tables(spark, dir, "embeddings"), "vec_id", "embedding")
    Similarity.cosineTopK(norm, norm.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q32
  /** The LSH-bucketed scale path for the same probes: candidates from
    * 8×4-bit sign-random-projection collisions, exact re-rank of
    * candidates only. Approximate ⇒ rows-only gated; recall vs q31 is
    * asserted in SimilaritySpec. */
  def q32_ann_lsh_topk(spark: SparkSession, dir: String): DataFrame = {
    val norm = Similarity.normalized(Tables(spark, dir, "embeddings"), "vec_id", "embedding")
    Similarity.lshCosineTopK(norm, norm.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("q_id"), col("rank"))
  }

  // ------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_dedup_exact" -> (q27_dedup_exact _),
    "q28_dedup_jaccard" -> (q28_dedup_jaccard _),
    "q29_dedup_minhash_lsh" -> (q29_dedup_minhash_lsh _),
    "q30_dedup_simhash" -> (q30_dedup_simhash _),
    "q31_ann_cosine_topk" -> (q31_ann_cosine_topk _),
    "q32_ann_lsh_topk" -> (q32_ann_lsh_topk _),
  )

  /** DuckDB mirrors. The normalization/shingling pipeline is re-expressed
    * verbatim (lower → collapse whitespace → trim → split → trigrams). */
  val oracles: Map[String, String] = {
    // Shared shingle CTE text (word trigrams of normalized text; docs
    // shorter than 3 tokens contribute no shingles, matching
    // TextOps.shingles' empty-array guard).
    val shingleCtes =
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        |  FROM documents),
        | sh0 AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 3
        |      THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
        |                          for i in range(1, len(t) - 1)])
        |      ELSE [] END AS shl
        |  FROM toks),
        | sh AS (SELECT doc_id, unnest(shl) AS s FROM sh0),
        | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        | common AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)""".stripMargin
    val jaccardSelect =
      """ SELECT d1, d2, round(jac * 10000) / 10000 AS jaccard FROM (
        |  SELECT d1, d2, CAST(c AS DOUBLE) / (s1.n_sh + s2.n_sh - c) AS jac
        |  FROM common JOIN sizes s1 ON d1 = s1.doc_id
        |              JOIN sizes s2 ON d2 = s2.doc_id)
        | WHERE jac >= 0.8 ORDER BY d1, d2""".stripMargin
    Map(
      "q27_dedup_exact" ->
        """SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
          |  min(doc_id) AS keep_id, count(*) AS n_copies
          | FROM documents GROUP BY content_hash ORDER BY content_hash""".stripMargin,
      "q28_dedup_jaccard" -> (shingleCtes + "\n" + jaccardSelect),
      "q29_dedup_minhash_lsh" -> (shingleCtes + "\n" + jaccardSelect),
      // Same left-to-right double summation as Similarity.dot — the two
      // engines produce bit-identical sims, so ranks and rounded scores
      // hash-match.
      "q31_ann_cosine_topk" ->
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          | n AS (SELECT vec_id, v, sqrt(list_sum([x*x for x in v])) AS nrm FROM e),
          | q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
          | sims AS (
          |  SELECT q_id, c.vec_id AS n_id,
          |         list_sum([qv[i] * c.v[i] for i in range(1, len(qv)+1)]) / (qn * c.nrm) AS sim
          |  FROM q, n c WHERE c.vec_id != q_id)
          | SELECT q_id, n_id, rank, round(sim * 10000) / 10000 AS sim4 FROM (
          |  SELECT q_id, n_id, sim,
          |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
          |  FROM sims)
          | WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    )
  }
}
