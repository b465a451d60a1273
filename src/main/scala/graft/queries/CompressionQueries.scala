package graft.queries

import graft.functions.VectorFunctions
import graft.operators.{BinaryQuant, SimilaritySearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t

/** Compressed-embedding retrieval gate queries: binary (sign-bit)
  * quantization with Hamming search and the Hamming→exact rerank
  * production shape, plus Matryoshka prefix truncation and its rerank
  * form.
  *
  * Oracle discipline: the Hamming path is EXACT integer arithmetic end
  * to end (32-bit packed words, XOR, popcount), so DuckDB replays pack
  * and distance bit-for-bit — a full value oracle. The rerank forms are
  * 0-row dominance contracts (exact top-k scores dominate any
  * subset-restricted top-k, for ANY coarse scorer), with raw recall
  * values pinned in `BinaryQuantSpec`. Matryoshka values mirror the
  * `emb_normalize` oracle on the sliced prefix (same `+ 0.0`
  * signed-zero guard — Spark's BigDecimal round emits +0.0 where
  * DuckDB's round preserves -0.0). */
object CompressionQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Dim = 64

  /** Query vector: embedding of vec_id 0, collected driver-side (one
    * row — the query-literal pattern every topK entry uses). */
  private def queryVec(s: SparkSession, d: String): Array[Double] =
    t(s, d, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).first()
      .getSeq[Double](0).toArray

  val queries: Map[String, Q] = Map(

    // ── sign-bit codes + Hamming top-10: the 1-bit/dim compressed scan.
    //    Pure integer pipeline (pack → XOR → popcount), value-checked
    //    exactly. ────────────────────────────────────────────────────────
    "emb_hamming_topk" -> ((s, d) => {
      BinaryQuant.hammingTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        Dim, queryVec(s, d).toSeq, k = 10)
    }),

    // ── Hamming coarse top-50 → exact cosine rerank top-10, checked as
    //    a dominance 0-row contract: per rank, the exact top-k score
    //    must dominate the rerank score (holds for ANY candidate set —
    //    certifies the composition without pinning code values). ─────────
    "emb_hamming_rerank" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = queryVec(s, d).toSeq
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("score"), col("vec_id"))
      val reranked = BinaryQuant.hammingRerankTopK(emb, "vec_id",
          "embedding", Dim, q, k = 10, coarseK = 50)
        .withColumn("rank", row_number().over(w))
        .select(col("rank"), col("score").as("rerank_score"))
      val exact = SimilaritySearch.topK(emb, "vec_id", "embedding", q, 10)
        .withColumn("rank", row_number().over(w))
        .select(col("rank"), col("score").as("exact_score"))
      reranked.join(exact, Seq("rank"))
        .filter(col("rerank_score") > col("exact_score"))
        .orderBy(col("rank"))
    }),

    // ── Matryoshka truncation: first 16 dims re-unit-normalized —
    //    value-checked per element (emb_normalize's oracle shape on the
    //    prefix). ────────────────────────────────────────────────────────
    "emb_matryoshka" -> ((s, d) => {
      t(s, d, "embeddings").select(col("vec_id"),
          posexplode(transform(
            VectorFunctions.truncateRenorm(col("embedding"), 16),
            x => round(x, 4))))
        .toDF("vec_id", "pos", "x")
        .orderBy(col("vec_id"), col("pos"))
    }),

    // ── per-dimension z-scoring against exact INTEGER corpus stats
    //    (micro-quantized Σx / Σx² — order-free sums, so the only fp is
    //    the final fixed expression tree both engines evaluate
    //    identically). ───────────────────────────────────────────────────
    "emb_standardize" -> ((s, d) => {
      graft.operators.Standardize.zScores(t(s, d, "embeddings"),
          "vec_id", "embedding")
        .orderBy(col("vec_id"), col("pos"))
    }),

    // ── Matryoshka two-stage retrieval: coarse top-50 in the 16-dim
    //    prefix space, exact rerank top-10 — dominance 0-row contract
    //    (same shape as emb_project_rerank; holds for ANY prefix). ───────
    "emb_matryoshka_rerank" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = queryVec(s, d)
      val qTrunc = {
        val prefix = q.take(16)
        val n = math.sqrt(prefix.map(x => x * x).sum)
        if (n == 0.0) prefix else prefix.map(_ / n)
      }
      val coarse = emb.select(col("vec_id"),
        VectorFunctions.truncateRenorm(col("embedding"), 16).as("trunc"))
      val cands = SimilaritySearch.topK(coarse, "vec_id", "trunc",
          qTrunc.toSeq, k = 50)
        .select(col("vec_id"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("score"), col("vec_id"))
      val reranked = SimilaritySearch.topK(
          emb.join(cands, Seq("vec_id"), "left_semi"),
          "vec_id", "embedding", q.toSeq, 10)
        .withColumn("rank", row_number().over(w))
        .select(col("rank"), col("score").as("rerank_score"))
      val exact = SimilaritySearch.topK(emb, "vec_id", "embedding",
          q.toSeq, 10)
        .withColumn("rank", row_number().over(w))
        .select(col("rank"), col("score").as("exact_score"))
      reranked.join(exact, Seq("rank"))
        .filter(col("rerank_score") > col("exact_score"))
        .orderBy(col("rank"))
    }),

    // ── exact covariance matrix (upper triangle): micro-quantized
    //    integer pair sums from ONE typed-kernel pass (never an N·dim²
    //    explode), fp only in the per-cell fixed tree — the correlation
    //    audit behind whitening / truncation decisions ──────────────────
    "emb_covariance" -> ((s, d) => {
      graft.operators.Covariance.covarianceMatrix(
          t(s, d, "embeddings"), "embedding", Dim)
        .orderBy(col("i"), col("j"))
    }),

    // ── PCA dominance audit (0-row): the power-method top eigenvalue
    //    must dominate every diagonal variance (λ₁ = max uᵀCu ≥ C_kk).
    //    Holds for ANY corpus if the iteration is right; eigenpair
    //    values pinned in CovarianceSpec. ────────────────────────────────
    "emb_pca_audit" -> ((s, d) =>
      graft.operators.Covariance.pcaDominanceAudit(
        t(s, d, "embeddings"), "embedding", Dim)),

    // ── ZCA whitening audit (0-row): the whitened corpus's exact
    //    covariance must be ≈ identity — the defining property, checked
    //    through the same integer-quantized covariance kernel. Driver
    //    work is the dim² Jacobi eigensolve (a sidecar); the transform
    //    is one broadcast-matrix projection. ───────────────────────────
    "emb_whiten_audit" -> ((s, d) =>
      graft.operators.Covariance.whitenAudit(
        t(s, d, "embeddings"), "vec_id", "embedding", Dim))
  )

  val oracles: Map[String, String] = Map(

    // Exact integer replay of the sign-pack (32-bit words via shifts)
    // and XOR/popcount distance.
    "emb_hamming_topk" ->
      """WITH pk AS (
        |  SELECT vec_id,
        |  [list_sum([CASE WHEN embedding[j*32 + b + 1] > 0
        |      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
        |    FOR b IN range(32)])
        |   FOR j IN range(2)] AS code
        |  FROM embeddings),
        |q AS (SELECT code AS qc FROM pk WHERE vec_id = 0)
        |SELECT pk.vec_id,
        |CAST(list_sum([bit_count(xor(pk.code[i+1], q.qc[i+1]))
        |  FOR i IN range(2)]) AS BIGINT) AS hamming
        |FROM pk, q
        |ORDER BY hamming, pk.vec_id LIMIT 10""".stripMargin,

    "emb_hamming_rerank" ->
      """SELECT CAST(NULL AS INT) AS rank,
        |CAST(NULL AS DOUBLE) AS rerank_score,
        |CAST(NULL AS DOUBLE) AS exact_score WHERE FALSE""".stripMargin,

    "emb_matryoshka" ->
      """SELECT vec_id, CAST(pos AS INT) AS pos, x FROM (
        |  SELECT vec_id,
        |  unnest(range(16)) AS pos,
        |  unnest([round(x / sqrt(list_sum([y*y
        |    FOR y IN (embedding::DOUBLE[])[1:16]])), 4) + 0.0
        |    FOR x IN (embedding::DOUBLE[])[1:16]]) AS x
        |  FROM embeddings)
        |ORDER BY vec_id, pos""".stripMargin,

    "emb_matryoshka_rerank" ->
      """SELECT CAST(NULL AS INT) AS rank,
        |CAST(NULL AS DOUBLE) AS rerank_score,
        |CAST(NULL AS DOUBLE) AS exact_score WHERE FALSE""".stripMargin,

    // Exact integer replay of the pair grid: the quantize, the integer
    // sums, and the per-cell double tree all reproduce bit-for-bit.
    "emb_covariance" ->
      """WITH q AS (SELECT [CAST(round(x * 1000000, 0) AS BIGINT)
        |    FOR x IN embedding::DOUBLE[]] AS qv FROM embeddings),
        |idx AS (SELECT i FROM range(64) t(i)),
        |cells AS (
        |  SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(q.qv[a.i + 1]) AS BIGINT) AS s_i,
        |  CAST(sum(q.qv[b.i + 1]) AS BIGINT) AS s_j,
        |  CAST(sum(q.qv[a.i + 1] * q.qv[b.i + 1]) AS DECIMAL(38,0))
        |    AS s_ij
        |  FROM q, idx a, idx b WHERE b.i >= a.i GROUP BY 1, 2)
        |SELECT i, j, n, s_i, s_j, CAST(s_ij AS VARCHAR) AS s_ij,
        |round((CAST(s_ij AS DOUBLE) / n - (CAST(s_i AS DOUBLE) / n)
        |  * (CAST(s_j AS DOUBLE) / n)) / 1e12, 6) + 0.0 AS cov
        |FROM cells ORDER BY i, j""".stripMargin,

    "emb_pca_audit" ->
      """SELECT CAST(NULL AS INT) AS i, CAST(NULL AS DOUBLE) AS cov,
        |CAST(NULL AS DOUBLE) AS lambda1 WHERE FALSE""".stripMargin,

    "emb_whiten_audit" ->
      """SELECT CAST(NULL AS INT) AS i, CAST(NULL AS INT) AS j,
        |CAST(NULL AS DOUBLE) AS cov WHERE FALSE""".stripMargin,

    // Exact integer replay: micro-quantized sums, then the identical
    // double expression tree (CAST/divide/multiply/subtract/sqrt are all
    // IEEE-correctly-rounded, so bits match before the final round).
    "emb_standardize" ->
      """WITH e AS (
        |  SELECT vec_id, unnest(range(len(embedding))) AS pos,
        |  unnest([CAST(round(x * 1000000, 0) AS BIGINT)
        |    FOR x IN embedding::DOUBLE[]]) AS xm
        |  FROM embeddings),
        |st AS (
        |  SELECT pos, count(*) AS n, sum(xm) AS s, sum(xm * xm) AS s2
        |  FROM e GROUP BY pos),
        |m AS (SELECT pos,
        |  CAST(s AS DOUBLE) / n AS mu_m,
        |  CAST(s2 AS DOUBLE) / n
        |    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) AS var_m
        |  FROM st)
        |SELECT e.vec_id, CAST(e.pos AS INT) AS pos,
        |round(CASE WHEN m.var_m > 0
        |  THEN (CAST(e.xm AS DOUBLE) - m.mu_m) / sqrt(m.var_m)
        |  ELSE 0.0 END, 4) + 0.0 AS z
        |FROM e JOIN m ON e.pos = m.pos
        |ORDER BY e.vec_id, pos""".stripMargin
  )
}
