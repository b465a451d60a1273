package graft.queries

import graft.operators.{BinaryQuant, Ranking, SimilaritySearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables.t

/** Hybrid-retrieval ranking gate queries: BM25 lexical scoring,
  * reciprocal-rank fusion of a dense and a compressed ranking, and
  * late-interaction MaxSim — all FULL value oracles.
  *
  * Constant discipline: the BM25 gate runs at k1 = 1.25, b = 0.75 —
  * dyadic constants, so every derived literal (k1+1 = 2.25, 1−b = 0.25)
  * is exact in both binary doubles and the oracle's decimal literals;
  * with tf/df/dl/N exact integers, the only fp divergence surface is
  * the shared ln/÷ calls, already proven engine-identical by the
  * bigram-NLL and retrieval-metrics gates. Every per-doc sum is an
  * ordered fold ([[graft.operators.Ranking]] scaladoc). */
object RankingQueries {
  type Q = (SparkSession, String) => DataFrame

  private def queryVec(s: SparkSession, d: String): Array[Double] =
    t(s, d, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).first()
      .getSeq[Double](0).toArray

  val queries: Map[String, Q] = Map(

    // ── BM25 top-20 for a 3-term query over the documents corpus ───────
    "rank_bm25" -> ((s, d) => {
      Ranking.bm25(t(s, d, "documents"), "doc_id", "text",
        queryTerms = Seq("spark", "join", "window"),
        k1 = 1.25, b = 0.75, topN = 20)
    }),

    // ── hybrid fusion: exact-cosine top-20 ⊕ Hamming-code top-20 via
    //    RRF (k = 60) — rank-space fusion needs no score calibration
    //    between the full-precision and compressed modalities. ───────────
    "rank_fusion" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = queryVec(s, d).toSeq
      val dense = SimilaritySearch.topK(emb, "vec_id", "embedding", q, 20)
        .withColumn("rank", row_number().over(
          Window.partitionBy(lit(1)) // top-20 frame; explicit spec
            .orderBy(desc("score"), col("vec_id").asc)))
        .select(col("vec_id").as("id"), col("rank"))
      val ham = BinaryQuant.hammingTopK(emb, "vec_id", "embedding", 64, q, 20)
        .withColumn("rank", row_number().over(
          Window.partitionBy(lit(1)) // top-20 frame; explicit spec
            .orderBy(col("hamming").asc, col("vec_id").asc)))
        .select(col("vec_id").as("id"), col("rank"))
      Ranking.rrfFuse(Seq(dense, ham), kRrf = 60, topN = 10)
    }),

    // ── late-interaction MaxSim: each label's vectors form one
    //    multi-vector "document", the query is the 4-vector bag
    //    vec_id < 4; score = Σ_q max_v round(cos, 6). ────────────────────
    "rank_maxsim" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Ranking.maxSim(
        emb.select(col("label").cast("long").as("lbl"), col("embedding")),
        "lbl", "embedding",
        emb.filter(col("vec_id") < 4).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", topN = 10)
    })
  )

  val oracles: Map[String, String] = Map(

    "rank_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(tk) AS term
        |  FROM (SELECT doc_id,
        |        [x FOR x IN string_split_regex(lower(text), '\s+')
        |          IF len(x) > 0] AS tk
        |        FROM documents)),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |qt AS (SELECT doc_id, term FROM toks
        |  WHERE term IN ('spark', 'join', 'window')),
        |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2),
        |parts AS (
        |  SELECT tf.doc_id, tf.term,
        |  ln(1.0::DOUBLE + (st.n_docs - dft.df + 0.5::DOUBLE)
        |      / (dft.df + 0.5::DOUBLE))
        |    * (tf.tf * 2.25::DOUBLE)
        |    / (tf.tf + 1.25::DOUBLE * (0.25::DOUBLE
        |        + 0.75::DOUBLE * (dl.dl
        |          / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))) AS part
        |  FROM tf JOIN dft ON tf.term = dft.term
        |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |acc AS (
        |  SELECT doc_id,
        |  sum(part) OVER (PARTITION BY doc_id ORDER BY term
        |    ROWS UNBOUNDED PRECEDING) AS s,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY term DESC)
        |    AS last
        |  FROM parts)
        |SELECT doc_id, round(s, 6) AS score FROM acc WHERE last = 1
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "rank_fusion" ->
      """WITH qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE vec_id = 0),
        |dense AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY
        |    round(list_cosine_similarity(e.embedding::DOUBLE[], qv.v), 6)
        |      DESC, vec_id) AS rank
        |  FROM embeddings e, qv QUALIFY rank <= 20),
        |pk AS (
        |  SELECT vec_id,
        |  [list_sum([CASE WHEN embedding[j*32 + b + 1] > 0
        |      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
        |    FOR b IN range(32)])
        |   FOR j IN range(2)] AS code
        |  FROM embeddings),
        |qc AS (SELECT code AS qc FROM pk WHERE vec_id = 0),
        |ham AS (
        |  SELECT vec_id, row_number() OVER (ORDER BY
        |    list_sum([bit_count(xor(pk.code[i+1], qc.qc[i+1]))
        |      FOR i IN range(2)]) ASC, vec_id) AS rank
        |  FROM pk, qc QUALIFY rank <= 20),
        |fused AS (
        |  SELECT coalesce(dense.vec_id, ham.vec_id) AS id,
        |  round(coalesce(1.0::DOUBLE / (60 + dense.rank), 0.0::DOUBLE)
        |    + coalesce(1.0::DOUBLE / (60 + ham.rank), 0.0::DOUBLE), 8)
        |    AS rrf
        |  FROM dense FULL OUTER JOIN ham ON dense.vec_id = ham.vec_id)
        |SELECT id, rrf, CAST(row_number() OVER (ORDER BY rrf DESC, id)
        |  AS INT) AS rank
        |FROM fused QUALIFY rank <= 10 ORDER BY rank""".stripMargin,

    "rank_maxsim" ->
      """WITH qv AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 4),
        |s AS (
        |  SELECT e.label AS doc_id, q.qid,
        |  max(round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv),
        |    6)) AS m
        |  FROM embeddings e, qv q GROUP BY 1, 2),
        |acc AS (
        |  SELECT doc_id,
        |  sum(m) OVER (PARTITION BY doc_id ORDER BY qid
        |    ROWS UNBOUNDED PRECEDING) AS sc,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY qid DESC) AS last
        |  FROM s)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, round(sc, 6) AS score
        |FROM acc WHERE last = 1
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  )
}
