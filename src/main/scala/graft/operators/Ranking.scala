package graft.operators

import graft.functions.Fingerprints
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking layer over the retrieval operators: BM25 lexical scoring,
  * reciprocal-rank fusion of heterogeneous rankings (the hybrid-search
  * combiner), and late-interaction MaxSim (multi-vector / ColBERT-style
  * scoring). Together with [[SimilaritySearch]] (dense), [[BinaryQuant]]
  * (compressed) and [[TextAnalysis.postings]] (inverted index), this is
  * the full retrieval stack a corpus-curation pipeline queries.
  *
  * Determinism: every per-document floating-point SUM is an explicit
  * left fold over a sorted in-row list (the [[EventAnalytics.ewma]]
  * contract — identical IEEE ops in identical order on every engine);
  * per-term/per-query partial scores are fixed expression trees over
  * exact integer statistics (tf, df, dl, N as longs), and constants are
  * written so both engines parse and combine the same literals. */
object Ranking {

  /** BM25 (Robertson/Okapi, the +1 idf form Lucene uses) of a fixed
    * query-term set against the corpus: score(d) = Σ_t idf(t) ·
    * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), idf(t) =
    * ln(1 + (N − df + 0.5)/(df + 0.5)). Documents matching no query
    * term are absent (score 0). Output: (doc_id, score) top-`topN` by
    * (score desc, doc_id).
    *
    * Scale: one tokenize pass; document length and term frequency are
    * doc-keyed map-side-combinable aggregations; df and the (N, Σdl)
    * stats are term-/corpus-sized sidecars broadcast back. The query
    * term set is tiny by nature — tf rows are |matching docs × terms|,
    * never corpus × vocabulary. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topN: Int = 10, decimals: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    require(topN >= 1, "topN must be >= 1")
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(Fingerprints.tokens(col(textCol))).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val qToks = toks.filter(col("term").isin(terms: _*))
    val dfT = qToks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val tf = qToks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val part = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl)))
    val parts = tf
      .join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), part.as("part"))
    parts.groupBy("doc_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("part")))),
        lit(0.0), (acc, s) => acc + s.getField("part")).as("raw"))
      .select(col("doc_id"), round(col("raw"), decimals).as("score"))
      .orderBy(desc("score"), col("doc_id").asc)
      .limit(topN)
  }

  /** Reciprocal-rank fusion: rrf(id) = Σ_lists 1/(k + rank_list(id)),
    * absent-from-a-list contributes nothing. The standard combiner for
    * hybrid search (dense + lexical, or full-precision + compressed) —
    * rank-space fusion needs no score calibration between modalities.
    * `rankings`: (id, rank) frames, fused in the given order (the fold
    * accumulates per-list contributions sorted by list index, so the
    * addition order is defined). Output: (id, rrf, rank) top-`topN` by
    * (rrf desc, id). */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60, topN: Int = 10,
      decimals: Int = 8): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    require(kRrf >= 1, "kRrf must be >= 1")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("id").cast("long").as("id"),
        lit(i).as("list_idx"), col("rank").cast("int").as("rank"))
    }.reduce(_ unionByName _)
    val fused = tagged.groupBy("id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("list_idx"), col("rank")))),
        lit(0.0),
        (acc, s) => acc + lit(1.0) / (lit(kRrf) + s.getField("rank")))
        .as("raw"))
      .select(col("id"), round(col("raw"), decimals).as("rrf"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("rrf"), col("id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
  }

  /** Late-interaction MaxSim (ColBERT scoring): a "document" is a BAG of
    * vectors (its token/chunk embeddings), a query is a bag of vectors,
    * and score(d) = Σ_q max_{v∈d} cos(q, v). Similarities are rounded
    * in-plan BEFORE the max (so the argmax is engine-stable), and the
    * per-query maxima sum in query-id order. `queries` must be small
    * (broadcast — it is one query's token vectors).
    *
    * Scale: one corpus pass scores |docVecs| × |queryVecs| pairs in a
    * broadcast nested loop (no shuffle of the vectors); the max and the
    * final sum are doc-keyed map-side-combinable aggregations over
    * (doc, query)-sized rows. Output: (doc_id, score) top-`topN`. */
  def maxSim(docVecs: DataFrame, docIdCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      topN: Int = 10, simDecimals: Int = 6, decimals: Int = 6): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val q = broadcast(queries.select(col(queryIdCol).as("qid"),
      asDouble(col(queryVecCol)).as("qv")))
    val sims = docVecs
      .select(col(docIdCol).as("doc_id"), asDouble(col(vecCol)).as("v"))
      .crossJoin(q)
      .select(col("doc_id"), col("qid"),
        round(cosineSimilarity(col("v"), col("qv")), simDecimals).as("sim"))
    val best = sims.groupBy("doc_id", "qid").agg(max(col("sim")).as("m"))
    best.groupBy("doc_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("qid"), col("m")))),
        lit(0.0), (acc, s) => acc + s.getField("m")).as("raw"))
      .select(col("doc_id"), round(col("raw"), decimals).as("score"))
      .orderBy(desc("score"), col("doc_id").asc)
      .limit(topN)
  }
}
