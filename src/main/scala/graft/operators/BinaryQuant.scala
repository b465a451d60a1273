package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization of embeddings — 1 bit per dimension,
  * 64× smaller than float64 — plus Hamming-distance search over the
  * packed codes and the exact-rerank production shape (coarse Hamming
  * top-C, exact cosine on the survivors). The standard first rung of
  * the embedding-compression ladder below int8 ([[QuantizeInt8]]) and
  * PQ ([[Pq]]): for sign-random vectors the Hamming distance between
  * sign codes estimates the angle (the hyperplane-LSH identity
  * [[Dedup.cosinePairsLsh]] banks on), so sign codes are a cheap,
  * index-free coarse filter.
  *
  * Codes are packed into 32-bit words (longs holding values < 2^32)
  * rather than full 64-bit words: every word stays positive, so an
  * oracle engine without unsigned 64-bit integers replays the packing
  * in plain BIGINT arithmetic — bit 63 of a 64-bit pack would overflow
  * a signed long's value space and force engine-specific reinterpret
  * casts. The whole pipeline (pack, XOR, popcount) is exact integer
  * arithmetic: no float appears until the optional rerank, so results
  * are bit-identical across engines, partitionings, and retries.
  *
  * Scale: packing is a one-pass narrow projection (codegen'd array
  * fold, no shuffle); a Hamming top-k is one scan + TakeOrderedAndProject
  * (no global sort, no shuffle of the vectors — only k (id, dist) rows
  * reach the driver); rerank re-attaches full vectors for the C
  * candidates only via a broadcast semi-join. At 100 TB the packed
  * codes are the only full-corpus scan — 8 bytes/row/256 dims. */
object BinaryQuant {

  /** Pack sign bits of `vec` (strictly-positive test: bit = x > 0;
    * zeros and negatives clear) into `ceil(dim/32)` longs, word j bit b
    * ← vec[32j + b]. Dimensions past `dim` are ignored; a vector
    * shorter than `dim` packs missing tails as 0 (get() yields null →
    * bit clear) — callers wanting strictness should validate dims
    * upstream. Pure codegen-able expression: the inner fold runs
    * high-bit-to-low so the word builds as acc*2 + bit, with no
    * shift-by-column (which the Column API lacks). */
  def signWords(vec: Column, dim: Int): Column = {
    require(dim >= 1, "dim must be >= 1")
    val nWords = (dim + 31) / 32
    transform(sequence(lit(0), lit(nWords - 1)), j =>
      aggregate(sequence(lit(31), lit(0), lit(-1)), lit(0L), (acc, b) =>
        acc * lit(2L) +
          coalesce(when(get(vec, j * lit(32) + b) > 0.0, lit(1L)), lit(0L))))
  }

  /** Hamming distance between two equal-length packed-word arrays:
    * Σ popcount(a XOR b). Exact integer arithmetic. */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0L), (acc, c) => acc + c.cast("long"))

  /** Corpus with a `code` column of packed sign words appended. */
  def encode(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.withColumn("code", signWords(asDouble(col(vecCol)), dim))

  /** Driver-side packing of a query vector — same strict-positive
    * convention as [[signWords]]. */
  def signWordsOf(vec: Seq[Double], dim: Int): Seq[Long] = {
    require(dim >= 1, "dim must be >= 1")
    val nWords = (dim + 31) / 32
    (0 until nWords).map { j =>
      (31 to 0 by -1).foldLeft(0L) { (acc, b) =>
        val i = j * 32 + b
        acc * 2L + (if (i < vec.length && i < dim && vec(i) > 0.0) 1L else 0L)
      }
    }
  }

  /** Exact Hamming top-k of `query` against the corpus: one narrow
    * pack-and-score scan, bounded by TakeOrderedAndProject (asc
    * distance, id tiebreak). Output: (id, hamming). */
  def hammingTopK(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, query: Seq[Double], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val qWords = signWordsOf(query, dim)
    corpus.select(col(idCol),
        hammingDistance(signWords(asDouble(col(vecCol)), dim),
          typedLit(qWords)).as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(k)
  }

  /** Two-stage retrieval over sign codes: Hamming top-`coarseK`
    * candidates, then exact cosine top-`k` among them — the
    * compressed-domain production shape ([[Pq.adcTopK]]'s cheaper
    * sibling). Output: (id, score) rounded to `scoreDecimals`.
    *
    * Degenerate corpus rows (null / dim-drifted / zero-norm vectors)
    * are excluded BEFORE the coarse stage, not just at the rerank:
    * such a row sign-packs to all-zero words — valid Hamming mass that
    * can rank high against a mostly-negative query, occupy coarseK
    * slots, and starve the rerank below k rows even when k valid
    * candidates exist. The filter is one short-circuit array scan in
    * the same codegen stage as the pack. */
  def hammingRerankTopK(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, query: Seq[Double], k: Int, coarseK: Int,
      scoreDecimals: Int = 6): DataFrame = {
    require(coarseK >= k, "coarseK must be >= k")
    val vd = asDouble(col(vecCol))
    val valid = corpus.filter(col(vecCol).isNotNull &&
      size(vd) === dim && exists(vd, x => x =!= 0.0))
    val cands = hammingTopK(valid, idCol, vecCol, dim, query, coarseK)
      .select(col(idCol))
    valid.join(broadcast(cands), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(cosineSimilarity(asDouble(col(vecCol)), typedLit(query)),
          scoreDecimals).as("score"))
      // the valid filter leaves no null scores, but keep the topK
      // contract explicit against upstream drift
      .filter(col("score").isNotNull)
      .orderBy(desc("score"), col(idCol).asc)
      .limit(k)
  }
}
