package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al., NeurIPS 2023 — "Data
  * Selection for Language Models via Importance Resampling"): fit
  * hashed bag-of-tokens distributions over a TARGET corpus (the
  * distribution you want more of) and the RAW corpus, weight every raw
  * document by its token-level log-likelihood ratio, and resample
  * proportionally to exp(weight) with deterministic Gumbel top-k. The
  * curation step that upgrades the reference's implicit "embed and let
  * the vector DB rank" selection (qdrant_text_loader.py:137-141) to a
  * distribution-matching corpus selector.
  *
  * Engine-portable numerics: the only floating-point in the whole
  * pipeline lives in the DRIVER-SIZED ratio table (B ln's, quantized
  * once to integer micro-nats via floor(1e6·x + 0.5)); per-document
  * weights are then exact LONG sums, immune to cross-engine fp
  * summation-order differences (PLANS.md "cross-engine numeric traps").
  * Token buckets are md5-derived (first 8 hex chars mod B), the same
  * hash DuckDB computes — so the oracle recomputes the identical
  * weights from SQL.
  *
  * 100 TB posture:
  *  - `bucketTotals` is one map-side-combinable aggregation whose
  *    exchange carries ≤ B rows per task (B = 1024 here), never tokens.
  *  - The ratio table is B longs — broadcast in the task closure.
  *  - `importanceWeights` is one typed mapPartitions pass (PLANS.md
  *    lesson 7): tokenize, hash, table-lookup, Long-sum; no explode, no
  *    shuffle, no join. The corpus is read once.
  *  - `resampleTopK` keys rows by weight + Gumbel(md5(id)) and lowers
  *    through `orderBy.limit` → TakeOrderedAndProject (per-task
  *    k-heaps, no global sort). Gumbel-top-k draws k documents without
  *    replacement with probability ∝ exp(weight) — exactly importance
  *    resampling, with retry-deterministic keys (content-hash RNG, the
  *    `Sampling` discipline).
  */
object Dsir {

  /** Quantization scale: micro-nats. */
  private val Scale = 1e6

  /** Deterministic (0,1) uniform denominator: 2^48 + 1 (12 hex chars),
    * matching `Sampling`'s hash-uniform convention. */
  private val U48 = 281474976710657.0

  /** JVM-side bucket of a token: first 8 hex chars of md5 mod B —
    * byte-identical to the SQL `pmod(conv(substring(md5(tok),1,8),16,10), B)`
    * and DuckDB's `('0x' || substr(md5(tok),1,8))::BIGINT % B`. */
  def bucketOf(md: java.security.MessageDigest, token: String,
      buckets: Int): Int = {
    md.reset()
    val dig = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex chars = first 4 bytes, big-endian, unsigned
    val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
    (h % buckets).toInt
  }

  private def tokensOf(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      .filter(_.nonEmpty)

  /** (bucket INT, cnt LONG) token-occurrence totals per hash bucket —
    * the corpus-distribution fit. Output is ≤ `buckets` rows however
    * large the corpus; the exchange moves map-side-combined partials. */
  def bucketTotals(df: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val tok = explode(filter(
      split(lower(col(textCol)), "\\s+"), t => length(t) > 0)).as("tk")
    df.select(tok)
      .select(pmod(conv(substring(md5(col("tk")), 1, 8), 16, 10)
        .cast("long"), lit(buckets)).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Driver-sized smoothed log-likelihood-ratio table in integer
    * micro-nats: ratio(b) = floor(1e6·(ln((tc_b+1)/(T+B)) −
    * ln((rc_b+1)/(R+B))) + 0.5) — add-one smoothing, so buckets unseen
    * in the target get a uniform penalty instead of −∞. Fails loudly on
    * an empty target or raw corpus (a silent all-zero table would
    * "select" uniformly at random). */
  def logRatioMicro(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int): Array[Long] = {
    require(buckets > 0, "buckets must be positive")
    def totals(df: DataFrame): (Array[Long], Long) = {
      val counts = new Array[Long](buckets)
      bucketTotals(df, textCol, buckets).collect().foreach { r =>
        counts(r.getInt(0)) = r.getLong(1)
      }
      (counts, counts.sum)
    }
    val (tc, tn) = totals(target)
    val (rc, rn) = totals(raw)
    require(tn > 0, "target corpus has no tokens")
    require(rn > 0, "raw corpus has no tokens")
    Array.tabulate(buckets) { b =>
      val lr = math.log((tc(b) + 1.0) / (tn.toDouble + buckets)) -
        math.log((rc(b) + 1.0) / (rn.toDouble + buckets))
      math.floor(Scale * lr + 0.5).toLong
    }
  }

  /** (id LONG, weight_micro LONG): per-document importance weight =
    * Σ_tokens ratio(bucket(token)) — exact integer sum, one corpus
    * pass, table in the closure. Token-less documents weigh 0. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      ratioMicro: Array[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val table = ratioMicro
    val buckets = ratioMicro.length
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          var w = 0L
          val toks = tokensOf(text)
          var i = 0
          while (i < toks.length) {
            w += table(bucketOf(md, toks(i), buckets))
            i += 1
          }
          (id, w)
        }
      }.toDF("id", "weight_micro")
  }

  /** Gumbel top-k resample over (id, weight_micro): key = weight +
    * floor(1e6·(−ln(−ln u)) + 0.5) with u a salted content-hash
    * uniform — selects k documents without replacement w.p. ∝
    * exp(weight_micro/1e6), deterministically (same corpus → same
    * sample, the retry-safe property every Sampling op here keeps).
    * Lowers to TakeOrderedAndProject. */
  def resampleTopK(weighted: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(concat(lit("dsir|"),
      col(idCol).cast("string"))), 1, 12), 16, 10).cast("double") + 1.0) / U48
    val gumbelMicro = floor(-log(-log(u)) * Scale + 0.5).cast("long")
    weighted
      .withColumn("key_micro", col(weightCol) + gumbelMicro)
      .orderBy(desc("key_micro"), col(idCol).asc)
      .limit(k)
  }
}
