package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace unigrams — the counting-based
  * sibling of the embedding-space [[Classifier]] (logistic head). Where
  * the logistic model needs an iterative descent whose gate can only be
  * a convexity audit, NB's "training" is ONE aggregation pass, so both
  * the fitted model and its predictions get FULL value oracles: DuckDB
  * recomputes every smoothed log-likelihood and every document posterior
  * from the same counts. This is the classic fastText/langid.py-lineage
  * supervised filter (language ID, source/domain routing, quality
  * labeling) trained entirely inside the engine.
  *
  * Engine-portable numerics (the [[Dsir]] discipline): floating point
  * appears exactly once — each model cell quantizes
  * ln((c+1)/(tot_y+V)) to integer micro-nats via floor(1e6·x + 0.5) —
  * and per-document scores are exact LONG sums of those integers, so no
  * cross-engine fp-summation-order divergence is possible.
  *
  * 100 TB posture:
  *  - `train` shuffles only (label, token, partial-count) rows —
  *    map-side combined, bounded by label×vocab however large the
  *    corpus. The smoothed grid is vocab × labels (labels broadcast
  *    into a nested-loop expansion); no data-sized state ever reaches
  *    the driver — V and class totals stay in-plan as 1-row/L-row
  *    broadcast joins.
  *  - `predict` is one token-explode, one broadcast-able join against
  *    the model (vocab-sized), one LONG-sum aggregation keyed by
  *    (doc, label), and a size-L per-doc argmax — no global sort, no
  *    driver round-trip.
  *
  * Contracts (documented, oracle-replayed):
  *  - Add-one (Laplace) smoothing over the training vocabulary V; the
  *    model grid contains EVERY (label, token ∈ V) cell, including
  *    zero-count ones.
  *  - Out-of-vocabulary tokens are DROPPED at predict time (the
  *    standard NB/fastText convention); a document with no in-vocab
  *    token is absent from the prediction output — an upstream
  *    emptiness filter owns that case.
  *  - Argmax ties break toward the lexicographically smallest label,
  *    so predictions are deterministic on any engine. */
object NaiveBayes {

  private def toks(df: DataFrame, textCol: String) =
    explode(filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) > 0))

  /** Fitted model grid: (label, token, c LONG, llh_micro LONG) — one row
    * per label × training-vocab token, c = training occurrences of
    * `token` under `label`, llh_micro = floor(1e6·ln((c+1)/(tot+V)) +
    * 0.5) with tot = total token occurrences under `label` and V =
    * |vocab|. */
  def train(docs: DataFrame, textCol: String, labelCol: String): DataFrame = {
    val tok = docs.select(col(labelCol).as("label"),
      toks(docs, textCol).as("token"))
    val counts = tok.groupBy("label", "token").agg(count(lit(1)).as("c"))
    val vocab = tok.select("token").distinct()
    val labels = tok.select("label").distinct()
    val classTot = tok.groupBy("label").agg(count(lit(1)).as("tot"))
    val vsize = vocab.agg(count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(labels))
      .join(counts, Seq("label", "token"), "left")
      .na.fill(0L, Seq("c"))
      .join(broadcast(classTot), Seq("label"))
      .crossJoin(broadcast(vsize))
      .select(col("label"), col("token"), col("c"),
        floor(log((col("c") + lit(1)).cast("double") /
          (col("tot") + col("v")).cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("llh_micro"))
  }

  /** Class log-priors in micro-nats: (label, prior_micro LONG) with
    * prior_micro = floor(1e6·ln(n_label / n_docs) + 0.5). */
  def priors(docs: DataFrame, labelCol: String): DataFrame = {
    val perClass = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    perClass.crossJoin(broadcast(total))
      .select(col("label"),
        floor(log(col("n").cast("double") / col("n_total").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long").as("prior_micro"))
  }

  /** Per-document per-class posterior scores: (id, label, score_micro
    * LONG) with score_micro = prior_micro + Σ llh_micro over the doc's
    * in-vocab tokens (OOV dropped — see the object contract). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, priorTable: DataFrame): DataFrame =
    docs.select(col(idCol).as("id"), toks(docs, textCol).as("token"))
      .join(model.select("label", "token", "llh_micro"), Seq("token"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("llh_micro")).as("s"))
      .join(broadcast(priorTable), Seq("label"))
      .select(col("id"), col("label"),
        (col("s") + col("prior_micro")).as("score_micro"))

  /** Argmax over [[score]]: (id, pred_label, score_micro) — highest
    * score wins, ties to the lexicographically smallest label. Window-
    * free: min(struct(−score, label)) is partial-aggregable (map-side
    * combine, no per-group sort), and struct order (−score asc, label
    * asc) IS the documented tie-break. */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, priorTable: DataFrame): DataFrame =
    score(docs, idCol, textCol, model, priorTable)
      .groupBy(col("id"))
      .agg(min(struct((-col("score_micro")).as("neg"), col("label"))).as("m"))
      .select(col("id"), col("m.label").as("pred_label"),
        (-col("m.neg")).as("score_micro"))
}
