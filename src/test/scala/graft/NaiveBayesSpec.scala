package graft

import graft.operators.NaiveBayes
import org.apache.spark.sql.functions._

/** Multinomial NB trainer/scorer: hand-checked smoothed cells on a tiny
  * corpus, the full label×vocab grid (zero-count cells present), OOV
  * dropping, deterministic argmax tie-break, and agreement between the
  * window-free predict and a reference re-derivation. The gate queries
  * (`classifier_nb_model`/`classifier_nb_predict`) replay the same
  * arithmetic in DuckDB at sf0.01. */
class NaiveBayesSpec extends SparkSpec {

  import spark.implicits._

  // en: "a a b" (tot 3) | fr: "b c" (tot 2); vocab {a,b,c}, V = 3
  private def tiny = Seq(
    (0L, "a a b", "en"),
    (1L, "b c", "fr")).toDF("doc_id", "text", "lang")

  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("model grid: every label×vocab cell, Laplace-smoothed micro-nats") {
    val m = NaiveBayes.train(tiny, "text", "lang")
      .orderBy("label", "token")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = Seq(
      ("en", "a", 2L, micro(math.log(3.0 / 6.0))),
      ("en", "b", 1L, micro(math.log(2.0 / 6.0))),
      ("en", "c", 0L, micro(math.log(1.0 / 6.0))),
      ("fr", "a", 0L, micro(math.log(1.0 / 5.0))),
      ("fr", "b", 1L, micro(math.log(2.0 / 5.0))),
      ("fr", "c", 1L, micro(math.log(2.0 / 5.0))))
    assert(m.toSeq === expected)
  }

  test("priors: ln(n_label/n_docs) in micro-nats") {
    val p = NaiveBayes.priors(tiny, "lang").orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(p.toSeq === Seq(
      ("en", micro(math.log(0.5))), ("fr", micro(math.log(0.5)))))
  }

  test("predict recovers the training labels and sums exactly") {
    val m = NaiveBayes.train(tiny, "text", "lang")
    val p = NaiveBayes.priors(tiny, "lang")
    val out = NaiveBayes.predict(tiny, "doc_id", "text", m, p)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val prior = micro(math.log(0.5))
    // doc 0 under en: 2·llh(a)+llh(b); doc 1 under fr: llh(b)+llh(c)
    val s0 = 2 * micro(math.log(3.0 / 6.0)) + micro(math.log(2.0 / 6.0)) + prior
    val s1 = 2 * micro(math.log(2.0 / 5.0)) + prior
    assert(out.toSeq === Seq((0L, "en", s0), (1L, "fr", s1)))
  }

  test("OOV tokens drop; a doc with no in-vocab token is absent") {
    val m = NaiveBayes.train(tiny, "text", "lang")
    val p = NaiveBayes.priors(tiny, "lang")
    val test = Seq((7L, "a zz"), (8L, "zz qq")).toDF("doc_id", "text")
    val out = NaiveBayes.predict(test, "doc_id", "text", m, p)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 7 scores on 'a' alone (en wins: llh_en(a) > llh_fr(a) with
    // equal priors); doc 8 is entirely OOV → no output row
    assert(out.toSeq === Seq((7L, "en")))
  }

  test("argmax ties break toward the lexicographically smallest label") {
    // symmetric corpus: both classes induce identical posteriors
    val sym = Seq((0L, "x", "aa"), (1L, "x", "bb")).toDF(
      "doc_id", "text", "lang")
    val m = NaiveBayes.train(sym, "text", "lang")
    val p = NaiveBayes.priors(sym, "lang")
    val out = NaiveBayes.predict(sym, "doc_id", "text", m, p)
      .collect().map(r => r.getString(1))
    assert(out.toSeq === Seq("aa", "aa"))
  }

  test("sf0.001 self-train predicts deterministically (run-to-run)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = NaiveBayes.train(docs, "text", "lang")
    val p = NaiveBayes.priors(docs, "lang")
    def run() = NaiveBayes.predict(docs, "doc_id", "text", m, p)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val a = run()
    assert(a === run())
    assert(a.size === docs.count())
  }
}
