package graft

import graft.operators.{Bitext, TextAnalysis}
import org.apache.spark.sql.functions._

/** Kneser-Ney LM scoring and BLEU-2 pair scoring: hand-computed textbook
  * cases, the KN normalization identity (Σ_v P(v|u) = 1 for every seen
  * context — proven through the OPERATOR's own micro outputs, not a
  * reimplementation), unseen-context/OOV fallbacks, BLEU clipping/brevity
  * edges, and partitioning invariance. The gate queries `docs_kn_score` /
  * `docs_bleu_pairs` value-check the pipelines against DuckDB at sf0.01. */
class LmBleuSpec extends SparkSpec {

  import spark.implicits._

  private def half6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ── Kneser-Ney ────────────────────────────────────────────────────────

  // ref doc "a b a b c": c2 = {ab:2, ba:1, bc:1}; ctx a:(cu 2, fan 1),
  // b:(cu 2, fan 2); cont a:1 b:1 c:1; B = 3; n1 = 2, n2 = 1 → D = 0.5.
  private val RefText = "a b a b c"

  private def kn(docs: Seq[(Long, String)], refMod: Long = 2) =
    TextAnalysis.kneserNeyScores(docs.toDF("doc_id", "text"),
      "doc_id", "text", refFilter = pmod(col("doc_id"), lit(refMod)) === 0)

  test("KN hand case: discount, interpolation and attested counts " +
      "match the closed form") {
    val out = kn(Seq(0L -> RefText, 1L -> "a b x"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 0: P(b|a)=.75+.25/3 → 833333µ (×2), P(a|b)=P(c|b)=.25+.5/3
    // → 416667µ; sum 2500000µ over 4 bigrams = 0.625
    assert(out(0L) === ((4L, 4L, 0.625)))
    // doc 1: "a b" attested 833333µ; "b x": seen context, OOV x → 0.
    // kn_score is the RAW micro-sum division (r12: no final round — the
    // terminal-decimal rounding hazard), so the expectation is the
    // exact quotient 0.4166665
    assert(out(1L) === ((2L, 1L, 833333.0 / 2e6)))
  }

  test("KN unseen context backs off to the continuation unigram; " +
      "fully OOV bigram scores 0") {
    val out = kn(Seq(0L -> RefText, 1L -> "x a", 3L -> "x y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // context x unseen → P = N1+(·a)/B = 1/3 → 333333µ
    assert(out(1L) === 333333.0 / 1e6)
    assert(out(3L) === 0.0)
  }

  test("KN is a true distribution: per seen context, probabilities over " +
      "the continuation vocabulary sum to 1 (via operator micros)") {
    // one scoring doc per (u, v) pair, each contributing exactly one
    // bigram, so its micro score IS round(P(v|u)·1e6)
    val vocab = Seq("a", "b", "c", "x")
    val pairDocs = for {
      (u, i) <- vocab.zipWithIndex
      (v, j) <- vocab.zipWithIndex
    } yield ((1 + 2 * (i * vocab.size + j)).toLong, s"$u $v", u)
    val docs = Seq((0L, "a b a b c", "")) ++ pairDocs.map(t => (t._1, t._2, ""))
    val out = kn(docs.map(t => (t._1, t._2)))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    for (u <- Seq("a", "b")) { // the seen contexts
      val total = pairDocs.filter(_._3 == u)
        .map(p => out(p._1)).sum
      assert(math.abs(total - 1.0) < vocab.size * 1e-6,
        s"context $u sums to $total")
    }
  }

  test("KN is partitioning-invariant") {
    val docs = (0L until 40L).map(i =>
      (i, (0 to (i % 7).toInt).map(j => s"w${(i + j) % 5}").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val a = TextAnalysis.kneserNeyScores(df, "doc_id", "text",
      pmod(col("doc_id"), lit(2)) === 0).collect().toSet
    val b = TextAnalysis.kneserNeyScores(df.repartition(7), "doc_id",
      "text", pmod(col("doc_id"), lit(2)) === 0).collect().toSet
    assert(a === b && a.nonEmpty)
  }

  // ── BLEU-2 ────────────────────────────────────────────────────────────

  private def bleu(pairs: Seq[(Long, Long)], docs: Seq[(Long, String)]) =
    Bitext.bleuPairs(pairs.toDF("ref_id", "cand_id"),
      docs.toDF("doc_id", "text"), "doc_id", "text")

  test("BLEU hand case: clipped precisions and score match the " +
      "textbook computation") {
    val out = bleu(Seq(0L -> 1L), Seq(
        0L -> "the cat sat on the mat",
        1L -> "the cat the cat on the mat"))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6)))
    // cand 7 tokens: m1 = the:2 + cat:1 + on:1 + mat:1 = 5;
    // bigrams 6: "the cat" clips to 1, "on the" 1, "the mat" 1 → m2 = 3
    assert(out === Array((7L, 5L, 6L, 3L,
      half6(math.sqrt((5.0 / 7) * (3.0 / 6)) * 1.0))))
  }

  test("BLEU edges: identical → 1, disjoint → 0, short candidate takes " +
      "the linear brevity penalty, 1-token candidate is dropped") {
    val docs = Seq(0L -> "a b c d", 1L -> "a b c d", 2L -> "x y z w",
      3L -> "a b", 4L -> "a")
    val out = bleu(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L), docs)
      .collect().map(r => r.getLong(1) -> r.getDouble(6)).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.0)
    // cand "a b": p1 = 1, p2 = 1, bp = 2/4
    assert(out(3L) === half6(0.5))
    assert(!out.contains(4L))
  }

  test("BLEU: duplicated input pair rows neither inflate the clipped " +
      "counts nor duplicate output rows (ADVICE r10)") {
    val docs = Seq(0L -> "the cat sat on the mat",
      1L -> "the cat the cat on the mat")
    val once = bleu(Seq(0L -> 1L), docs).collect().toSeq
    val dup = bleu(Seq(0L -> 1L, 0L -> 1L, 0L -> 1L), docs).collect().toSeq
    assert(dup === once && once.length === 1)
  }

  test("BLEU is partitioning-invariant") {
    val docs = (0L until 30L).map(i =>
      (i, (0 to (i % 6).toInt + 1).map(j => s"w${(i * j) % 4}").mkString(" ")))
    val pairs = (0L until 30L by 2).map(i => (i, i + 1))
    val a = bleu(pairs, docs).collect().toSet
    val b = Bitext.bleuPairs(pairs.toDF("ref_id", "cand_id").repartition(5),
      docs.toDF("doc_id", "text").repartition(3), "doc_id", "text")
      .collect().toSet
    assert(a === b && a.nonEmpty)
  }
}
