package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** RAKE keyphrase extraction: the hand-computable deg/freq case,
  * phrase-boundary handling at stopword runs and doc edges, the
  * micro-rounding contract (identical phrases carry identical scores),
  * and partitioning invariance. The gate query `docs_rake` value-checks
  * the full pipeline against DuckDB's relational replay at sf0.01. */
class RakeSpec extends SparkSpec {

  import spark.implicits._

  private def rake(docs: Seq[(Long, String)], stops: Seq[String],
      topK: Int = 20) =
    TextAnalysis.rakePhrases(docs.toDF("doc_id", "text"), "doc_id",
      "text", stops, topK)

  test("hand case: deg/freq word scores and phrase sums") {
    // phrases: [good deal] ×2, [deal] → freq(good)=2, deg(good)=4;
    // freq(deal)=3, deg(deal)=5 → good 2000000µ, deal 1666667µ
    val out = rake(Seq(0L -> "a good deal the good deal of the deal"),
        Seq("a", "the", "of"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out === Array(("good deal", 2L, 3666667L),
      ("deal", 1L, 1666667L)))
  }

  test("stopword runs, leading/trailing stopwords, and stopword-only " +
      "docs segment correctly") {
    val out = rake(Seq(
        0L -> "the a fast sort the the",
        1L -> "the a"),
      Seq("the", "a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("fast sort" -> 1L))
  }

  test("identical phrases in different docs aggregate with one score") {
    val out = rake(Seq(0L -> "big data the big data", 1L -> "big data"),
        Seq("the"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out === Array(("big data", 3L)))
  }

  test("rakePhrases is partitioning-invariant and respects topK") {
    val docs = (0L until 50L).map(i =>
      (i, (0 to (i % 6).toInt + 1).map(j => s"w${(i + 3 * j) % 8}")
        .mkString(" ") + " the tail"))
    val df = docs.toDF("doc_id", "text")
    val a = TextAnalysis.rakePhrases(df, "doc_id", "text",
      Seq("the", "w0"), 7).collect().toSeq
    val b = TextAnalysis.rakePhrases(df.repartition(9), "doc_id", "text",
      Seq("the", "w0"), 7).collect().toSeq
    assert(a === b)
    assert(a.length === 7)
  }
}
