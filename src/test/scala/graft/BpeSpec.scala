package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("mergeOnce merges leftmost non-overlapping occurrences") {
    assert(Bpe.mergeOnce(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
    assert(Bpe.mergeOnce(Array("a", "b", "a", "b"), "a", "b").toSeq ===
      Seq("ab", "ab"))
    assert(Bpe.mergeOnce(Array("x"), "a", "b").toSeq === Seq("x"))
    assert(Bpe.mergeOnce(Array.empty[String], "a", "b").toSeq === Seq())
  }

  test("train reproduces the hand-computed merge sequence") {
    import spark.implicits._
    // classic BPE toy corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    // (Sennrich et al.'s example family). Round 1: pair counts include
    // (e,s) 6+3=9, (s,t) 9, (t, -) ... hand-check the first merges:
    //   es: 9 (newest 6, widest 3); st: 9; lo: 7; we: 8 (lower 2, newest 6)
    // max = 9, tie (e,s) < (s,t) lexicographically -> merge1 = (e,s)
    // then (es,t): 9 -> merge2; then (l,o): 7, (w,est) 2+... recount:
    //   after es, est: (n,e)=6,(e,w)=6,(w,est)... newest = n,e,w,est;
    //   widest = w,i,d,est; lower = l,o,w,e,r; low = l,o,w
    //   pairs: (est,-)na; (w,est) 6+3=9? newest: (n,e)(e,w)(w,est);
    //   widest: (w,i)(i,d)(d,est). So (w,est)=6, (d,est)=3.
    //   merge2 candidates: (es,t) doesn't exist (es already merged to est?
    //   No — merge1 = (e,s) gives symbol "es"; newest = n,e,w,es,t.
    //   pairs now: (es,t) = 9 -> merge2 = (es,t).
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", rounds = 3)
    assert(merges.take(2) === Seq(("e", "s"), ("es", "t")))
    // round 3: low x5 + lower x2 -> (l,o) = 7; (w,est) = 6; (o,w) = 7;
    // (n,e) = 6; (e,w) = 6; (w,i)/(i,d)/(d,est) = 3; (l,o) ties (o,w) at 7,
    // lexicographic tiebreak: "l" < "o" -> (l,o)
    assert(merges(2) === ("l", "o"))
  }

  test("encodeWord applies merges in training order") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    assert(Bpe.encodeWord("newest", merges).toSeq ===
      Seq("n", "e", "w", "est"))
    assert(Bpe.encodeWord("lowest", merges).toSeq ===
      Seq("lo", "w", "est"))
    assert(Bpe.encodeWord("", merges).toSeq === Seq())
  }

  test("encode emits per-occurrence symbol rows that reassemble to words") {
    import spark.implicits._
    val docs = Seq((1L, "the cat the"), (2L, "hat")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"))
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    val rebuilt = enc.groupBy(col("doc_id"), col("word_pos"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("sym_pos"), col("symbol")))),
        x => x.getField("symbol")), "").as("w"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getString(2)))
      .toMap
    assert(rebuilt === Map((1L, 0) -> "the", (1L, 1) -> "cat",
      (1L, 2) -> "the", (2L, 0) -> "hat"))
    // and "the" really merged: 1 symbol
    val theSyms = enc.filter(col("doc_id") === 1 && col("word_pos") === 0)
      .count()
    assert(theSyms === 1L)
  }

  test("pairFrequencies weights pairs by word occurrence count") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab"), (2L, "ab ba")).toDF("doc_id", "text")
    val got = Bpe.pairFrequencies(docs, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got === Map(("a", "b") -> 3L, ("b", "a") -> 1L))
  }

  test("toSymbols keeps supplementary-plane characters whole") {
    // U+1F600 GRINNING FACE is outside the BMP: char-indexed splitting
    // would produce two lone surrogate halves
    val syms = Bpe.toSymbols("a😀b")
    assert(syms.toSeq === Seq("a", "😀", "b"))
    assert(Bpe.encodeWord("a😀b", Nil).mkString === "a😀b")
  }

  test("train stops when no pairs remain (single-char vocabulary)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", rounds = 5)
    assert(merges.isEmpty)
  }
}
