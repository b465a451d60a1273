package graft

import graft.operators.WordPiece
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {

  test("encodeWord: BERT reference case (un ##aff ##able)") {
    val vocab = Set("un", "##aff", "##able", "u", "n", "##a", "##f",
      "##b", "##l", "##e")
    assert(WordPiece.encodeWord("unaffable", vocab).toSeq ===
      Seq("un", "##aff", "##able"))
  }

  test("encodeWord is greedy longest-match-first at every cursor") {
    // "ab" beats "a" at pos 0 even though a+##b also spans the word
    val vocab = Set("ab", "a", "##b", "##bc", "##c")
    assert(WordPiece.encodeWord("abc", vocab).toSeq === Seq("ab", "##c"))
    // after taking "ab", the longest continuation "##bc" is unreachable:
    // greedy does NOT backtrack for a globally-shorter segmentation
    assert(WordPiece.encodeWord("abbc", vocab).toSeq ===
      Seq("ab", "##bc"))
  }

  test("encodeWord: any cursor without a match collapses to [UNK]") {
    val vocab = Set("a", "##b")
    assert(WordPiece.encodeWord("abz", vocab).toSeq === Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("za", vocab).toSeq === Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("", vocab).toSeq === Seq.empty)
  }

  test("training argmax is PMI-scored, not frequency-scored (the " +
      "BPE difference)") {
    import spark.implicits._
    // pair (a,##b) count 10, marginals 10·10 → score 0.1;
    // pair (c,##d) count 3, marginals 3·3 → score 1/3 wins despite
    // one third the frequency — BPE would merge (a,##b) first.
    val docs = (Seq.fill(10)("ab") ++ Seq.fill(3)("cd"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val vocab = WordPiece.train(docs, "text", rounds = 1)
    val learned = vocab.filterNot(
      Set("a", "##b", "c", "##d").contains)
    assert(learned === Seq("cd"))
  }

  test("trained vocab contains the full alphabet, so corpus words " +
      "never fall to [UNK]; roundtrip rebuilds every word") {
    val docs = graft.queries.Tables.t(spark,
      "/root/testdata/sf0.001", "documents")
    val vocab = WordPiece.train(docs, "text", rounds = 8).toSet
    val enc = WordPiece.encodeWords(docs, "text", vocab).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getString(1).split(" ")
      assert(pieces.head != WordPiece.Unk, s"UNK for $word")
      val rebuilt = pieces.map(p => p.stripPrefix("##")).mkString
      assert(rebuilt === word)
      // continuation discipline: first piece plain, rest ##
      assert(!pieces.head.startsWith("##"))
      pieces.tail.foreach(p => assert(p.startsWith("##"), s"$word: $p"))
    }
  }

  test("training is deterministic (pinned learned pieces on sf0.001)") {
    val docs = graft.queries.Tables.t(spark,
      "/root/testdata/sf0.001", "documents")
    val a = WordPiece.train(docs, "text", rounds = 6)
    val b = WordPiece.train(docs, "text", rounds = 6)
    assert(a === b)
    // the learned (non-alphabet) pieces are a stable contract: merging
    // is PMI-argmax over exact counts with lexical tie-break
    val learned = a.filter(p => p.stripPrefix("##").length > 1)
    assert(learned.length === 6, s"learned=$learned")
  }

  test("fixed-vocab encode agrees with an independent per-word greedy " +
      "reference on the corpus words") {
    val vocab = graft.queries.CurationQueries.WpVocab.toSet
    val docs = graft.queries.Tables.t(spark,
      "/root/testdata/sf0.001", "documents")
    val out = WordPiece.encodeWords(docs, "text", vocab)
      .filter(col("word").rlike("^[a-z]+$")).collect()
    assert(out.nonEmpty)
    // independent reference: longest-prefix scan written differently
    def ref(word: String): Seq[String] = {
      var pos = 0
      val acc = Seq.newBuilder[String]
      while (pos < word.length) {
        val cands = (word.length to (pos + 1) by -1).iterator
          .map(e => (if (pos > 0) "##" else "") + word.substring(pos, e))
          .filter(vocab.contains)
        if (!cands.hasNext) return Seq(WordPiece.Unk)
        val hit = cands.next()
        acc += hit
        pos += hit.stripPrefix("##").length
      }
      acc.result()
    }
    out.foreach { r =>
      assert(r.getString(1).split(" ").toSeq === ref(r.getString(0)),
        s"word ${r.getString(0)}")
      assert(r.getInt(2) === r.getString(1).split(" ").length)
    }
    // the multi-char pieces actually fire (non-degenerate gate)
    assert(out.exists(r => r.getString(1).split(" ")
      .exists(p => p.stripPrefix("##").length > 1)))
  }
}
