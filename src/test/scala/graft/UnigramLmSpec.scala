package graft

import graft.operators.UnigramLm
import graft.operators.UnigramLm.Vocab
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {

  test("segmentWord: max-likelihood path beats char fallback") {
    val v = Vocab(Map(
      "un" -> math.log(0.2), "igram" -> math.log(0.1),
      "u" -> math.log(0.01), "n" -> math.log(0.01), "i" -> math.log(0.01),
      "g" -> math.log(0.01), "r" -> math.log(0.01), "a" -> math.log(0.01),
      "m" -> math.log(0.01)), floorLogp = math.log(1e-6))
    assert(UnigramLm.segmentWord("unigram", v).toSeq ===
      Seq("un", "igram"))
  }

  test("segmentWord: tie on score prefers fewer pieces") {
    // "abc": pieces {"ab","c"} and {"a","bc"} both score 2·log(0.1);
    // {"abc"} scores log(0.01) = same total — fewest pieces wins
    val v = Vocab(Map(
      "ab" -> math.log(0.1), "c" -> math.log(0.1),
      "a" -> math.log(0.1), "bc" -> math.log(0.1),
      "abc" -> math.log(0.01), "b" -> math.log(0.001)),
      floorLogp = math.log(1e-9))
    assert(UnigramLm.segmentWord("abc", v).toSeq === Seq("abc"))
  }

  test("segmentWord: unknown chars take the floor and never fail") {
    val v = Vocab(Map("ab" -> math.log(0.5)), floorLogp = math.log(1e-6))
    assert(UnigramLm.segmentWord("abxy", v).toSeq === Seq("ab", "x", "y"))
    assert(UnigramLm.segmentWord("", v).toSeq === Seq.empty)
  }

  test("train + segment roundtrip on a toy corpus; EM concentrates " +
      "probability on used pieces") {
    import spark.implicits._
    val docs = Seq((0L, "river riverbank bank bank river"),
      (1L, "embank embankment bank river")).toDF("doc_id", "text")
    val vocab = UnigramLm.train(docs, "text", vocabSize = 50, emRounds = 2)
    // coverage: every single char of the corpus is in the vocab
    "riverbankembt".foreach(c =>
      assert(vocab.logp.contains(c.toString), s"missing char $c"))
    val seg = UnigramLm.segment(docs, "doc_id", "text", vocab)
    // reassembly: concatenated pieces per (doc, word_pos) == the word
    val rebuilt = seg.groupBy(col("doc_id"), col("word_pos"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("piece_pos"), col("piece")))),
        x => x.getField("piece")), "").as("w"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2))
      .toMap
    val words = docs.collect().flatMap { r =>
      r.getString(1).split(" ").zipWithIndex.map { case (w, i) =>
        (r.getLong(0), i) -> w
      }
    }.toMap
    assert(rebuilt === words)
    // "bank" recurs both free and bound — EM must keep it a single piece
    val bankSeg = UnigramLm.segmentWord("bank", vocab)
    assert(bankSeg.toSeq === Seq("bank"))
  }

  test("vocab_unigram_top: pinned top pieces at sf0.001") {
    val got = graft.queries.CurationQueries.vocabUnigramTopFull(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // deterministic function of (corpus, trainer); a change in the
    // candidate selection, EM, or Viterbi tie rules lands here. The
    // selected pieces are real corpus words — evidence the EM
    // concentrates probability on linguistically meaningful units.
    val expected = Seq(
      ("ta", 1799L), ("scan", 984L), ("column", 978L), ("window", 976L),
      ("order", 975L), ("sort", 974L), ("part", 963L), ("agg", 953L),
      ("value", 950L), ("line", 946L), ("key", 945L), ("join", 936L),
      ("merge", 935L), ("group", 934L), ("query", 934L), ("vector", 931L),
      ("hash", 923L), ("slow", 921L), ("stream", 919L), ("filter", 917L))
    assert(got === expected)
  }
}
