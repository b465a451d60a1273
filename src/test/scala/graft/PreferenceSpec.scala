package graft

import graft.operators.{Preference, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("preferencePairs: max-margin pairing; middle self-pair and " +
      "equal-score pairs are dropped") {
    // group g: scores 5 > 4 > 3 > 2 > 1 → pairs (5,1),(4,2); rank-3
    // pairs 3 with itself → dropped. group h: all equal → no pairs.
    val df = Seq(
      ("g", 1L, 5L), ("g", 2L, 4L), ("g", 3L, 3L), ("g", 4L, 2L),
      ("g", 5L, 1L), ("h", 6L, 7L), ("h", 7L, 7L)
    ).toDF("grp", "id", "score")
    val got = Preference.preferencePairs(df, "grp", "id", "score",
        maxPairs = 3)
      .orderBy("grp", "pair_rank")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got === Array(
      ("g", 1, 1L, 5L, 4.0), ("g", 2, 2L, 4L, 2.0)))
  }

  test("preferencePairs: score ties break by id on both ends") {
    // two docs at the top score: chosen = smaller id; the worst end
    // ascends, so rank-1 rejected = smallest score, smaller id first
    val df = Seq(
      ("g", 10L, 9L), ("g", 11L, 9L), ("g", 12L, 1L), ("g", 13L, 1L)
    ).toDF("grp", "id", "score")
    val got = Preference.preferencePairs(df, "grp", "id", "score",
        maxPairs = 2)
      .orderBy("pair_rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got === Array((1, 10L, 12L), (2, 11L, 13L)))
  }

  test("majorityVote: majority label, tie → lexicographically smallest, " +
      "agreement ratio") {
    val votes = Seq(
      (1L, "cat"), (1L, "cat"), (1L, "dog"),         // cat 2/3
      (2L, "bird"), (2L, "dog"),                     // tie → bird 1/2
      (3L, "x")                                      // unanimous 1/1
    ).toDF("item", "label")
    val got = Preference.majorityVote(votes, "item", "label")
      .orderBy("item")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got === Array(
      (1L, "cat", 2L, 3L, 0.6667),
      (2L, "bird", 1L, 2L, 0.5),
      (3L, "x", 1L, 1L, 1.0)))
  }

  test("interleaveRoundRobin: every |sources|-sized prefix block is " +
      "balanced; positions are dense from 0") {
    val df = (0 until 12).map(i => (s"s${i % 3}", i.toLong))
      .toDF("source", "doc_id")
      .repartition(4)
    val got = Sampling.interleaveRoundRobin(df, "source", "doc_id")
      .orderBy("pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === (0L until 12L))
    // each block of 3 consecutive positions holds one row per source
    got.grouped(3).foreach { block =>
      assert(block.map(_._2).toSet === Set("s0", "s1", "s2"))
    }
    // within a source, ids ascend with position
    got.groupBy(_._2).values.foreach { rows =>
      val ids = rows.sortBy(_._1).map(_._3).toSeq
      assert(ids === ids.sorted)
    }
  }

  test("oovRate: tokens outside the top-V tf vocabulary count as OOV") {
    // corpus tf: a×4, b×3, c×2, d×1 → top-2 vocab = {a, b}
    val docs = Seq(
      ("g1", "a a b c"), ("g1", "a b"), ("g2", "a b c d")
    ).toDF("src", "text")
    val got = TextAnalysis.oovRate(docs, "src", "text", vocabTop = 2)
      .orderBy("src")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === Array(
      ("g1", 6L, 1L, 0.166667),   // c of "a a b c"
      ("g2", 4L, 2L, 0.5)))       // c, d
  }
}
