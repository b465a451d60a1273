package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class WinnowSboSpec extends SparkSpec {

  // replicate the operator's hash: first 8 hex chars of md5 as a long
  private def h32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  private def naiveWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val hs = (0 to toks.length - k)
      .map(i => h32(toks.slice(i, i + k).mkString(" "))).toArray
    (0 to hs.length - w).flatMap { s =>
      val win = (s until s + w).map(p => (hs(p), p))
      Seq(win.min).map { case (hv, p) => (p, hv) }
    }.toSet
  }

  test("winnowFingerprints equals the naive all-windows computation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "short text"), // fewer than k tokens → no fingerprints
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 5)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((id, text) <- Seq(
        0L -> "the quick brown fox jumps over the lazy dog again and again",
        1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2L -> "short text",
        3L -> "one two three four five six seven")) {
      assert(got.getOrElse(id, Set.empty) === naiveWinnow(text, 4, 5),
        s"doc $id winnow mismatch")
    }
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares " +
      "at least one fingerprint") {
    import spark.implicits._
    val shared = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val docs = Seq(
      (0L, s"prefix words here $shared and then a suffix"),
      (1L, s"completely different opening $shared closing words")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val a = fp.filter(_._1 == 0L).map(_._2).toSet
    val b = fp.filter(_._1 == 1L).map(_._2).toSet
    assert((a intersect b).nonEmpty,
      "shared 8-token run produced no common fingerprint")
  }

  test("winnowCandidatePairs: the df cap kills a synthetic boilerplate " +
      "fingerprint's quadratic bucket without losing genuine matches") {
    import spark.implicits._
    val boiler = "click here to subscribe to our free weekly newsletter today"
    val copied = "the secret recipe uses twelve herbs and spices blended slowly"
    // 30 docs share ONLY boilerplate; docs 100/101 additionally share a
    // genuine 10-token copied run (rare fingerprints)
    val docs = ((0 until 30).map { i =>
      (i.toLong, s"unique$i opening words number$i $boiler trailing$i close$i")
    } ++ Seq(
      (100L, s"first author wrote that $copied in the original text"),
      (101L, s"second author claims $copied near the conclusion section")
    )).toDF("doc_id", "text")
    val capped = TextAnalysis.winnowCandidatePairs(docs, "doc_id", "text",
        k = 4, w = 5, minShared = 1, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // genuine pair survives; no boilerplate-only pair does
    assert(capped === Set((100L, 101L)))
    // uncapped, the boilerplate bucket goes quadratic: all 30×29/2 pairs
    val uncapped = TextAnalysis.winnowCandidatePairs(docs, "doc_id", "text",
        k = 4, w = 5, minShared = 1, maxDf = Int.MaxValue).count()
    assert(uncapped >= 30L * 29 / 2,
      s"fixture broken: expected the quadratic bucket, got $uncapped")
  }

  test("stupidBackoffScores: hand-computed attested / backoff / OOV cases") {
    import spark.implicits._
    // ref (doc 0): trigram (a b c) ×2, (b c a) ×1, (c a b) ×1
    //   tokens: a b c a b c → N = 6
    //   c1: a=2 b=2 c=2; c2: "a b"=2 "b c"=2 "c a"=1
    //   c3: "a b c"=2 "b c a"=1 "c a b"=1
    val docs = Seq(
      (0L, "a b c a b c"), // ref slice (even id)
      (1L, "a b c"),       // attested: S = c3(abc)/c2(ab) = 2/2 = 1
      (3L, "x b c"),       // unattested tri; backoff c2(bc)/c1(b) = 2/2 → 0.4
      (5L, "x y z")        // fully OOV → 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffScores(docs, "doc_id", "text",
        refFilter = pmod(col("doc_id"), lit(2)) === 0)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 0 (ref): trigrams abc, bca, cab, abc → all attested:
    //   S(abc)=c3/c2(ab)=2/2=1 (×2), S(bca)=c3/c2(bc)=1/2=0.5,
    //   S(cab)=c3/c2(ca)=1/1=1 → mean 3.5/4 = 0.875
    assert(got(0L) === ((4L, 4L, 0.875)))
    assert(got(1L) === ((1L, 1L, 1.0)))
    assert(got(3L) === ((1L, 0L, 0.4)))
    assert(got(5L) === ((1L, 0L, 0.0)))
  }

  test("stupidBackoffScores: unigram backoff tier") {
    import spark.implicits._
    // ref: "a b c d"; scored doc "x y c": trigram (x y c) unattested,
    // bigram (y c) unattested, unigram of the PREDICTED word c1(c)=1,
    // N=4 → S = 0.4 * 0.4 * 1/4 = 0.04
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "x y c")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffScores(docs, "doc_id", "text",
        refFilter = pmod(col("doc_id"), lit(2)) === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) === 0.04)
  }
}
