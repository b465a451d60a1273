package graft

import graft.operators.Ranking
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed scores on a 3-doc corpus") {
    val docs = Seq(
      (1L, "spark join spark"),  // tf(spark)=2, dl=3
      (2L, "join window"),       // tf(join)=1, dl=2
      (3L, "nothing relevant here at all") // dl=5, no match
    ).toDF("doc_id", "text")
    val got = Ranking.bm25(docs, "doc_id", "text", Seq("spark", "join"),
        k1 = 1.25, b = 0.75, topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // N=3, avgdl=10/3. spark: df=1, idf=ln(1+2.5/1.5); join: df=2,
    // idf=ln(1+1.5/2.5). part = idf*tf*2.25/(tf+1.25*(0.25+0.75*dl/avgdl))
    def part(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
      idf * (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * (dl / (10.0 / 3))))
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Map(
      1L -> r6(part(2, 1, 3) + part(1, 2, 3)), // spark then join: term asc
      2L -> r6(part(1, 2, 2)))
    assert(got.keySet === want.keySet) // doc 3 absent: no matching term
    got.foreach { case (id, s) => assert(s === want(id), s"doc $id") }
  }

  test("bm25: longer docs score lower at equal tf (length normalization)") {
    val docs = Seq(
      (1L, "spark alpha"),
      (2L, "spark alpha beta gamma delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "text")
    val got = Ranking.bm25(docs, "doc_id", "text", Seq("spark"), topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(1L) > got(2L))
  }

  test("rrfFuse: hand fusion, absent-list ids still rank, order by id on ties") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2)).toDF("id", "rank")
    val got = Ranking.rrfFuse(Seq(a, b), kRrf = 60, topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s10 = r8(1.0 / 61 + 1.0 / 62)
    val s20 = r8(1.0 / 62 + 1.0 / 61)
    val s30 = r8(1.0 / 63)
    // 10 and 20 tie exactly (symmetric ranks) → id asc breaks it
    assert(got === Array((10L, s10, 1), (20L, s20, 2), (30L, s30, 3)))
  }

  test("maxSim: per-query max then ordered sum; bag structure matters") {
    val docVecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)), // doc 1 spans both axes
      (2L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))  // doc 2 only axis x
    ).toDF("doc", "v")
    val queries = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f))
    ).toDF("qid", "qv")
    val got = Ranking.maxSim(docVecs, "doc", "v", queries, "qid", "qv",
        topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 1: max cos vs q0 = 1, vs q1 = 1 → 2.0; doc 2: 1 + 0 → 1.0
    assert(got === Array((1L, 2.0), (2L, 1.0)))
  }

  test("guards: empty query, bad topN, bad kRrf fail loudly") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Ranking.bm25(df, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Ranking.bm25(df, "doc_id", "text", Seq("x"), topN = 0)
    }
    intercept[IllegalArgumentException] { Ranking.rrfFuse(Nil) }
    intercept[IllegalArgumentException] {
      Ranking.rrfFuse(Seq(Seq((1L, 1)).toDF("id", "rank")), kRrf = 0)
    }
  }
}
