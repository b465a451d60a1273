package graft

import graft.operators.{BinaryQuant, SimilaritySearch}
import org.apache.spark.sql.functions._

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Double] = xs

  test("signWordsOf packs strict-positive bits into 32-bit words") {
    // dim 3: bits 0,2 set (x>0); 0.0 and negatives clear
    assert(BinaryQuant.signWordsOf(vec(1.0, -1.0, 0.5), 3) === Seq(5L))
    assert(BinaryQuant.signWordsOf(vec(0.0, -0.0, -2.0), 3) === Seq(0L))
    // bit 31 set → word value 2^31, positive in a long (the 32-bit pack's
    // whole point: no sign-bit overflow for oracle engines)
    val hi = Seq.fill(31)(-1.0) :+ 1.0
    assert(BinaryQuant.signWordsOf(hi, 32) === Seq(1L << 31))
    // dim 33 → two words, second holds bit 0
    assert(BinaryQuant.signWordsOf(hi :+ 1.0, 33) === Seq(1L << 31, 1L))
  }

  test("signWords column form agrees with the driver-side pack on every corpus vector") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.0f, 3.0f)),
      (2L, Seq(-1.0f, -1.0f, -1.0f, -1.0f)),
      (3L, Seq(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("id", "v")
    val got = df.select(col("id"),
        BinaryQuant.signWords(col("v").cast("array<double>"), 4).as("code"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = Map(
      1L -> BinaryQuant.signWordsOf(vec(1.0, -2.0, 0.0, 3.0), 4),
      2L -> BinaryQuant.signWordsOf(vec(-1.0, -1.0, -1.0, -1.0), 4),
      3L -> BinaryQuant.signWordsOf(vec(0.5, 0.5, 0.5, 0.5), 4))
    assert(got === want)
  }

  test("hammingDistance counts differing sign bits exactly") {
    val df = Seq((Seq(0L, 0L), Seq(5L, 1L))).toDF("a", "b")
    // 5 xor 0 = 101b (2 bits), 1 xor 0 = 1 bit → 3
    assert(df.select(BinaryQuant.hammingDistance(col("a"), col("b")))
      .as[Long].head() === 3L)
    val same = Seq((Seq(123L), Seq(123L))).toDF("a", "b")
    assert(same.select(BinaryQuant.hammingDistance(col("a"), col("b")))
      .as[Long].head() === 0L)
  }

  test("hammingTopK: self at distance 0, orthant flip at distance dim") {
    val base = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    val df = Seq(
      (0L, base.map(_.toFloat)),
      (1L, base.map(x => (-x).toFloat)),            // all signs flipped
      (2L, (base.updated(0, -1.0)).map(_.toFloat))  // one sign flipped
    ).toDF("id", "v")
    val got = BinaryQuant.hammingTopK(df, "id", "v", 8, base, k = 3)
      .as[(Long, Long)].collect()
    assert(got === Array((0L, 0L), (2L, 1L), (1L, 8L)))
  }

  test("hammingRerankTopK at full coarseK equals exact topK; recall floor pinned at sf0.001") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).first()
      .getSeq[Double](0).toArray.toSeq
    val n = emb.count().toInt
    // coarseK = corpus size → rerank IS exact search
    val all = BinaryQuant.hammingRerankTopK(emb, "vec_id", "embedding",
      64, q, k = 10, coarseK = n).as[(Long, Double)].collect()
    val exact = SimilaritySearch.topK(emb, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect()
    assert(all === exact)
    // production shape: coarse 50 of 500 — pin the measured recall so the
    // 0-row gate contract (dominance) is backed by a raw value here
    val got = BinaryQuant.hammingRerankTopK(emb, "vec_id", "embedding",
        64, q, k = 10, coarseK = 50)
      .as[(Long, Double)].collect().map(_._1).toSet
    val hits = exact.map(_._1).count(got)
    assert(hits >= 6,
      s"hamming-coarse recall@10 degraded: $hits/10 (was 8/10 when pinned)")
  }

  test("guards: bad k, coarseK < k, bad dim fail loudly") {
    val df = Seq((0L, Seq(1.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      BinaryQuant.hammingTopK(df, "id", "v", 1, Seq(1.0), k = 0)
    }
    intercept[IllegalArgumentException] {
      BinaryQuant.hammingRerankTopK(df, "id", "v", 1, Seq(1.0), k = 5,
        coarseK = 4)
    }
    intercept[IllegalArgumentException] {
      BinaryQuant.signWordsOf(Seq(1.0), 0)
    }
  }
}
