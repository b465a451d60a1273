package graft

import graft.operators.Bitext
import org.apache.spark.sql.functions._

class BitextSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")

  test("a planted near-identical cross-corpus pair mines with a high " +
      "margin; unrelated vectors do not") {
    val rnd = new scala.util.Random(5)
    def noise() = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    val planted = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    val jitter = planted.zipWithIndex.map { case (x, i) =>
      x + (if (i == 0) 0.01f else 0.0f) }
    val src = df((0L, planted) +: Seq.tabulate(9)(i =>
      ((i + 1).toLong, noise())))
    val tgt = df((100L, jitter) +: Seq.tabulate(9)(i =>
      ((i + 101).toLong, noise())))
    val out = Bitext.marginPairs(src, tgt, "vec_id", "embedding",
      k = 3, minMargin = 1.2).collect()
    assert(out.exists(r => r.getLong(0) === 0L && r.getLong(1) === 100L),
      s"planted pair not mined: ${out.toSeq}")
    // the planted pair's margin dominates every other mined pair
    val plantedMargin = out.find(r =>
      r.getLong(0) == 0L && r.getLong(1) == 100L).get.getDouble(3)
    out.filterNot(r => r.getLong(0) == 0L && r.getLong(1) == 100L)
      .foreach(r => assert(r.getDouble(3) < plantedMargin))
  }

  test("margin formula is the exact-integer single division " +
      "(hand-checkable 1-NN case)") {
    // 2-dim unit vectors: src x = (1,0); tgt y1 = (1,0), y2 = (0,1).
    // k=1: cosµ(x,y1)=1e6, cosµ(x,y2)=0; sx = 1e6 (top-1 vs y1);
    // sy1 = 1e6 (its best src is x); margin(x,y1) = 2·1e6/(2e6) = 1.0
    val src = df(Seq((0L, Seq(1.0f, 0.0f))))
    val tgt = df(Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.0f, 1.0f))))
    val all = Bitext.marginPairs(src, tgt, "vec_id", "embedding",
      k = 1, minMargin = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(all.toSet === Set((0L, 10L, 1000000L, 1.0)))
  }

  test("hub suppression: at EQUAL cosine to x, the hub target (close " +
      "to every source) scores a lower margin than the unique target") {
    // src x sits on e4; srcs a,b crowd e1. Targets h and u have the
    // SAME cosine to x (≈0.436), but h is also close to a,b (a hub),
    // so h's own k-NN sum inflates its denominators — the mechanism
    // Artetxe-Schwenk margins exist for.
    val srcs = Seq(
      (0L, Seq(0f, 0f, 0f, 1.0f)),          // x
      (1L, Seq(0.9f, 0.436f, 0f, 0f)),      // a (near e1)
      (2L, Seq(0.9f, -0.436f, 0f, 0f)))     // b (near e1)
    val tgts = Seq(
      (100L, Seq(0.9f, 0f, 0f, 0.436f)),    // h: hub (e1 + some e4)
      (101L, Seq(0f, 0f, 0.9f, 0.436f)),    // u: unique (e3 + some e4)
      (102L, Seq(0.95f, 0.31f, 0f, 0f)),    // decoys near e1 so the
      (103L, Seq(0.31f, 0.95f, 0f, 0f)))    // src side has k=2 real NNs
    val out = Bitext.marginPairs(df(srcs), df(tgts),
        "vec_id", "embedding", k = 2, minMargin = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val hubMargin = out((0L, 100L))
    val uniqueMargin = out((0L, 101L))
    assert(uniqueMargin > 1.2, s"unique pair not mined: $uniqueMargin")
    assert(hubMargin < 1.0, s"hub pair not suppressed: $hubMargin")
    assert(uniqueMargin > hubMargin)
  }

  test("mutualTopPairs keeps only reciprocal best matches") {
    // x0's best is y0 and vice versa (planted alignment); x1's best is
    // ALSO y0 (one-sided) → x1 mines nothing; y1 pairs with nobody
    val src = df(Seq(
      (0L, Seq(1.0f, 0f, 0f)),
      (1L, Seq(0.9f, 0.436f, 0f))))
    val tgt = df(Seq(
      (10L, Seq(0.99f, 0f, 0.141f)),
      (11L, Seq(0f, 0f, 1.0f))))
    val out = Bitext.mutualTopPairs(src, tgt, "vec_id", "embedding",
        k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((0L, 10L)))
  }

  test("mutualTopPairs ⊆ the margin table and agrees with a " +
      "driver-side argmax replay on random data") {
    val rnd = new scala.util.Random(17)
    val src = df(Seq.tabulate(25)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1))))
    val tgt = df(Seq.tabulate(25)(i =>
      (200L + i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))))
    val all = Bitext.marginPairs(src, tgt, "vec_id", "embedding",
        k = 3, minMargin = Double.MinValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // replay best-by-(margin desc, id) on both sides
    val bestT = all.groupBy(_._1).map { case (s0, rs) =>
      s0 -> rs.minBy(r => (-r._3, r._2))._2 }
    val bestS = all.groupBy(_._2).map { case (t0, rs) =>
      t0 -> rs.minBy(r => (-r._3, r._1))._1 }
    val expect = bestT.collect {
      case (s0, t0) if bestS.get(t0).contains(s0) => (s0, t0) }.toSet
    val got = Bitext.mutualTopPairs(src, tgt, "vec_id", "embedding",
        k = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect && got.nonEmpty)
  }

  test("marginPairsCells with ONE cell reproduces the exact form " +
      "bit-for-bit; with many cells margins only grow (dominance)") {
    val rnd = new scala.util.Random(23)
    val src = df(Seq.tabulate(20)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1))))
    val tgt = df(Seq.tabulate(20)(i =>
      (100L + i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))))
    val exact = Bitext.marginPairs(src, tgt, "vec_id", "embedding",
        k = 3, minMargin = Double.MinValue)
      .orderBy("src_id", "tgt_id").collect().map(_.toSeq).toSeq
    val one = Bitext.marginPairsCells(src, tgt, "vec_id", "embedding",
        k = 3, minMargin = Double.MinValue, ncells = 1)
      .orderBy("src_id", "tgt_id").collect().map(_.toSeq).toSeq
    assert(one === exact)
    // many cells: in the positive regime (cos > 0, both margins > 0 —
    // where all mining happens) a candidate margin dominates its exact
    // margin (candidate k-NN sums are subsets); negative cosines are
    // out of the operator's documented regime
    val cells = Bitext.marginPairsCells(src, tgt, "vec_id", "embedding",
        k = 3, minMargin = Double.MinValue, ncells = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val exactM = exact.map(s0 => (s0(0), s0(1)) -> s0(3)).toMap
    val positives = cells.filter { case (pair, (cosU, m)) =>
      cosU > 0 && m > 0 &&
        exactM((pair._1, pair._2)).asInstanceOf[Double] > 0 }
    assert(positives.nonEmpty)
    positives.foreach { case (pair, (_, m)) =>
      val em = exactM((pair._1, pair._2)).asInstanceOf[Double]
      assert(m >= em, s"$pair: cells=$m exact=$em")
    }
  }

  test("partitioning-invariant (integer sums, one fp division)") {
    val rnd = new scala.util.Random(9)
    val src = df(Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1))))
    val tgt = df(Seq.tabulate(30)(i =>
      (100L + i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))))
    val one = Bitext.marginPairs(src.coalesce(1), tgt.coalesce(1),
        "vec_id", "embedding", k = 3, minMargin = 1.0)
      .orderBy("src_id", "tgt_id").collect().map(_.toSeq).toSeq
    val many = Bitext.marginPairs(src.repartition(7), tgt.repartition(5),
        "vec_id", "embedding", k = 3, minMargin = 1.0)
      .orderBy("src_id", "tgt_id").collect().map(_.toSeq).toSeq
    assert(one === many && one.nonEmpty)
  }
}
