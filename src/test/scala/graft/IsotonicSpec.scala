package graft

import graft.operators.Isotonic
import org.apache.spark.sql.functions._

class IsotonicSpec extends SparkSpec {

  private def fitOn(rows: Seq[(Double, Int)]) = {
    import spark.implicits._
    Isotonic.fit(rows.toDF("score", "label"), col("score"), col("label"))
      .orderBy("score")
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  }

  /** O(g³) minimax reference: fitted(i) = max_{j≤i} min_{k≥i} mean. */
  private def minimax(groups: Seq[(Long, Long)]): Seq[Double] = {
    val g = groups.toArray
    g.indices.map { i =>
      (0 to i).map { j =>
        (i until g.length).map { k =>
          val n = (j to k).map(g(_)._1).sum
          val p = (j to k).map(g(_)._2).sum
          p.toDouble / n.toDouble
        }.min
      }.max
    }
  }

  test("already-monotone data is returned unchanged") {
    val out = fitOn(Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)))
    assert(out.map(_._4).toSeq === Seq(0.0, 0.0, 1.0, 1.0))
  }

  test("a single violation pools to the block mean") {
    // means 1, 0 at scores 1, 2 → pooled to 1/2 each
    val out = fitOn(Seq((1.0, 1), (2.0, 0)))
    assert(out.map(_._4).toSeq === Seq(0.5, 0.5))
  }

  test("cascading violations pool transitively (textbook case)") {
    // per-score means: 1, 1, 0, 0, 1 → PAV: first four pool to 1/2,
    // wait — 1,1 then 0,0 violates; pooling (1,1,0,0) → 1/2; last 1
    // stays above → fitted = .5 .5 .5 .5 1
    val out = fitOn(Seq((1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0), (5.0, 1)))
    assert(out.map(_._4).toSeq === Seq(0.5, 0.5, 0.5, 0.5, 1.0))
  }

  test("fit aggregates duplicate scores into one group first") {
    val out = fitOn(Seq((1.0, 1), (1.0, 0), (1.0, 0), (2.0, 1)))
    assert(out.length === 2)
    assert(out(0) === ((1.0, 3L, 1L, 1.0 / 3.0)))
    assert(out(1) === ((2.0, 1L, 1L, 1.0)))
  }

  test("invariants on the testdata fit: monotone, mean-preserving, " +
      "bounded, and equal to the minimax characterization") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001",
      "documents")
    val out = Isotonic.fit(docs, col("n_chars").cast("double"),
        when(col("lang") === "en", 1).otherwise(0))
      .orderBy("score").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length > 10)
    // monotone non-decreasing
    out.sliding(2).foreach { w =>
      assert(w(0)._4 <= w(1)._4, s"${w(0)} then ${w(1)}")
    }
    // mean preservation: Σ n·fitted = Σ n_pos (exact blocks → the sums
    // agree to fp roundoff of the per-block products)
    val lhs = out.map(r => r._2 * r._4).sum
    val rhs = out.map(_._3).sum.toDouble
    assert(math.abs(lhs - rhs) <= 1e-6, s"$lhs vs $rhs")
    out.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0))
    // the closed-form oracle formula agrees value-for-value
    val ref = minimax(out.map(r => (r._2, r._3)).toSeq)
    out.map(_._4).zip(ref).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"group $i: pav=$a minimax=$b")
    }
  }

  test("randomized agreement with the minimax reference") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val g = 2 + rnd.nextInt(12)
      val rows = (0 until g).flatMap { i =>
        val n = 1 + rnd.nextInt(4)
        (0 until n).map(_ => (i.toDouble, rnd.nextInt(2)))
      }
      val out = fitOn(rows)
      val ref = minimax(out.map(r => (r._2, r._3)).toSeq)
      assert(out.map(_._4).toSeq === ref,
        s"rows=$rows out=${out.toSeq}")
    }
  }

  test("calibrate applies the step function with below-range clamp " +
      "and null passthrough") {
    import spark.implicits._
    val fit = Isotonic.fit(
      Seq((1.0, 0), (2.0, 0), (3.0, 1)).toDF("score", "label"),
      col("score"), col("label"))
    val applied = Isotonic.calibrate(
      Seq(Some(0.5), Some(1.0), Some(2.5), Some(3.0), Some(9.0), None)
        .toDF("score"), fit, col("score"))
      .orderBy(col("score").asc_nulls_first)
      .collect()
    // fitted: 0 at 1, 0 at 2, 1 at 3
    assert(applied(0).isNullAt(1)) // null score
    assert(applied(1).getDouble(1) === 0.0) // 0.5 clamps to first block
    assert(applied(2).getDouble(1) === 0.0) // exact hit 1.0
    assert(applied(3).getDouble(1) === 0.0) // 2.5 steps down to 2.0
    assert(applied(4).getDouble(1) === 1.0) // exact hit 3.0
    assert(applied(5).getDouble(1) === 1.0) // above range → last block
  }

  test("maxGroups guard fires without collecting the distinct-score " +
      "set (limit probe, not post-collect check)") {
    import spark.implicits._
    val five = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 1))
      .toDF("score", "label")
    val e = intercept[IllegalArgumentException] {
      Isotonic.fit(five, col("score"), col("label"), maxGroups = 3)
    }
    assert(e.getMessage.contains("quantize the score column"))
    // at exactly the bound the fit succeeds
    assert(Isotonic.fit(five, col("score"), col("label"), maxGroups = 5)
      .count() === 5)
  }

  test("calibrate maps NaN scores to null, never to the first block") {
    import spark.implicits._
    val fit = Isotonic.fit(
      Seq((1.0, 0), (2.0, 1)).toDF("score", "label"),
      col("score"), col("label"))
    val r = Isotonic.calibrate(
      Seq(Double.NaN).toDF("score"), fit, col("score")).first()
    assert(r.isNullAt(1))
  }

  test("non-binary or null labels fail loudly") {
    import spark.implicits._
    val bad = Seq((1.0, 2)).toDF("score", "label")
    val e = intercept[Exception] {
      Isotonic.fit(bad, col("score"), col("label")).collect()
    }
    assert(e.getMessage.contains("label must be 0 or 1") ||
      e.getCause != null)
  }
}
