package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._

/** Embedding drift (PSI): histogram correctness against an independent
  * sign/bin recompute, the zero-drift identity, non-negativity, shift
  * sensitivity, determinism, and guards. The gate query `emb_drift_psi`
  * value-checks the full pipeline against DuckDB at sf0.01. */
class DriftSpec extends SparkSpec {

  import spark.implicits._

  // the Projection.sign convention, recomputed independently
  private def sign(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_${j}".getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    if (Integer.parseInt(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  private def vecsOf(rows: Seq[Seq[Double]]) = rows.toDF("v")

  test("projectionHistogram matches an independent sign/bin recompute") {
    val dim = 4
    val rows = Seq(
      Seq(1.0, 2.0, 3.0, 4.0),
      Seq(-1.0, 0.5, 0.25, 0.0),
      Seq(0.0, 0.0, 0.0, 0.0),
      Seq(10.0, -10.0, 10.0, -10.0))
    val got = Drift.projectionHistogram(vecsOf(rows), "v", dim,
        probe = 0, invWidth = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val signs = Array.tabulate(dim)(i => sign(i, 0))
    val expected = rows
      .map(v => math.floor(v.zip(signs).map { case (a, s) => a * s }.sum * 4).toInt)
      .groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    assert(got === expected)
  }

  test("identical snapshots have zero PSI in every bin; a shifted " +
      "snapshot does not; contributions are never negative") {
    val a = vecsOf((0 until 40).map(i => Seq(i / 40.0, 1.0, -0.5, 0.25)))
    val zero = Drift.psiReport(a, a, "v", 4)
    assert(zero.count() > 0)
    assert(zero.filter(col("psi_micro") =!= 0L).count() === 0L)

    val b = vecsOf((0 until 40).map(i => Seq(i / 40.0 + 5.0, 1.0, -0.5, 0.25)))
    val drift = Drift.psiReport(a, b, "v", 4)
    assert(drift.filter(col("psi_micro") < 0L).count() === 0L)
    val total = drift.agg(sum("psi_micro")).first().getLong(0)
    // disjoint bin ranges: both snapshots' mass sits in bins the other
    // never touches — PSI must be large (> 1.0 in nat units)
    assert(total > 1000000L, s"total=$total")
  }

  test("psiReport is deterministic and bins are exhaustive: counts sum " +
      "to the snapshot sizes") {
    val a = vecsOf((0 until 25).map(i => Seq(math.sin(i.toDouble), 0.5, i / 25.0, -1.0)))
    val b = vecsOf((0 until 30).map(i => Seq(math.cos(i.toDouble), -0.5, i / 30.0, 1.0)))
    val r1 = Drift.psiReport(a, b, "v", 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val r2 = Drift.psiReport(a, b, "v", 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(r1 === r2)
    assert(r1.map(_._2).sum === 25L)
    assert(r1.map(_._3).sum === 30L)
  }

  test("guards: empty snapshot and wrong dimension fail loudly") {
    val a = vecsOf(Seq(Seq(1.0, 2.0, 3.0, 4.0)))
    val empty = vecsOf(Seq.empty[Seq[Double]])
    intercept[IllegalArgumentException] {
      Drift.psiReport(a, empty, "v", 4)
    }
    val ragged = vecsOf(Seq(Seq(1.0, 2.0)))
    intercept[org.apache.spark.SparkException] {
      Drift.psiReport(a, ragged, "v", 4).collect()
    }
  }

  test("ksDistance: hand CDF case, identical-distribution zero, " +
      "empty group → null") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 4L))
      .toDF("g", "v")
    val r = Drift.ksDistance(df, "g", "v", "a", "b").first()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 2L, 0.5)))
    // identical samples → ks 0
    val same = Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L))
      .toDF("g", "v")
    assert(Drift.ksDistance(same, "g", "v", "a", "b")
      .first().getDouble(2) === 0.0)
    // group with no rows → null ks, not zero
    val r2 = Drift.ksDistance(df, "g", "v", "a", "zzz").first()
    assert(r2.getLong(1) === 0L && r2.isNullAt(2))
  }

  test("categoricalDrift: hand chi-square contributions; one-sided " +
      "category raises the alarm; chiSquareStat folds in order") {
    import spark.implicits._
    val cur = Seq("en", "en", "fr").toDF("lang")
    val ref = Seq("en", "fr", "fr", "fr").toDF("lang")
    val got = Drift.categoricalDrift(cur, ref, "lang").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // t_cur=3 t_ref=4 N=7; en row-total 3: e_cur=9/7, contribs 25/63, 25/84
    assert(got("en") === ((2L, 1L, 1.285714, 0.396825, 0.297619)))
    // fr row-total 4: e_cur=12/7, contribs 25/84, 25/112
    assert(got("fr") === ((1L, 3L, 1.714286, 0.297619, 0.223214)))
    val stat = Drift.chiSquareStat(
      Drift.categoricalDrift(cur, ref, "lang")).first()
    assert(stat.getLong(0) === 2L && stat.getLong(1) === 1L)
    // 0.396825 + 0.297619 + 0.297619 + 0.223214, rounded at 6dp
    assert(stat.getDouble(2) === 1.215277)
    // category present only in ref ("new language appeared"): nonzero
    // expected mass in cur → nonzero contribution
    val oneSided = Drift.categoricalDrift(Seq("en").toDF("lang"),
        Seq("en", "ru").toDF("lang"), "lang").collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(oneSided("ru") > 0.3)
  }

  test("centroidCosine: hand geometry — aligned ≈ 1, orthogonal = 0, " +
      "opposed = -1, and n columns are exact") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(3.0f, 0.0f)),
      ("b", Seq(2.0f, 0.0f)),                       // aligned with a
      ("c", Seq(0.0f, 5.0f)),                       // orthogonal to a
      ("d", Seq(-1.0f, 0.0f))                       // opposed to a
    ).toDF("seg", "vec")
    val out = Drift.centroidCosine(df, col("seg"), col("vec"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(math.abs(out(("a", "b"))._3 - 1.0) <= 1e-12)
    assert(out(("a", "c"))._3 === 0.0)
    assert(math.abs(out(("a", "d"))._3 + 1.0) <= 1e-12)
    assert(out(("a", "b"))._1 === 2L && out(("a", "b"))._2 === 1L)
    assert(out.size === 6) // all unordered pairs of 4 segments
  }

  test("centroidCosine fails loudly on null segments") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Some("a"), Seq(1.0f)), (None, Seq(2.0f)))
      .toDF("seg", "vec")
    val e = intercept[Exception] {
      Drift.centroidCosine(df, col("seg"), col("vec")).collect()
    }
    assert(e.getMessage.contains("segment must not be NULL") ||
      e.getCause != null)
  }

  test("centroidCosine is partitioning-invariant (integer sums + one " +
      "fp tree per pair)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(3)
    val df = (0 until 200).map(i =>
        (s"s${i % 4}", Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("seg", "vec")
    val one = Drift.centroidCosine(df.coalesce(1), col("seg"), col("vec"))
      .collect().map(_.toSeq).toSeq
    val many = Drift.centroidCosine(df.repartition(13), col("seg"),
      col("vec")).collect().map(_.toSeq).toSeq
    assert(one === many)
  }

  test("centroidCosine caps the driver sidecar: a data-grained segment " +
      "key fails loudly instead of collecting the corpus") {
    val df = (0 until 40).map(i => (s"doc$i", Seq(1.0, 2.0)))
      .toDF("seg", "vec")
    val e = intercept[IllegalArgumentException] {
      Drift.centroidCosine(df, col("seg"), col("vec"),
        maxSidecarRows = 16)
    }
    assert(e.getMessage.contains("data-grained"))
  }

  test("categoricalDrift fails loudly on an empty snapshot (NaN " +
      "contributions would silently pass any drift threshold)") {
    val cur = Seq("en", "pt").toDF("lang")
    val empty = cur.filter(lit(false))
    intercept[Exception] {
      Drift.categoricalDrift(cur, empty, "lang").collect()
    }
    intercept[Exception] {
      Drift.categoricalDrift(empty, cur, "lang").collect()
    }
  }
}
