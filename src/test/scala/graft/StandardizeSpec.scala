package graft

import graft.operators.Standardize
import org.apache.spark.sql.functions._

class StandardizeSpec extends SparkSpec {
  import spark.implicits._

  test("dimStats: exact integer sums per dimension") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, -2.0f))
    ).toDF("id", "v")
    val got = Standardize.dimStats(df, "v")
      .orderBy("pos")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).longValueExact()))
    // pos 0: 1e6 + 3e6; sq: 1e12 + 9e12. pos 1: 2e6 - 2e6; sq: 2*4e12
    assert(got === Array(
      (0, 2L, 4000000L, 10000000000000L),
      (1, 2L, 0L, 8000000000000L)))
  }

  test("zScores: hand-computed z; constant dimension emits 0, not NaN") {
    val df = Seq(
      (1L, Seq(1.0f, 7.0f)),
      (2L, Seq(3.0f, 7.0f))
    ).toDF("id", "v")
    val got = Standardize.zScores(df, "id", "v")
      .orderBy("id", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // pos 0: mean 2e6, sd 1e6 → z = ±1; pos 1 constant → z = 0
    assert(got === Array((1L, 0, -1.0), (1L, 1, 0.0),
      (2L, 0, 1.0), (2L, 1, 0.0)))
  }

  test("zScores: layout and partitioning never change a bit (integer sums)") {
    val rows = (0 until 200).map(i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17) % 13 - 6) / 3.0f)))
    val a = Standardize.zScores(rows.toDF("id", "v"), "id", "v")
      .orderBy("id", "pos").select("z").as[Double].collect()
    val b = Standardize.zScores(
        rows.reverse.toDF("id", "v").repartition(7), "id", "v")
      .orderBy("id", "pos").select("z").as[Double].collect()
    assert(a.sameElements(b))
  }

  test("zScores population: mean of z is 0 and variance ~1 per dimension") {
    val rows = (0 until 100).map(i =>
      (i.toLong, Seq((i % 10).toFloat, (i % 7).toFloat)))
    val z = Standardize.zScores(rows.toDF("id", "v"), "id", "v", decimals = 8)
    val stats = z.groupBy("pos")
      .agg(avg("z").as("m"), avg(col("z") * col("z")).as("v2"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    stats.foreach { case (m, v2) =>
      assert(math.abs(m) < 1e-6, s"mean $m should be ~0")
      assert(math.abs(v2 - 1.0) < 1e-6, s"E[z²] $v2 should be ~1")
    }
  }
}
