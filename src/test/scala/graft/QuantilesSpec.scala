package graft

import graft.operators.Quantiles
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("cutpointScores: hand case — 8 distinct values into quartiles") {
    // values 1..8, k=4: cutpoints are the ceil(p*8/4)-th order stats
    // = 2nd, 4th, 6th values = 2, 4, 6; score = 1 + #{cuts < v}
    val df = (1 to 8).map(v => (v.toLong, v.toDouble)).toDF("id", "x")
    val got = Quantiles.cutpointScores(df, "x", 4, "s")
      .select($"id", $"s").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(got === Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
  }

  test("cutpointScores: ties are bucket-STABLE — equal values share a " +
      "bucket even when ntile would split them") {
    // six copies of 5 and two of 9, k=2: the median order statistic is 5,
    // so every 5 scores 1 and every 9 scores 2 — ntile(2) would push two
    // of the 5s into bucket 2 by sort position
    val df = (Seq.fill(6)(5.0) ++ Seq.fill(2)(9.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val got = Quantiles.cutpointScores(df, "x", 2, "s")
      .select($"x", $"s").collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(got.filter(_._1 == 5.0).forall(_._2 == 1))
    assert(got.filter(_._1 == 9.0).forall(_._2 == 2))
  }

  test("cutpointScores: descending flag gives bucket 1 to the largest") {
    val df = (1 to 8).map(v => (v.toLong, v.toDouble)).toDF("id", "x")
    val got = Quantiles.cutpointScores(df, "x", 4, "s", ascending = false)
      .select($"id", $"s").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(got(8L) === 1 && got(7L) === 1)
    assert(got(1L) === 4 && got(2L) === 4)
  }

  test("cutpointScores equals ntile on tie-free data (random)") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(200)(rnd.nextDouble()).distinct
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    val k = 4
    val nt = df.withColumn("nt",
      ntile(k).over(Window.orderBy($"x")))
    val got = Quantiles.cutpointScores(nt, "x", k, "s")
      .select($"nt", $"s").collect()
    // tie-free + n divisible assumptions don't exactly hold (n=200 is
    // divisible by 4, values distinct) — the two definitions coincide
    got.foreach(r => assert(r.getInt(0) === r.getInt(1),
      s"ntile=${r.getInt(0)} cutpoint=${r.getInt(1)}"))
  }

  test("cutpointScores: layout independence (repartition does not move " +
      "any score)") {
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(25)))
      .zipWithIndex.map { case ((a, b), i) => (i.toLong, (a * 3 + b).toDouble) }
      .toDF("id", "x")
    val a = Quantiles.cutpointScores(df, "x", 4, "s")
      .select($"id", $"s").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    val b = Quantiles.cutpointScores(df.repartition(7), "x", 4, "s")
      .select($"id", $"s").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(a === b)
  }

  test("cutpointScores fails LOUDLY on NULL values (a null would score " +
      "bucket 1 and shift every cutpoint silently)") {
    val d = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "v")
    intercept[Exception] {
      Quantiles.cutpointScores(d, "v", 2, "s").collect()
    }
  }
}
