package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  // 90% of rows share one hot key — the shape salting exists for.
  private lazy val skewed = {
    import spark.implicits._
    ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble)))
      .toDF("key", "value").repartition(8)
  }

  test("saltedSumCount equals the plain groupBy") {
    val plain = skewed.groupBy("key")
      .agg(round(sum("value"), 6).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(skewed, Seq("key"), "value", salts = 16)
      .select(col("key"), round(col("sum_value"), 6).as("s"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted === plain)
  }

  test("saltedJoin equals the plain inner join (row multiset)") {
    import spark.implicits._
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k5", "B"), ("nomatch", "X"))
      .toDF("key", "tag")
    val plain = skewed.join(dim, Seq("key"))
      .groupBy("key", "tag").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedJoin(skewed, dim, "key", salts = 8)
      .groupBy("key", "tag").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(salted === plain)
    // hot key present with full multiplicity
    assert(salted.exists { case (k, _, n) => k == "hot" && n == 900L })
  }

  test("keyHistogram surfaces the hot key first") {
    val top = Skew.keyHistogram(skewed, col("key"), topK = 3).collect()
    assert(top.head.getString(0) === "hot")
    assert(top.head.getDouble(2) === 0.9)
  }
}
