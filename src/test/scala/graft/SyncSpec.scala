package graft

import graft.operators.Sync
import org.apache.spark.sql.functions._

class SyncSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("identical replicas produce zero differing buckets") {
    val a = docs((1L, "x"), (2L, "y"), (3L, "z"))
    assert(Sync.bucketDiff(a, a, col("id").cast("string"), col("text"),
      nBuckets = 4).count() === 0L)
  }

  test("a missing row flags exactly its key's bucket (count mismatch)") {
    val a = docs((1L, "x"), (2L, "y"), (3L, "z"))
    val b = docs((1L, "x"), (3L, "z"))
    val diff = Sync.bucketDiff(a, b, col("id").cast("string"), col("text"),
        nBuckets = 4)
      .collect()
    assert(diff.length === 1)
    val r = diff(0)
    assert(r.getLong(r.fieldIndex("left_cnt")) ===
      r.getLong(r.fieldIndex("right_cnt")) + 1)
  }

  test("a modified payload flags the bucket by CHECKSUM (counts equal)") {
    val a = docs((1L, "x"), (2L, "y"))
    val b = docs((1L, "x"), (2L, "y-modified"))
    val diff = Sync.bucketDiff(a, b, col("id").cast("string"), col("text"),
        nBuckets = 4)
      .collect()
    assert(diff.length === 1)
    val r = diff(0)
    assert(r.getLong(r.fieldIndex("left_cnt")) ===
      r.getLong(r.fieldIndex("right_cnt")))
    assert(r.getLong(r.fieldIndex("left_check")) !==
      r.getLong(r.fieldIndex("right_check")))
  }

  test("summaries are layout-independent (repartitioned replica matches)") {
    val a = docs((1L to 50L).map(i => (i, s"text$i")): _*)
    assert(Sync.bucketDiff(a, a.repartition(7), col("id").cast("string"),
      col("text"), nBuckets = 8).count() === 0L)
  }

  test("null-payload drift is detected (null-safe summary comparison)") {
    import spark.implicits._
    // left has (k, null), right has (k, "x"): left's checksum XORs over
    // only nulls -> NULL; a null-unsafe compare would filter the bucket
    val a = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val b = Seq((1L, "x")).toDF("id", "text")
    assert(Sync.bucketDiff(a, b, col("id").cast("string"), col("text"),
      nBuckets = 1).count() === 1L)
  }

  test("incremental aggregate state: chained delta merges equal the " +
      "from-scratch recompute, including keys new in a delta") {
    import spark.implicits._
    import graft.operators.IncrementalAgg
    val b1 = Seq((1L, 10.5), (1L, 2.25), (2L, 3.0)).toDF("k", "v")
    val d1 = Seq((2L, 4.0), (3L, 7.75)).toDF("k", "v") // 3 is new
    val d2 = Seq((1L, 0.5)).toDF("k", "v")
    val s0 = IncrementalAgg.countSumState(b1, Seq("k"), "v")
    val s1 = IncrementalAgg.mergeCountSum(s0, d1, Seq("k"), "v")
    val s2 = IncrementalAgg.mergeCountSum(s1, d2, Seq("k"), "v")
    val full = IncrementalAgg.countSumState(
      b1.unionByName(d1).unionByName(d2), Seq("k"), "v")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        r.getDecimal(2).stripTrailingZeros()))).toMap
    assert(m(s2) === m(full))
    assert(m(s2)(3L)._1 === 1L)
  }

  test("boundary-shifted drift is detected (key/payload hash separately)") {
    import spark.implicits._
    // same concatenation "a|b|c" under a joint delimiter scheme — these
    // replicas MUST still diff
    val a = Seq(("a|b", "c")).toDF("id", "text")
    val b = Seq(("a", "b|c")).toDF("id", "text")
    // use 1 bucket so both rows definitely land together
    assert(Sync.bucketDiff(a, b, col("id"), col("text"), nBuckets = 1)
      .count() === 1L)
  }
}
