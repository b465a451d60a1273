package graft

import graft.operators.{DataQuality, Sync}
import graft.operators.DataQuality._
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkReport: every check family counts its violations exactly") {
    val dim = Seq(1L, 2L).toDF("k")
    val df = Seq(
      (Some(1L), Some(5.0), "AB", 1L),
      (Some(1L), Some(50.0), "Ab", 2L),   // dup key, range + regex fail
      (None, None, null, 3L)              // null key, null range, null regex
    ).toDF("key", "x", "s", "ref")
      .withColumn("ref2", when(col("ref") === 3L, 9L).otherwise(col("ref")))
    val got = DataQuality.checkReport(df, Seq(
        NotNull("key"),
        InRange("x", 0.0, 10.0),
        Matches("s", "^[A-Z]+$"),
        Unique(Seq("key")),
        ForeignKey("ref2", dim, "k")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(got("not_null:key") === ((1L, 3L, false)))
    assert(got("in_range:x") === ((2L, 3L, false)))    // 50.0 + null
    assert(got("matches:s") === ((2L, 3L, false)))     // "Ab" + null
    assert(got("unique:key") === ((1L, 3L, false)))    // one surplus row
    assert(got("foreign_key:ref2") === ((1L, 3L, false))) // 9 not in dim
    // all-green table
    val clean = Seq((1L, 1.0)).toDF("key", "x")
    val ok = DataQuality.checkReport(clean,
        Seq(NotNull("key"), InRange("x", 0.0, 2.0), Unique(Seq("key"))))
      .collect()
    assert(ok.forall(_.getBoolean(3)))
    intercept[IllegalArgumentException] {
      DataQuality.checkReport(clean, Nil)
    }
  }

  test("snapshotDiff: added/removed/changed with column attribution; " +
      "unchanged keys dropped") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (5L, "e", 50.0)).toDF("k", "t", "v")
    val after = Seq((1L, "a", 10.0),          // unchanged → dropped
      (2L, "B", 20.0),                        // t changed
      (3L, "c", 31.0),                        // v changed
      (4L, "d", 40.0)                         // added
    ).toDF("k", "t", "v")                     // 5 removed
    val got = Sync.snapshotDiff(before, after, Seq("k"), Seq("t", "v"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toList))
    assert(got === Array(
      (2L, "changed", List("t")),
      (3L, "changed", List("v")),
      (4L, "added", Nil),
      (5L, "removed", Nil)))
  }
}
