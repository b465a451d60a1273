package graft

import graft.operators.Boilerplate
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("wordWindows: fixed-width chunks, short tail, empty text") {
    val d = Seq((1L, "a b c d e f g h i j"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        Boilerplate.wordWindows(col("text"), 4).as("segs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("a b c d", "e f g h", "i j"))
    assert(got(2L) === Seq("a b"))
    assert(got(3L) === Seq("")) // split("", " ") = [""] — one empty seg
    intercept[IllegalArgumentException] {
      d.select(Boilerplate.wordWindows(col("text"), 0))
    }
  }

  test("stripFrequentSegments: frequent segs stripped everywhere, order " +
      "kept, all-boilerplate doc empties, rare docs untouched") {
    // "x x" opens docs 2,3,4 (df=3); "q q" appears twice in doc 5 but
    // only in doc 5 (df=1 — WITHIN-doc repetition is not boilerplate).
    val d = Seq(
      (1L, "a b c d"),
      (2L, "x x p2 t2"),
      (3L, "x x p3 t3"),
      (4L, "x x"),
      (5L, "q q q q")).toDF("doc_id", "text")
    val got = Boilerplate.stripFrequentSegments(d, "doc_id",
        Boilerplate.wordWindows(col("text"), 2), minDocs = 3L)
      .select(col("doc_id"), col("clean_segs"), col("clean_text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getString(2))))
      .toMap
    assert(got(1L) === ((Seq("a b", "c d"), "a b c d")))
    assert(got(2L) === ((Seq("p2 t2"), "p2 t2")))
    assert(got(3L) === ((Seq("p3 t3"), "p3 t3")))
    assert(got(4L) === ((Seq.empty[String], "")))   // fully boilerplate
    assert(got(5L) === ((Seq("q q", "q q"), "q q q q")))
    // order preservation when the stripped segment is in the middle
    val mid = Seq((1L, "u1 a x b"), (2L, "u2 b x a"), (3L, "c c x d"))
      .toDF("doc_id", "text")
    val g2 = Boilerplate.stripFrequentSegments(mid, "doc_id",
        split(col("text"), " "), minDocs = 3L)
      .select(col("doc_id"), col("clean_text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g2 === Map(1L -> "u1 a b", 2L -> "u2 b a", 3L -> "c c d"))
  }

  test("stripFrequentSegments guards: minDocs floor, reserved columns, " +
      "maxFrequent cap fails loudly") {
    val d = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Boilerplate.stripFrequentSegments(d, "doc_id",
        split(col("text"), " "), minDocs = 1L)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.stripFrequentSegments(d.withColumn("clean_text", lit("")),
        "doc_id", split(col("text"), " "), minDocs = 2L)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.stripFrequentSegments(d, "doc_id",
        split(col("text"), " "), minDocs = 2L, maxFrequent = 0L)
    }
  }
}
