package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {

  test("overlapSelfJoin equals the theta-join, emits each pair once, and " +
      "respects keys and closed endpoints") {
    import spark.implicits._
    val rows = Seq(
      // key A: 1-2 overlap across a bin boundary; 3 touches 2 at one
      // point (closed ends -> overlap); 4 is disjoint; 5 is a long
      // interval spanning many bins and overlapping 1, 2, 3, 4
      ("A", 1L, 10L, 22L),
      ("A", 2L, 20L, 30L),
      ("A", 3L, 30L, 35L),
      ("A", 4L, 50L, 55L),
      ("A", 5L, 0L, 60L),
      // key B: same coordinates as A's 1-2 but a different key — pairs
      // must not cross keys
      ("B", 6L, 10L, 22L),
      ("B", 7L, 100L, 101L)
    ).toDF("k", "id", "s", "e")
    val got = Intervals.overlapSelfJoin(rows, "k", "id", "s", "e",
        binWidth = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly-once: no duplicate pairs even though 1-2 and 5-anything
    // share several bins
    assert(got.length === got.toSet.size)
    // brute-force reference
    val local = Seq(("A", 1L, 10L, 22L), ("A", 2L, 20L, 30L),
      ("A", 3L, 30L, 35L), ("A", 4L, 50L, 55L), ("A", 5L, 0L, 60L),
      ("B", 6L, 10L, 22L), ("B", 7L, 100L, 101L))
    val expected = (for {
      (ka, ia, sa, ea) <- local
      (kb, ib, sb, eb) <- local
      if ka == kb && ia < ib && sa <= eb && sb <= ea
    } yield (ka, ia, ib)).toSet
    assert(got.toSet === expected)
    assert(expected.contains(("A", 2L, 3L))) // endpoint touch included
    assert(!expected.exists { case (_, a, b) => (a, b) == ((1L, 6L)) })
  }

  test("binWidth does not change the result, only the candidate shape") {
    import spark.implicits._
    val rows = (0L until 60L).map { i =>
      ("g", i, i * 3 % 40, i * 3 % 40 + i % 9)
    }.toDF("k", "id", "s", "e")
    val w7 = Intervals.overlapSelfJoin(rows, "k", "id", "s", "e", 7)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val w100 = Intervals.overlapSelfJoin(rows, "k", "id", "s", "e", 100)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val w1 = Intervals.overlapSelfJoin(rows, "k", "id", "s", "e", 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(w7 === w100)
    assert(w7 === w1)
  }
}
