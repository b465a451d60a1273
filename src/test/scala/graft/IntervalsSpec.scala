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

  test("the binned join plans as an equi-join; the naive theta form " +
      "plans a nested loop") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => ("g" + i % 5, i, i % 40, i % 40 + 5))
      .toDF("k", "id", "s", "e")
    def hasBNLJ(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin")
    val binned = Intervals.overlapSelfJoin(rows, "k", "id", "s", "e", 7)
    assert(!hasBNLJ(binned),
      "binned interval join must not degrade to a nested loop")
    // the join it replaces: key equality + range predicates only — no
    // equi-usable condition beyond k, so small tables broadcast and big
    // ones go cartesian-per-key
    val naive = rows.as("a").join(rows.as("b"),
      col("a.k") === col("b.k") && col("a.id") < col("b.id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
    val naivePlan = naive.queryExecution.executedPlan.toString
    // Spark does use the k equi-key via SMJ/SHJ when present; strip the
    // key to show the raw range join's fate
    val keyless = rows.as("a").join(rows.as("b"),
      col("a.id") < col("b.id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
    assert(hasBNLJ(keyless),
      s"expected the pure range join to plan a nested loop")
    // and the binned result still matches the naive keyed join
    assert(binned.collect().map(r => (r.getLong(1), r.getLong(2))).toSet ===
      naive.select(col("a.id"), col("b.id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(naivePlan.nonEmpty)
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

  test("overlapJoin (two-table) equals the theta-join, once per pair, " +
      "across bin widths") {
    import spark.implicits._
    val lrows = Seq(("A", 1L, 10L, 22L), ("A", 2L, 0L, 60L),
      ("A", 3L, 30L, 35L), ("B", 4L, 5L, 6L))
    val rrows = Seq(("A", 10L, 20L, 30L), ("A", 11L, 22L, 22L),
      ("A", 12L, 61L, 70L), ("B", 13L, 6L, 9L), ("C", 14L, 0L, 100L))
    val left = lrows.toDF("k", "lid", "s", "e")
    val right = rrows.toDF("k", "rid", "s", "e")
    val expected = (for {
      (ka, ia, sa, ea) <- lrows
      (kb, ib, sb, eb) <- rrows
      if ka == kb && sa <= eb && sb <= ea
    } yield (ia, ib)).toSet
    for (bw <- Seq(1L, 7L, 100L)) {
      val got = Intervals.overlapJoin(left, right, "k", "lid", "rid",
          "s", "e", binWidth = bw)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(got.length === got.toSet.size, s"dup pairs at binWidth=$bw")
      assert(got.toSet === expected, s"binWidth=$bw")
    }
  }

  test("malformed intervals fail loudly instead of corrupting the result") {
    import spark.implicits._
    val inverted = Seq(("g", 1L, 50L, 10L)).toDF("k", "id", "s", "e")
    val e1 = intercept[Exception] {
      Intervals.overlapSelfJoin(inverted, "k", "id", "s", "e", 7).collect()
    }
    assert(e1.getMessage.contains("overlapSelfJoin")
      || Option(e1.getCause).exists(_.getMessage.contains("overlapSelfJoin")),
      e1.getMessage)
    // a sentinel open-ended interval would build a huge bin array
    val sentinel = Seq(("g", 1L, 0L, 9000000L)).toDF("k", "id", "s", "e")
    val e2 = intercept[Exception] {
      Intervals.overlapSelfJoin(sentinel, "k", "id", "s", "e", 7,
        maxBinsPerRow = 1024).collect()
    }
    assert(e2.getMessage.contains("overlapSelfJoin")
      || Option(e2.getCause).exists(_.getMessage.contains("overlapSelfJoin")),
      e2.getMessage)
  }

  test("mergeIslands: touching endpoints join, gaps split, nesting and " +
    "duplicates collapse; coverage sums only distinct timeline") {
    import spark.implicits._
    val iv = Seq(
      // key 1: [1,5]+[5,9] touch → island [1,9]; [11,12] separate;
      //        [2,3] nested inside the first island; duplicate [1,5]
      (1L, 1L, 5L), (1L, 5L, 9L), (1L, 11L, 12L), (1L, 2L, 3L), (1L, 1L, 5L),
      // key 2: single interval
      (2L, 100L, 104L))
      .toDF("k", "s", "e")
    val islands = Intervals.mergeIslands(iv, "k", "s", "e")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(islands === Array(
      (1L, 1L, 1L, 9L, 4L), (1L, 2L, 11L, 12L, 1L),
      (2L, 1L, 100L, 104L, 1L)))
    val cov = Intervals.coverage(iv, "k", "s", "e")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(cov === Array((1L, 2L, 9L, 8L), (2L, 1L, 4L, 4L)))
  }

  test("mergeIslands rejects inverted and null-bounded intervals loudly") {
    import spark.implicits._
    val inverted = Seq((1L, 9L, 5L)).toDF("k", "s", "e")
    val e1 = intercept[Exception] {
      Intervals.mergeIslands(inverted, "k", "s", "e").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e1).contains("mergeIslands"), msgs(e1))
    val nullB = Seq((2L, Some(1L), None: Option[Long])).toDF("k", "s", "e")
    val e2 = intercept[Exception] {
      Intervals.mergeIslands(nullB, "k", "s", "e").collect()
    }
    assert(msgs(e2).contains("mergeIslands"), msgs(e2))
  }

  test("mergeIslands matches a sequential sweep replay on random data, " +
    "independent of input partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val iv = Seq.fill(600) {
      val k = rnd.nextInt(5).toLong
      val s = rnd.nextInt(200).toLong
      (k, s, s + rnd.nextInt(12).toLong)
    }
    // reference: per-key sequential sweep over (start, end)-sorted rows
    val expected = iv.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sorted
      val islands = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)] // (start, end, nRows)
      for ((s, e) <- sorted) {
        if (islands.nonEmpty && s <= islands.last._2) {
          val (is, ie, n) = islands.last
          islands(islands.length - 1) = (is, math.max(ie, e), n + 1)
        } else islands += ((s, e, 1L))
      }
      islands.zipWithIndex.map { case ((s, e, n), i) =>
        (k, (i + 1).toLong, s, e, n)
      }
    }.toSeq.sorted
    for (nPart <- Seq(1, 7)) {
      val got = Intervals.mergeIslands(
          iv.toDF("k", "s", "e").repartition(nPart), "k", "s", "e")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSeq.sorted
      assert(got === expected, s"partitioning $nPart diverged")
    }
  }
}
