package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs equals the exhaustive theta-join at k=1 and k=2") {
    import spark.implicits._
    val words = Seq("karin", "karen", "kaern", "carin", "bob", "bobb",
      "alice", "alicia", "xyz", "karenn", "kren", "")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistancePairs(df, "id", "name", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expected = (for {
        (a, i) <- words.zipWithIndex
        (b, j) <- words.zipWithIndex
        if i < j && lev(a, b) <= k
      } yield (i.toLong, j.toLong, lev(a, b))).toSet
      assert(got === expected, s"maxDist=$k")
    }
  }

  test("deletion-neighborhood recall is 1 on randomized near pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // seeded: replayable
    for (_ <- 1 to 5) {
      val words = Seq.fill(20)(
        Seq.fill(1 + rnd.nextInt(7))("abc" (rnd.nextInt(3))).mkString)
        .distinct
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "name")
      val got = FuzzyJoin.editDistancePairs(df, "id", "name", 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (a, i) <- words.zipWithIndex; (b, j) <- words.zipWithIndex
        if i < j && lev(a, b) <= 1
      } yield (i.toLong, j.toLong)).toSet
      assert(got === expected, s"words=$words")
    }
  }

  test("linkage matches cross-table pairs and respects the threshold") {
    import spark.implicits._
    val left = Seq((1L, "smith"), (2L, "jones"), (3L, "brown"))
      .toDF("lid", "lname")
    val right = Seq((10L, "smyth"), (11L, "jonas"), (12L, "green"),
      (13L, "browne")).toDF("rid", "rname")
    val got = FuzzyJoin.linkage(left, "lid", "lname",
        right, "rid", "rname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 10L, 1), (2L, 11L, 1), (3L, 13L, 1)))
  }

  test("linkage maxBlock caps low-entropy hot blocks on both sides") {
    import spark.implicits._
    val left = (0L until 4L).map(i => (i, "same")).toDF("lid", "lname")
    val right = (10L until 14L).map(i => (i, "same")).toDF("rid", "rname")
    val capped = FuzzyJoin.linkage(left, "lid", "lname",
      right, "rid", "rname", maxDist = 1, maxBlock = Some(5)).count()
    val full = FuzzyJoin.linkage(left, "lid", "lname",
      right, "rid", "rname", maxDist = 1).count()
    assert(capped === 0L)
    assert(full === 16L)
  }

  test("maxBlock drops oversized blocks instead of exploding them") {
    import spark.implicits._
    // 6 identical strings -> one block of size > cap; with the cap the
    // block is dropped (0 pairs), without it all 15 pairs emit
    val df = (0L until 6L).map(i => (i, "same")).toDF("id", "name")
    val capped = FuzzyJoin.editDistancePairs(df, "id", "name", 1,
      maxBlock = Some(5)).count()
    val full = FuzzyJoin.editDistancePairs(df, "id", "name", 1).count()
    assert(capped === 0L)
    assert(full === 15L)
  }

  test("candidate join keys on the variant hash, not the variant string") {
    import spark.implicits._
    val df = Seq((1L, "karin"), (2L, "karen")).toDF("id", "name")
    val joins = FuzzyJoin.editDistancePairs(df, "id", "name", 1)
      .queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
    // the first (bottom-most) join is the candidate self-join: every
    // equi-key must be the 8-byte hash column, never the variant text
    val cand = joins.last
    val keys = cand.condition.toSeq.flatMap(_.collect {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a
    })
    assert(keys.exists(_.name == "h"))
    assert(!keys.exists(_.name == "v"))
  }
  test("sortedNeighborhoodPairs: exact vs a naive global-order replay, " +
      "including pairs across range-partition boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, substring}
    // 60 names over a tight key space forces pairs to straddle the
    // 8 range partitions; window 4 spans boundaries constantly
    val rows = (0L until 60L).map { i =>
      val base = s"name${'$'}{i / 3}" // triples sharing a prefix
      (i, if (i % 3 == 0) base else base + ("x" * (i % 3).toInt))
    }
    val df = rows.toDF("id", "name").repartition(8)
    val got = FuzzyJoin.sortedNeighborhoodPairs(df, "id", "name",
        substring(col("name"), 1, 5), window = 4, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // naive replay: global (key, id) sort, all pairs within rank
    // distance < 4, banded levenshtein
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val sorted = rows.sortBy { case (id, n) => (n.take(5), id) }
    val expected = (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + 4, sorted.length)
      dist = lev(sorted(i)._2, sorted(j)._2) if dist <= 2
    } yield (sorted(i)._1, sorted(j)._1, dist)).toSet
    assert(got === expected)
  }
}
