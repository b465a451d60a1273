package graft

import graft.functions.StringDistances
import org.apache.spark.sql.functions._

class StringDistancesSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: textbook Lowrance-Wagner with a map-based
    * "last seen row per byte" — structurally different from the flat-
    * array production kernel, so agreement is evidence, not tautology. */
  private def ref(sa: String, sb: String): Int = {
    val a = sa.getBytes("UTF-8"); val b = sb.getBytes("UTF-8")
    val inf = a.length + b.length
    val d = Array.fill(a.length + 2, b.length + 2)(0)
    d(0)(0) = inf
    for (i <- 0 to a.length) { d(i + 1)(0) = inf; d(i + 1)(1) = i }
    for (j <- 0 to b.length) { d(0)(j + 1) = inf; d(1)(j + 1) = j }
    val da = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    for (i <- 1 to a.length) {
      var db = 0
      for (j <- 1 to b.length) {
        val k = da(b(j - 1) & 0xff); val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = Seq(
          d(i)(j) + cost, d(i + 1)(j) + 1, d(i)(j + 1) + 1,
          d(k)(l) + (i - k - 1) + 1 + (j - l - 1)).min
      }
      da(a(i - 1) & 0xff) = i
    }
    d(a.length + 1)(b.length + 1)
  }

  test("damerauLevenshtein: known values incl. the full-DL (not OSA) " +
      "pin and byte-grain unicode") {
    val f = (a: String, b: String) =>
      StringDistances.damerauLevenshtein(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    assert(f("", "") === 0)
    assert(f("", "abc") === 3)
    assert(f("abc", "") === 3)
    assert(f("abc", "abc") === 0)
    assert(f("ab", "ba") === 1)        // adjacent transposition
    assert(f("abcd", "acbd") === 1)
    assert(f("CA", "ABC") === 2)       // full DL; OSA would say 3
    assert(f("kitten", "sitting") === 3)
    assert(f("widget", "wigdet") === 1)
    assert(f("café", "cafe") === 2)    // é is 2 UTF-8 bytes (DuckDB pin)
  }

  test("damerauLevenshtein: agrees with the independent reference on " +
      "randomized corpora; symmetric") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    for (_ <- 1 to 2000) {
      val s1 = Seq.fill(rnd.nextInt(8))(alpha(rnd.nextInt(4))).mkString
      val s2 = Seq.fill(rnd.nextInt(8))(alpha(rnd.nextInt(4))).mkString
      val got = StringDistances.damerauLevenshtein(
        s1.getBytes("UTF-8"), s2.getBytes("UTF-8"))
      assert(got === ref(s1, s2), s"dl($s1, $s2)")
      assert(got === StringDistances.damerauLevenshtein(
        s2.getBytes("UTF-8"), s1.getBytes("UTF-8")), s"symmetry $s1/$s2")
    }
  }

  test("damerauLev column: codegen path in a real plan matches the " +
      "kernel; null-intolerant") {
    val df = Seq(
      (1L, Some("small ring"), Some("small rind")),
      (2L, Some("ab"), Some("ba")),
      (3L, None: Option[String], Some("x")),
      (4L, Some("x"), None: Option[String])
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        StringDistances.damerauLev(col("a"), col("b")).as("d"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(got === Array((1L, Some(1)), (2L, Some(1)),
      (3L, None), (4L, None)))
  }
}
