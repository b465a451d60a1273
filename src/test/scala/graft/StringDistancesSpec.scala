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

  test("damerauLevenshteinAtMost: banded verdict equals the full kernel " +
      "on randomized corpora for every k in 0..5, incl. long-range " +
      "transposition shapes and band-edge lengths") {
    val atMost = (a: String, b: String, k: Int) =>
      StringDistances.damerauLevenshteinAtMost(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"), k)
    val full = (a: String, b: String) =>
      StringDistances.damerauLevenshtein(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val rnd = new scala.util.Random(4242)
    val alpha = "abcd" // small alphabet → dense matches → da/db stress
    var checked = 0
    for (_ <- 1 to 4000) {
      val s1 = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(4))).mkString
      val s2 = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(4))).mkString
      val d = full(s1, s2)
      for (k <- 0 to 5) {
        assert(atMost(s1, s2, k) === (d <= k), s"atMost($s1, $s2, $k) d=$d")
        checked += 1
      }
    }
    // adversarial: strings built by k edits incl. transpositions with
    // intervening inserts (the Lowrance-Wagner long-range read) — the
    // banded kernel must still say true at k and the scratch must stay
    // poison-free across calls (dirty reuse is part of the contract)
    for (_ <- 1 to 500) {
      val base = Seq.fill(6 + rnd.nextInt(20))(
        ('a' + rnd.nextInt(26)).toChar).mkString
      var s = base
      val edits = rnd.nextInt(3)
      for (_ <- 1 to edits) rnd.nextInt(3) match {
        case 0 if s.length >= 2 => // transpose two adjacent chars
          val i = rnd.nextInt(s.length - 1)
          s = s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
        case 1 => // insert
          val i = rnd.nextInt(s.length + 1)
          s = s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + s.substring(i)
        case _ if s.nonEmpty => // substitute
          val i = rnd.nextInt(s.length)
          s = s.updated(i, ('a' + rnd.nextInt(26)).toChar)
        case _ => ()
      }
      val d = full(base, s)
      for (k <- 0 to 4)
        assert(atMost(base, s, k) === (d <= k), s"mut($base, $s, $k) d=$d")
    }
    // negative-control sanity on the counter itself
    assert(checked === 24000)
    // degenerate thresholds
    assert(!atMost("abc", "abc", -1))
    assert(atMost("", "", 0))
    assert(!atMost("", "abc", 2) && atMost("", "abc", 3))
  }

  test("damerauLevenshteinAtMost: k 0..8 × length-skew hardening " +
      "(VERDICT r15 #4) — |la−lb| at the band-width boundary, " +
      "transposition sources pushed to the band edge, k ≥ max length") {
    val atMost = (a: String, b: String, k: Int) =>
      StringDistances.damerauLevenshteinAtMost(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"), k)
    val full = (a: String, b: String) =>
      StringDistances.damerauLevenshtein(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val rnd = new scala.util.Random(1616)
    // (1) exact length-skew boundary: |la−lb| ∈ {k−1, k, k+1} for every
    // k in 0..8 — d ≥ |la−lb| makes the skew the band's own edge (the
    // band-safety proof's first case), k+1 pins the early-exit side
    for (k <- 0 to 8; skew <- Seq(k - 1, k, k + 1); if skew >= 0;
         _ <- 1 to 40) {
      val la = 1 + rnd.nextInt(24)
      val s1 = Seq.fill(la)(('a' + rnd.nextInt(4)).toChar).mkString
      val s2 = Seq.fill(la + skew)(('a' + rnd.nextInt(4)).toChar).mkString
      val d = full(s1, s2)
      assert(atMost(s1, s2, k) === (d <= k), s"skew($s1,$s2,$k) d=$d")
      assert(atMost(s2, s1, k) === (d <= k), s"skewSym($s2,$s1,$k) d=$d")
    }
    // (2) transposition source AT the band edge: one adjacent
    // transposition plus k−1 front inserts of a char outside the base
    // alphabet — the inserts displace the transposition's Lowrance-
    // Wagner source cell to the band's far diagonal (|kk−l| = k−1),
    // the guarded long-range read's worst case
    for (k <- 1 to 8; _ <- 1 to 60) {
      val base = Seq.fill(6 + rnd.nextInt(20))(
        ('a' + rnd.nextInt(6)).toChar).mkString
      val i = rnd.nextInt(base.length - 1)
      val tra = base.substring(0, i) + base(i + 1) + base(i) +
        base.substring(i + 2)
      val s = ("z" * (k - 1)) + tra
      val d = full(base, s)
      assert(d <= k, s"construction invariant broke: d=$d > k=$k")
      for (kk <- math.max(0, d - 1) to (k + 1))
        assert(atMost(base, s, kk) === (d <= kk),
          s"edgeTra($base,$s,$kk) d=$d")
    }
    // (3) k at and beyond the string lengths (band covers the whole
    // matrix — the banded kernel must degrade to the full verdict)
    for (_ <- 1 to 200) {
      val s1 = Seq.fill(rnd.nextInt(7))(('a' + rnd.nextInt(3)).toChar).mkString
      val s2 = Seq.fill(rnd.nextInt(7))(('a' + rnd.nextInt(3)).toChar).mkString
      val d = full(s1, s2)
      for (k <- Seq(6, 7, 8, 20))
        assert(atMost(s1, s2, k) === (d <= k), s"wide($s1,$s2,$k) d=$d")
    }
  }

  test("damerauLevAtMost column: codegen path in a real plan matches " +
      "the kernel verdict; null-intolerant") {
    val df = Seq(
      (1L, Some("small ring"), Some("small rind")),
      (2L, Some("ab"), Some("ba")),
      (3L, Some("abcdef"), Some("xbcdyz")),
      (4L, None: Option[String], Some("x"))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        StringDistances.damerauLevAtMost(col("a"), col("b"), 2).as("ok"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
    assert(got === Array((1L, Some(true)), (2L, Some(true)),
      (3L, Some(false)), (4L, None)))
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

  // ── jaro / jaroWinkler ─────────────────────────────────────────────────

  /** Independent JW reference in "functional" style (index sets instead
    * of flag arrays) — structurally different from the while-loop
    * production kernel. */
  private def refJw(sa: String, sb: String): Double = {
    val a = sa.getBytes("UTF-8"); val b = sb.getBytes("UTF-8")
    if (a.isEmpty || b.isEmpty) return 0.0
    val win = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val taken = scala.collection.mutable.SortedSet.empty[Int]
    val pairs = a.indices.flatMap { i =>
      (math.max(0, i - win) until math.min(b.length, i + win + 1))
        .find(j => !taken(j) && a(i) == b(j))
        .map { j => taken += j; (i, j) }
    }
    val m = pairs.length
    if (m == 0) return 0.0
    val aChars = pairs.map(p => a(p._1))
    val bChars = pairs.map(_._2).sorted.map(b(_))
    val t = aChars.zip(bChars).count { case (x, y) => x != y } / 2
    val j = (m.toDouble / a.length + m.toDouble / b.length +
      (m - t).toDouble / m) / 3.0
    if (j <= 0.7) j
    else {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.length
      j + l * 0.1 * (1.0 - j)
    }
  }

  test("jaroWinkler: DuckDB-pinned values — boost gate at exactly 0.7, " +
      "prefix cap 4, byte-grain unicode, empty-string zero") {
    val f = (a: String, b: String) =>
      StringDistances.jaroWinkler(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    assert(f("martha", "marhta") === 0.9611111111111111)
    assert(f("dixon", "dicksonx") === 0.8133333333333332)
    assert(f("dwayne", "duane") === 0.8400000000000001)
    assert(f("", "") === 0.0)          // DuckDB convention, not 1.0
    assert(f("", "a") === 0.0)
    assert(f("abc", "abc") === 1.0)
    assert(f("ab", "ba") === 0.0)      // window 0: no matches
    // jaro exactly at the gate boundary on one side of it:
    assert(f("abcdefgh", "abcdzzzz") === 0.6666666666666666) // no boost
    assert(f("x", "xxxxxxxxxx") === 0.7300000000000001)      // boosted
    // prefix 5 capped to 4:
    assert(f("abcdefghi", "abcdezzzz") === 0.8222222222222222)
    assert(f("über", "uber") === 0.7833333333333333) // ü = 2 bytes
  }

  test("jaroWinkler agrees with the independent reference on randomized " +
      "corpora (exact doubles); symmetric") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcde "
    for (_ <- 1 to 2000) {
      val s1 = Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(6))).mkString
      val s2 = Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(6))).mkString
      val got = StringDistances.jaroWinkler(
        s1.getBytes("UTF-8"), s2.getBytes("UTF-8"))
      assert(got === refJw(s1, s2), s"jw($s1, $s2)")
      assert(got === StringDistances.jaroWinkler(
        s2.getBytes("UTF-8"), s1.getBytes("UTF-8")), s"symmetry $s1/$s2")
    }
  }

  test("jaroWinklerCol: codegen path in a real plan matches the kernel; " +
      "null-intolerant") {
    val df = Seq(
      (1L, Some("martha"), Some("marhta")),
      (2L, Some("ab"), Some("ba")),
      (3L, None: Option[String], Some("x")),
      (4L, Some("x"), None: Option[String])
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        StringDistances.jaroWinklerCol(col("a"), col("b")).as("s"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got === Array((1L, Some(0.9611111111111111)), (2L, Some(0.0)),
      (3L, None), (4L, None)))
  }
}
