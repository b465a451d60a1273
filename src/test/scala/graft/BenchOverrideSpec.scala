package graft

import org.apache.spark.sql.DataFrame

/** The bench-only shared-stage forms (SharedBenchStages memo) must stay
  * OUTPUT-IDENTICAL to the gate forms they stand in for — the bench is a
  * measurement of the same computation, not a different computation.
  * (The sampled audit overrides are exempt by design: they deliberately
  * probe a slice; these three are full-output swaps.) */
class BenchOverrideSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => math.rint(d * 1e9) / 1e9
      case x => x
    }.toSeq).toSeq

  test("shared-pair-stage overrides equal the gate forms " +
      "(dedup_clusters / dedup_apply / dedup_apply_best)") {
    try {
      for (name <- Seq("dedup_clusters", "dedup_apply", "dedup_apply_best",
          "dedup_soft_weights")) {
        val gate = rows(SparkEntry.queries(name)(spark, sf))
        val bench = rows(SparkEntry.benchQueries(name)(spark, sf))
        assert(bench === gate, s"bench override diverged for $name")
      }
    } finally {
      // clear() also unpersists the memo's pinned checkpoint blocks —
      // this shared test session lives on, and nothing else may drop a
      // pinned id
      graft.queries.SharedBenchStages.clear()
    }
  }

  test("priors parsing is per-pair: one malformed numeric token keeps " +
      "its pair out without discarding the rest (ADVICE r11)") {
    val good = Bench.parsePriors("""{"a": 1.5, "b": 2, "c": 3e-1}""")
    assert(good === Map("a" -> 1.5, "b" -> 2.0, "c" -> 0.3))
    // "b"'s value is junk ("1.2.3" matches the pair regex but not
    // toDouble) — a and c must survive
    val part = Bench.parsePriors("""{"a": 1.5, "b": 1.2.3, "c": 4}""")
    assert(part === Map("a" -> 1.5, "c" -> 4.0))
    // non-finite overflow values are dropped, not propagated
    assert(Bench.parsePriors("""{"a": 1e999, "b": 2}""")
      === Map("b" -> 2.0))
    assert(Bench.parsePriors("") === Map.empty)
    assert(Bench.parsePriors("not json at all") === Map.empty)
  }
}
