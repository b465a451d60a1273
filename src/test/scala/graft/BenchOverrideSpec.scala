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

  test("kcore bench overrides: one shared mutual-edge stage, the " +
      "fixpoint witness holds on the production edge build too") {
    try {
      // the memo is compute-once: both entries must see the SAME
      // checkpointed table (reference equality — a second derivation
      // would mean the shared stage isn't shared)
      val e1 = graft.queries.SharedBenchStages.mutualKnnEdges(spark, sf)
      val e2 = graft.queries.SharedBenchStages.mutualKnnEdges(spark, sf)
      assert(e1 eq e2, "mutualKnnEdges must memoize per (session, dir)")
      // mutual edges are symmetric by construction
      val asym = e1.as("f").join(e1.as("b"),
        org.apache.spark.sql.functions.col("f.src") ===
          org.apache.spark.sql.functions.col("b.dst") &&
        org.apache.spark.sql.functions.col("f.dst") ===
          org.apache.spark.sql.functions.col("b.src"), "left_anti")
      assert(asym.count() === 0L, "mutual edge table must be symmetric")

      val core = SparkEntry.benchQueries("graph_kcore")(spark, sf)
        .collect()
      assert(core.nonEmpty, "2-core of the mutual cell graph is empty")
      assert(core.forall(_.getAs[Long]("core_degree") >= 2L),
        "every survivor retains >= k in-core neighbors")
      // the audit form is the 0-row fixpoint witness — it must hold on
      // the production edges exactly as on the gate's exact edges
      assert(SparkEntry.benchQueries("graph_kcore_audit")(spark, sf)
        .count() === 0L)
    } finally {
      graft.queries.SharedBenchStages.clear()
    }
  }

  test("flagship bench overrides: one shared WET + deduped-corpus " +
      "artifact pair, output-identical to the self-contained gate " +
      "forms, audit detectors still 0-row on the stored artifacts") {
    try {
      // compute-once: both entries must see the SAME checkpointed
      // artifacts (reference equality — a second derivation would mean
      // the shared stage isn't shared)
      val w1 = graft.queries.SharedBenchStages.crawlWet(spark, sf)
      val w2 = graft.queries.SharedBenchStages.crawlWet(spark, sf)
      assert(w1 eq w2, "crawlWet must memoize per (session, dir)")
      val c1 = graft.queries.SharedBenchStages.crawlDeduped(spark, sf)
      val c2 = graft.queries.SharedBenchStages.crawlDeduped(spark, sf)
      assert(c1 eq c2, "crawlDeduped must memoize per (session, dir)")
      // the packed output from the stored corpus equals the gate form's
      val gate = rows(
        SparkEntry.queries("pipeline_crawl_to_pack")(spark, sf))
      val bench = rows(
        SparkEntry.benchQueries("pipeline_crawl_to_pack")(spark, sf))
      assert(bench === gate,
        "bench override diverged for pipeline_crawl_to_pack")
      // the audit's detectors run over the stored artifacts and must
      // find the same nothing the gate form finds
      assert(SparkEntry.benchQueries("pipeline_crawl_audit")(spark, sf)
        .count() === 0L,
        "flagship invariant audit fired on the shared bench artifacts")
    } finally {
      graft.queries.SharedBenchStages.clear()
    }
  }

  test("catalog key discipline: every bench override and every oracle " +
      "keys an existing gate query — an orphan override would add an " +
      "UNGATED bench entry, an orphan oracle a dead driver row") {
    val qs = SparkEntry.queries.keySet
    val orphanOverrides = SparkEntry.benchQueries.keySet -- qs
    assert(orphanOverrides.isEmpty,
      s"bench overrides without a gate query: $orphanOverrides")
    val orphanOracles = SparkEntry.oracleSql.keySet -- qs
    assert(orphanOracles.isEmpty,
      s"oracles without a gate query: $orphanOracles")
    // and the RunTogether affinity groups must name real bench entries —
    // a typo would silently drop the co-session guarantee
    for (g <- Bench.runTogetherNames; n <- g)
      assert(SparkEntry.benchQueries.contains(n),
        s"RunTogether names unknown query: $n")
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

  test("contention canary: live readings decide when present, start " +
      "load only as the canary-less fallback, and readings are sane") {
    val p = BenchCanary.PinnedPriorSec
    // quiet run: low start load, every chunk at/below prior
    assert(!BenchCanary.contended(0.3, Seq(p, p * 0.9, p * 1.1), p))
    // a single mid-run BURST marks the run (the r14 chunk-10 shape)
    assert(BenchCanary.contended(0.3, Seq(p, p * 2.0, p), p))
    // one MODERATE sample is self-noise, not contention (a quiet
    // load-0.0 full run read one boundary at 1.38× among 26 clean)
    assert(!BenchCanary.contended(0.3, Seq(p, p * 1.5, p), p))
    // ...but two moderate samples are sustained contention
    assert(BenchCanary.contended(0.3, Seq(p, p * 1.5, p * 1.45), p))
    // an elevated start load with QUIET live canaries does NOT mark the
    // run: load1m decays from whatever just ended (the driver's own
    // verify pass always precedes its bench) — in-run measurement wins
    assert(!BenchCanary.contended(6.0, Seq(p, p * 1.1), p))
    // pre-loaded machine marks the run when there are NO canary
    // readings (SPARK_GRAFT_NO_CANARY) — the r12 start-load signature
    assert(BenchCanary.contended(6.0, Seq.empty, p))
    assert(!BenchCanary.contended(0.3, Seq.empty, p))
    // boundary: exactly at the threshold is NOT contended
    assert(!BenchCanary.contended(0.3, Seq(p * BenchCanary.ContendedRatio), p))
    // a real reading is positive, finite, and not absurdly long (the
    // fixed work is ~0.25 s quiet; 30 s would mean the workload
    // constant or the host changed under us)
    val sec = BenchCanary.once(4)
    assert(sec > 0.0 && sec.isFinite && sec < 30.0, s"canary read $sec s")
  }
}
