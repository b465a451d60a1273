package graft

/** Pins load-bearing PHYSICAL-plan properties of round-7 queries — the
  * ones whose performance rests on plan shape, not just operator code.
  * A Catalyst upgrade or an innocent-looking query edit that breaks one
  * of these would keep results correct while silently reintroducing a
  * 3-10× cost; this spec turns that into a named failure. */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("j_fuzzy_dl: the O(mn) DP is the LAST conjunct in the join " +
      "condition — cheap predicates evaluate first") {
    val plan = executedPlan("j_fuzzy_dl")
    val cond = plan.linesIterator
      .find(l => l.contains("Join") && l.contains("damerau_levenshtein"))
      .getOrElse("")
    assert(cond.nonEmpty, "join condition with the DP not found")
    // the length prune must appear BEFORE the DP call in the conjunction
    val at = cond.indexOf("damerau_levenshtein")
    val lenAt = cond.indexOf("length")
    assert(lenAt >= 0 && lenAt < at,
      s"length prune is not ahead of the DP: $cond")
  }

  test("j_fuzzy_jw: jaro_winkler is the last conjunct behind the " +
      "length-ratio prune") {
    val plan = executedPlan("j_fuzzy_jw")
    val cond = plan.linesIterator
      .find(l => l.contains("Join") && l.contains("jaro_winkler"))
      .getOrElse("")
    assert(cond.nonEmpty)
    val at = cond.indexOf("jaro_winkler")
    val lenAt = cond.indexOf("length")
    assert(lenAt >= 0 && lenAt < at,
      s"length prune is not ahead of jaro_winkler: $cond")
  }

  test("docs_winnow: one data exchange feeds the single window pass " +
      "(maxp rides the scan as size(ws)-k since r16); distinct reuses " +
      "the doc partitioning") {
    val plan = executedPlan("docs_winnow")
    // exchanges: one hashpartitioning(doc_id) + the presentation sort's
    // rangepartitioning — and nothing else
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"docs_winnow grew a third exchange:\n$plan")
    assert(plan.linesIterator.count(_.contains("Window ")) === 1,
      s"docs_winnow no longer runs exactly one window pass:\n$plan")
  }

  test("s2_scan_pushdown: filters still reach the parquet scan") {
    val plan = executedPlan("s2_scan_pushdown")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "LessThan(l_quantity,3.0)]") ||
      plan.contains("LessThan(l_quantity,3.0)"),
      s"pushdown lost:\n${plan.take(2000)}")
  }

  test("q1_agg: partial/final aggregation (map-side combine present)") {
    val plan = executedPlan("q1_agg")
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, "partial+final HashAggregate pair missing")
  }

  test("q19_disjunctive: the quantity OR-disjunction reaches the scan " +
      "as a pushed filter; the part side broadcasts") {
    val plan = executedPlan("q19_disjunctive")
    assert(plan.contains("Or(LessThanOrEqual(l_quantity,11.0)") ||
      plan.contains("PushedFilters: [Or("),
      s"OR pushdown lost:\n${plan.take(2500)}")
    assert(plan.contains("BroadcastHashJoin"),
      "part side no longer broadcasts")
  }

  test("TPC-H adaptations keep their declared join strategies: q4 " +
      "semi, q22 anti, q7/q8 broadcast dims, q13 outer") {
    assert(executedPlan("q4_order_priority").contains("LeftSemi"),
      "q4 lost the semi join")
    assert(executedPlan("q22_churned_customers").contains("LeftAnti"),
      "q22 lost the anti join")
    for (q <- Seq("q7_nation_volume", "q8_market_share"))
      assert(executedPlan(q).contains("BroadcastHashJoin"),
        s"$q dimensions no longer broadcast")
    val q13 = executedPlan("q13_order_distribution")
    assert(q13.contains("LeftOuter"), "q13 lost the outer join")
  }

  test("TPC-H r9 additions keep their declared strategies: q16 anti + " +
      "broadcast dims, q20 semi, q9 broadcast dims, q21 no subquery " +
      "re-scan") {
    val q16 = executedPlan("q16_supplier_counts")
    assert(q16.contains("LeftAnti"), "q16 lost the NOT-IN anti join")
    assert(q16.contains("BroadcastHashJoin"),
      "q16 part/exclusion dims no longer broadcast")
    assert(executedPlan("q20_excess_shipments").contains("LeftSemi"),
      "q20 lost the IN-subquery semi join")
    assert(executedPlan("q9_product_profit").contains("BroadcastHashJoin"),
      "q9 dimensions no longer broadcast")
    // the EXISTS/NOT-EXISTS pair is decorrelated into ONE per-order
    // aggregate: the plan must not contain a nested-loop join, and the
    // supplier probe stays broadcast
    val q21 = executedPlan("q21_waiting_suppliers")
    assert(!q21.contains("BroadcastNestedLoopJoin") &&
      !q21.contains("CartesianProduct"),
      "q21 regressed to a nested-loop/cartesian plan")
    assert(q21.contains("BroadcastHashJoin"),
      "q21 supplier probe no longer broadcast")
    // q2's correlated MIN decorrelates into a per-part aggregate joined
    // back on equality — no nested-loop, dims broadcast
    val q2 = executedPlan("q2_min_cost_supplier")
    assert(!q2.contains("BroadcastNestedLoopJoin") &&
      !q2.contains("CartesianProduct"),
      "q2 regressed to a nested-loop/cartesian plan")
    assert(q2.contains("BroadcastHashJoin"),
      "q2 dimensions no longer broadcast")
    assert(executedPlan("q11_important_stock")
      .contains("BroadcastHashJoin"),
      "q11 dimensions no longer broadcast")
  }

  test("multimodal_phash_pairs: banded equi-join, no nested-loop " +
      "cartesian — the LSH shape holds in the physical plan") {
    val plan = executedPlan("multimodal_phash_pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"phash pair generation fell back to a non-equi join:\n${plan.take(2000)}")
    assert(plan.contains("Join"), "no join found at all")
    // the hash is the NATIVE expression, not a UDF wrapper — dhash64
    // appears in a projection and no ScalaUDF/BatchEval node exists
    assert(plan.contains("dhash64"), "native dhash64 expression missing")
    assert(!plan.contains("UDF"),
      s"phash regressed to a UDF:\n${plan.take(2000)}")
  }

  test("docs_gopher_rules and docs_c4_clean are single-stage: the only " +
      "exchange is the presentation sort — text never shuffles") {
    for (q <- Seq("docs_gopher_rules", "docs_c4_clean")) {
      val plan = executedPlan(q)
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 1, s"$q grew a data exchange:\n${plan.take(2000)}")
      assert(!plan.contains("UDF"), s"$q regressed to a UDF")
    }
  }

  test("docs_gopher_repetition: all stages keyed, no nested-loop or " +
      "cartesian fallback") {
    val plan = executedPlan("docs_gopher_repetition")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"repetition fell back to a non-equi join:\n${plan.take(2000)}")
  }

  test("a_interval_coverage: the window's key exchange serves BOTH " +
      "aggregations — islands and rollup add no shuffle") {
    val plan = executedPlan("a_interval_coverage")
    // hashpartitioning(l_suppkey) for the window; rangepartitioning for
    // the presentation orderBy — the (key, island) and (key) aggregates
    // must reuse the window's clustering (subset rule), not re-exchange
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2,
      s"coverage grew an aggregation exchange:\n${plan.take(3000)}")
    assert(plan.linesIterator.count(_.contains("Window ")) >= 1)
  }

  test("KmvSketch.groupSketches: partial/final aggregation pair — the " +
      "shuffle carries one sketch buffer per task per group, not rows") {
    import org.apache.spark.sql.functions.col
    val ev = graft.queries.Tables.t(spark, sf, "events")
    val plan = graft.operators.KmvSketch.groupSketches(ev,
        col("user_id"), Seq("event_type"), k = 64)
      .queryExecution.executedPlan.toString
    // udaf aggregators plan as ObjectHashAggregate; the map-side
    // partial must exist so the exchange moves ≤ 8k-byte buffers
    val aggs = plan.linesIterator
      .count(l => l.contains("ObjectHashAggregate") ||
        l.contains("SortAggregate"))
    assert(aggs >= 2, s"partial+final pair missing:\n${plan.take(2000)}")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"sketch agg grew exchanges:\n${plan.take(2000)}")
  }

  test("docs_luhn_mask: single-stage projection — the Luhn fold stays " +
      "in one codegen'd scan pass, no shuffle before the presentation " +
      "sort") {
    val plan = executedPlan("docs_luhn_mask")
    // only the orderBy(doc_id) range exchange is allowed
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1 &&
      exchanges.head.contains("rangepartitioning"),
      s"luhn mask grew a shuffle:\n${plan.take(2000)}")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"),
      "luhn left the built-in expression path")
  }

  test("a_group_topk: NO window — the bounded-heap aggregator plans as " +
      "partial+final ObjectHashAggregate") {
    val plan = executedPlan("a_group_topk")
    assert(!plan.contains("Window"),
      s"group top-k regressed to a window:\n${plan.take(2000)}")
    val aggs = plan.linesIterator
      .count(l => l.contains("ObjectHashAggregate") ||
        l.contains("SortAggregate"))
    assert(aggs >= 2, s"partial+final pair missing:\n${plan.take(2000)}")
  }

  test("emb_bitext_margin: the per-side k-NN sums aggregate, never " +
      "window — no exchange-and-sort of the full pair table") {
    val plan = executedPlan("emb_bitext_margin")
    assert(!plan.contains("Window"),
      s"margin table regressed to window top-k:\n${plan.take(2000)}")
    val aggs = plan.linesIterator
      .count(l => l.contains("ObjectHashAggregate") ||
        l.contains("SortAggregate"))
    assert(aggs >= 4, // partial+final per side
      s"TopKSum partial/final pairs missing:\n${plan.take(2000)}")
  }

  test("docs_textrank: top-k is a TakeOrderedAndProject, not a global " +
      "sort, and the word graph ranks without windows") {
    val plan = executedPlan("docs_textrank")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k regressed to a global sort:\n${plan.take(2000)}")
    assert(!plan.contains("Window"),
      s"textrank grew a window:\n${plan.take(2000)}")
  }

  test("docs_kn_score: no windows anywhere — count tables and the " +
      "scoring join aggregate, and the scalar table broadcasts") {
    val plan = executedPlan("docs_kn_score")
    assert(!plan.contains("Window "),
      s"KN grew a window:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"the 1-row (D, B) scalar table no longer broadcasts:\n" +
        plan.take(2000))
  }

  test("web_robots_allowed: the RFC decision is a map-side-combinable " +
      "argmax (partial+final aggregate), no window, no nested loop " +
      "against the rule table") {
    val plan = executedPlan("web_robots_allowed")
    assert(!plan.contains("Window"),
      s"robots argmax regressed to a window:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"),
      s"rules join degraded to a cartesian:\n${plan.take(2000)}")
    val aggs = plan.linesIterator.count(l =>
      l.contains("HashAggregate") || l.contains("SortAggregate"))
    assert(aggs >= 2, s"partial+final argmax missing:\n${plan.take(2000)}")
  }

  test("web_frontier: the politeness window partitions by domain (never " +
      "global), the crawled-key dedup stays an anti-join, and nothing " +
      "degrades to a cartesian") {
    val plan = executedPlan("web_frontier")
    val win = plan.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(win.contains("domain"),
      s"politeness window lost its domain partitioning:\n$win")
    assert(!plan.contains("CartesianProduct"),
      s"a frontier join degraded to a cartesian:\n${plan.take(2000)}")
    // the already-crawled subtraction must stay a LeftAnti on the
    // canonical key — a rewrite to NOT IN / except would lose the
    // streaming-side build and re-scan the frontier
    assert(plan.contains("LeftAnti"),
      s"frontier lost its crawled-keys anti-join:\n${plan.take(2000)}")
    // small dims (robots rules, host ranks) stay broadcast-joined
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier lost its broadcast joins:\n${plan.take(2000)}")
  }

  test("web_frontier pacing arithmetic: not_before_tick is codegen'd " +
      "greatest/FLOOR integer math riding the window's own exchange — " +
      "no UDF on the row path, the crawl-delay UDF evaluates only in " +
      "the dim-side least(coalesce(...)) projection (default BEFORE " +
      "clamp), and no exchange separates the Window from the pacing " +
      "projection") {
    val plan = executedPlan("web_frontier")
    val lines = plan.linesIterator.toVector
    val pacingAt = lines.indexWhere(_.contains("not_before_tick"))
    assert(pacingAt >= 0, "pacing projection not found")
    val pacing = lines(pacingAt)
    // the row-path expression is pure integer/FLOOR arithmetic — a
    // rewrite that evaluates crawlDelayOf per frontier row would show
    // up here as a UDF call over the corpus-sized side
    assert(pacing.contains("greatest") && pacing.contains("FLOOR") &&
      !pacing.contains("UDF"),
      s"pacing projection regressed off codegen'd integer math:\n$pacing")
    // the delay dim: parse UDF + default-then-clamp, textually
    // least(coalesce(UDF..., 1000), 3600000) — swapping to
    // coalesce(least(...)) (the pre-ADVICE-r12 NULL-skipping shape)
    // fails both pins. Whole-plan substrings, not per-line: the dim
    // projection spans lines because the robots policy literals
    // contain newlines
    assert(plan.contains("least(coalesce(cast(round((UDF("),
      "delay dim lost its default-before-clamp shape — the parse UDF " +
        "no longer sits inside least(coalesce(...))")
    assert(plan.contains("1000), 3600000) AS _delay_ms"),
      "delay dim default/clamp ordering changed — expected the 1000 ms " +
        "default applied BEFORE the 3600000 ms clamp in one dim-side " +
        "projection")
    // pacing rides the window's exchange: the projection sits directly
    // above Window with no Exchange between them (tree prints top-down,
    // so scan forward from the projection to the Window line)
    val windowAt = lines.indexWhere(_.contains("Window"), pacingAt)
    assert(windowAt > pacingAt,
      "Window not found below the pacing projection")
    assert(!lines.slice(pacingAt, windowAt).exists(_.contains("Exchange")),
      "an exchange crept in between the politeness window and the " +
        "pacing projection:\n" + lines.slice(pacingAt, windowAt + 1)
          .mkString("\n"))
  }

  test("docs_warc_wet: row-grain codec work — exactly the per-archive " +
      "regroup shuffles data, plus the presentation sort") {
    val plan = executedPlan("docs_warc_wet")
    // hashpartitioning(doc_id) for the WET writer regroup +
    // rangepartitioning for the final orderBy — nothing else
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2,
      s"docs_warc_wet grew an extra exchange:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("pipeline_crawl_to_pack stages 1-3: LSH candidates never " +
      "cartesian, the dedup drop stays an anti-join, no window " +
      "anywhere (packing's stage 4 is the two-pass prefix-sum behind " +
      "an RDD boundary — pinned at the pre-pack plan, which is the " +
      "last one Catalyst sees whole)") {
    val plan = graft.queries.PipelineQueries.dedupedCorpus(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"a pipeline join degraded to a cartesian/nested loop:\n" +
        plan.take(3000))
    assert(plan.contains("LeftAnti"),
      s"the dedup drop lost its anti-join:\n${plan.take(3000)}")
    assert(!plan.contains("Window "),
      s"the pipeline grew a global window:\n${plan.take(3000)}")
  }

  test("pipeline_crawl_audit detectors are LIVE (negative control): " +
      "on the same corpus where the audit reads 0 rows, the exact pair " +
      "generator finds pairs in the UN-deduped corpus and the quality " +
      "detector finds at-or-below-median docs in the UN-gated corpus — " +
      "a vacuously-green audit would fail here") {
    import org.apache.spark.sql.functions._
    val recs = graft.queries.PipelineQueries.wetRecords(spark, sf)
    val wetText = recs.select(col("doc_id"), col("text"))
    val pairs = graft.operators.Dedup.prefixFilterJaccardPairs(
      wetText, "doc_id", "text", n = 3, threshold = 0.8)
    assert(pairs.limit(1).count() === 1L,
      "no exact J>=0.8 pair in the un-deduped corpus — the audit's " +
        "lsh_pair_survived detector cannot be exercised at this SF")
    val q4 = graft.operators.TextAnalysis
      .qualityFrame(wetText, "doc_id", "text")
      .select(col("doc_id"),
        round(col("quality") * 10000).cast("long").as("q4"))
    val med = q4.agg(percentile(col("q4"), lit(0.5))).first().getDouble(0)
    assert(q4.filter(col("q4") <= lit(med)).limit(1).count() === 1L,
      "no at-or-below-median doc — the below_median_survivor detector " +
        "cannot be exercised at this SF")
    // the bad_composite detector must flag NULL factors EXPLICITLY (a
    // NULL disjunct would otherwise slip the filter silently): a NULL
    // rec_idx and a negative id are flagged, the valid row stays clean
    import spark.implicits._
    val bad = Seq[(Option[Long], Option[Long], String)](
      (Some(1L), None, "null rec idx"),
      (Some(-1L), Some(0L), "negative id"),
      (Some(2L), Some(3L), "valid"))
      .toDF("doc_id", "rec_idx", "text")
    val flagged = graft.queries.PipelineQueries
      .auditFrame(bad, bad.filter(col("doc_id") === 2L)
        .select(col("doc_id"), col("text")))
      .filter(col("kind") === "bad_composite")
    assert(flagged.count() === 2L,
      "bad_composite must flag the NULL-rec_idx and negative-id rows " +
        "— and only those")
    // a NULL archive id can never reach a silently-green audit: the
    // median stage's typed quality pass rejects it before the detector
    // union even assembles — loud either way
    intercept[Exception] {
      graft.queries.PipelineQueries.auditFrame(
        Seq[(Option[Long], Option[Long], String)](
          (None, Some(0L), "null archive id"))
          .toDF("doc_id", "rec_idx", "text"),
        bad.filter(col("doc_id") === 2L)
          .select(col("doc_id"), col("text")))
    }
  }

  test("pdf_pages_scan corpus: a projection-only read prunes page_text " +
      "out of the DSv2 scan — the content-stream decode the 100 TB " +
      "claim says never runs for metadata queries is plan-visibly " +
      "absent, while the gate query's own scan still carries it") {
    // building the gate query synthesizes (and overwrites) the corpus
    val gatePlan = SparkEntry.queries("pdf_pages_scan")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(gatePlan.contains("page_text"),
      s"control failed — the gate query no longer reads page_text:\n" +
        gatePlan.take(1500))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pdf_scan_" +
      Integer.toHexString(sf.hashCode)
    val pruned = spark.read.format("graft-pdf").load(dir)
      .select("file_name", "page_idx")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[file_name,page_idx]"),
      s"pruned scan description missing:\n${plan.take(1500)}")
    assert(!plan.contains("page_text"),
      s"page_text survived pruning on a projection-only read:\n" +
        plan.take(1500))
    assert(pruned.count() > 0)
  }
}
