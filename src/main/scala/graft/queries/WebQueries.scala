package graft.queries

import graft.operators.{Bitext, TextAnalysis, WebArchive}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t

/** Round-10 web-corpus analytics: Kneser-Ney LM scoring (the KenLM-family
  * smoother next to docs_sbo_score's stupid backoff) and BLEU-2 pair
  * scoring (the surface-overlap quality gate for mined bitext). Every
  * query follows the exactness discipline of its family: exact BIGINT
  * counts, fp only in fixed final trees, full-value DuckDB oracles. */
object WebQueries {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(

    // ── interpolated bigram Kneser-Ney LM score: trained on the even-id
    //    reference slice (the docs_sbo_score asymmetry, so the unseen-
    //    context fallback FIRES on odd docs), scored over the whole
    //    corpus; per-position probabilities micro-rounded in-plan →
    //    order-free integer sums ─────────────────────────────────────────
    "docs_kn_score" -> ((s, d) => {
      TextAnalysis.kneserNeyScores(t(s, d, "documents"), "doc_id", "text",
          refFilter = pmod(col("doc_id"), lit(2)) === 0)
        .orderBy(col("doc_id"))
    }),

    // ── BLEU-2 over aligned doc pairs (ref = even id, cand = id+1):
    //    clipped modified n-gram precisions from exact integer counts,
    //    combined as sqrt(p1·p2) with the LINEAR brevity penalty
    //    min(1, c/r) — every op IEEE-correctly-rounded, so the doubles
    //    replay bit-identically (exp would not; see Bitext.bleuPairs) ────
    "docs_bleu_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val ids = docs.select(col("doc_id").cast("long").as("id"))
      val pairs = ids.select(col("id").as("ref_id"),
          (col("id") + 1).as("cand_id"))
        .filter(pmod(col("ref_id"), lit(2)) === 0)
        .join(ids.select(col("id").as("cand_id")), Seq("cand_id"))
      Bitext.bleuPairs(pairs, docs, "doc_id", "text")
        .orderBy(col("ref_id"))
    }),

    // ── RFC 9309 robots.txt compliance: 5 in-plan host policies × 10
    //    paths drive every matcher branch through the driver gate —
    //    group selection (exact agent beats *), longest-match
    //    precedence, Allow-wins-ties, '*' wildcards, '$' anchors,
    //    empty Disallow (allow all), and the no-robots default. The
    //    host index is doc_id DIV 10 (mod 5) — COPRIME with the path's
    //    doc_id MOD 10, so all 50 (policy, path) combinations occur
    //    across every 50 consecutive ids (a %5 host would alias to
    //    pb%5 and silently skip 40 of them). The oracle states each
    //    decision in CLOSED FORM per branch (the docs_url_canonical
    //    pattern). ────────────────────────────────────────────────────────
    "web_robots_allowed" -> ((s, d) => {
      val pages = t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"))
        .select(col("doc_id"),
          concat(lit("h"), pmod(expr("doc_id div 10"), lit(5)),
            lit(".example.com")).as("host"),
          element_at(array(RobotsPaths.map(lit): _*),
            (pmod(col("doc_id"), lit(10)) + 1).cast("int")).as("path"))
      val robots = s.range(5)
        .select(concat(lit("h"), col("id"), lit(".example.com")).as("host"),
          element_at(array(RobotsTexts.map(lit): _*),
            (col("id") + 1).cast("int")).as("robots_txt"))
      WebArchive.robotsDecisions(pages, "doc_id", "host", "path",
          robots, "host", "robots_txt", agent = "graftbot")
        .orderBy(col("doc_id"))
    }),

    // ── mergeable quantile sketch audit ("sketch proposes, exact
    //    disposes", the hll_audit pattern): per event type a bottom-k
    //    coordinated-sample sketch proposes 4 quantiles; the query
    //    computes each proposal's EXACT rank window and flags whether
    //    it sits within 10% of n of the target rank — wider than the
    //    true DKW guarantee ε = √(ln(2/δ)/2k) ≈ 8.4% at k=1024,
    //    δ=1e-6, so a sketch honoring its bound can never flip the
    //    flag on a regenerated fixture. The sketch is merge-order
    //    INDEPENDENT (unlike KLL), so the flags are stable across runs
    //    and the oracle replays n and the exact quantiles in full and
    //    pins the flags true. ────────────────────────────────────────────
    "events_quantile_sketch" -> ((s, d) => {
      import graft.operators.QuantileSketch
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .select(col("event_type"), col("event_id"), col("value"))
      val phis = Seq((1L, 4L), (1L, 2L), (3L, 4L), (9L, 10L))
      val sk = ev.groupBy(col("event_type"))
        .agg(QuantileSketch.sketch(col("event_id"), col("value"), 1024)
          .as("sk"), count(lit(1)).as("n"))
      val est = sk.select(col("event_type"), col("n"), explode(array(
          phis.map { case (a, b) => struct(lit(a).as("p_num"),
            lit(b).as("p_den"),
            QuantileSketch.quantileCol(col("sk"), a, b).as("est"))
          }: _*)).as("q"))
        .select(col("event_type"), col("n"), col("q.p_num"),
          col("q.p_den"), col("q.est"))
        .withColumn("kth",
          expr("(p_num * n + p_den - 1) div p_den"))
        .withColumn("b", expr("(10 * n) div 100 + 1"))
      val cw = ev.groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("event_type")).orderBy(col("value"))))
        .withColumn("below", col("cum") - col("c"))
      val exactQ = est.join(cw, Seq("event_type"))
        .filter(col("cum") >= col("kth"))
        .groupBy(col("event_type"), col("p_num"), col("p_den"),
          col("n"), col("kth"), col("b"), col("est"))
        .agg(min(col("value")).as("exact_q"))
      exactQ.join(cw.select(col("event_type"),
          col("value").as("est"), col("cum"), col("below")),
          Seq("event_type", "est"))
        .select(col("event_type"), col("p_num"), col("p_den"),
          col("n"), col("exact_q"),
          (col("below") + 1 <= col("kth") + col("b") &&
            col("cum") >= col("kth") - col("b")).as("within_bound"))
        .orderBy(col("event_type"), col("p_den"), col("p_num"))
    }),

    // ── RAKE keyphrases (Rose et al. 2010): stopword-free token runs
    //    scored by summed deg/freq word ratios — the multiword-phrase
    //    complement to docs_textrank's unigram graph. Word scores
    //    micro-round to BIGINTs, so phrase sums are order-free and the
    //    oracle replays every value exactly. ─────────────────────────────
    "docs_rake" -> ((s, d) => {
      TextAnalysis.rakePhrases(t(s, d, "documents"), "doc_id", "text",
        stopwords = RakeStops, topK = 20)
    }),

    // ── HTTP-in-WARC parsing: each doc gets an in-plan WARC whose
    //    response block is a REAL HTTP message (status line, headers,
    //    body) — status by doc_id%3, content type by doc_id%2 (UTF-8
    //    html vs ISO-8859-1 plain text whose body carries a non-ASCII
    //    byte the charset decode must map correctly), and every
    //    doc_id%5==0 body ships Transfer-Encoding: chunked (two
    //    chunks) that de-chunking must restore byte-exactly — the
    //    oracle's body column is framing-free, so broken or skipped
    //    de-chunking mismatches. %3, %2, %5 are pairwise coprime: all
    //    30 combinations occur. Closed-form oracle over every output
    //    column. ──────────────────────────────────────────────────────────
    "docs_warc_http" -> ((s, d) => {
      val synth = udf((id: Long, text: String) => {
        val status = (id % 3) match {
          case 0 => "200 OK"
          case 1 => "301 Moved Permanently"
          case _ => "404 Not Found"
        }
        val (ct, body) =
          if (id % 2 == 0)
            ("text/html; charset=utf-8",
              ("<p>" + text + "</p>").getBytes("UTF-8"))
          else
            ("text/plain; charset=ISO-8859-1",
              (text + " café").getBytes("ISO-8859-1"))
        val chunked = id % 5 == 0
        val wire = if (!chunked) body else {
          val out = new java.io.ByteArrayOutputStream()
          def put(from: Int, until: Int): Unit = if (until > from) {
            out.write(s"${(until - from).toHexString}\r\n"
              .getBytes("ISO-8859-1"))
            out.write(body, from, until - from)
            out.write("\r\n".getBytes("ISO-8859-1"))
          }
          put(0, body.length / 2)
          put(body.length / 2, body.length)
          out.write("0\r\n\r\n".getBytes("ISO-8859-1"))
          out.toByteArray
        }
        val head = s"HTTP/1.1 $status\r\nContent-Type: $ct\r\n" +
          (if (chunked) "Transfer-Encoding: chunked\r\n" else "") +
          "Server: graft\r\n\r\n"
        graft.functions.WarcCodec.encode(Seq(
          (Seq("WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> s"<urn:graft:info:$id>"),
            "software: graft\r\n".getBytes("UTF-8")),
          (Seq("WARC-Type" -> "response",
            "WARC-Record-ID" -> s"<urn:graft:http:$id>",
            "WARC-Target-URI" -> s"http://example.org/doc/$id"),
            head.getBytes("ISO-8859-1") ++ wire)),
          gzipPerRecord = id % 2 == 0)
      })
      WebArchive.httpResponses(
          t(s, d, "documents").select(col("doc_id").cast("long")
            .as("doc_id"), col("text"))
          .select(col("doc_id"),
            synth(col("doc_id"), col("text")).as("bytes")),
          "doc_id", "bytes")
        .orderBy(col("doc_id"))
    }),

    // ── page-level robots directives: 5 in-plan HTML branches (no tag,
    //    plain noindex, reversed-attribute single-quoted noindex+
    //    nofollow, index-follow, and a DECOY description tag whose
    //    content says noindex but whose name is not robots) drive the
    //    meta-robots extractor; closed-form oracle per branch. ──────────
    "web_meta_robots" -> ((s, d) => {
      import graft.operators.Markup
      val html = element_at(array(MetaRobotsHtml.map(lit): _*),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int"))
      t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          concat(lit("<html><head>"), html,
            lit("</head><body>x</body></html>")).as("page"))
        .select(col("doc_id"),
          Markup.metaRobotsFlags(col("page")).as("_f"))
        .select(col("doc_id"), col("_f.directives").as("directives"),
          col("_f.noindex").as("noindex"),
          col("_f.nofollow").as("nofollow"))
        .orderBy(col("doc_id"))
    }),

    // ── sitemap discovery: per doc an in-plan sitemap.xml with two
    //    <url> entries — a messy one (whitespace-padded loc carrying
    //    the full canonicalization gauntlet: cased scheme/host, :80,
    //    utm_ param; a lastmod) and a bare already-canonical one with
    //    no lastmod — parses through the real extractor and each loc
    //    flows on through URL canonicalization (the crawl-frontier
    //    dedup key). Closed-form oracle over every column. ──────────────
    "web_sitemap" -> ((s, d) => {
      import graft.operators.Markup
      val canon = udf(graft.functions.UrlFunctions.canonicalizeUrl _)
      val day = lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"),
        2, "0")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc>  HTTP://Example"),
        pmod(col("doc_id"), lit(3)), lit(".COM:80/a/"), col("doc_id"),
        lit("?utm_source=x&id=7 </loc><lastmod> 2024-01-"), day,
        lit(" </lastmod></url><url><loc>https://site"),
        pmod(col("doc_id"), lit(5)),
        lit(".com/b</loc></url></urlset>"))
      t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), xml.as("xml"))
        .select(col("doc_id"),
          posexplode(Markup.sitemapEntries(col("xml"))).as(Seq("idx", "e")))
        .select(col("doc_id"), col("idx"), col("e.loc").as("url"),
          col("e.lastmod").as("lastmod"),
          canon(col("e.loc")).as("canonical_url"))
        .orderBy(col("doc_id"), col("idx"))
    }),

    // ── stem-grain vocabulary: every corpus token stems through the
    //    real Porter implementation and aggregates at stem grain — the
    //    integration query over live data next to docs_porter_stems'
    //    vector gate. The corpus vocabulary is CLOSED (31 words at all
    //    SFs), so the oracle replays stemming via a hand-traced
    //    word→stem dictionary; a vocabulary change mismatches loudly. ───
    "docs_stem_vocab" -> ((s, d) => {
      val stemUdf = udf(graft.functions.PorterStemmer.stem _)
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .select(col("w"), stemUdf(col("w")).as("stem"))
        .groupBy(col("stem"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("w")).as("n_forms"))
        .orderBy(col("stem"))
    }),

    // ── Unicode NFC dedup keys: every byte-grain key in the dedup stack
    //    (md5 content hashes, shingles, URL forms, decontamination
    //    lookups) misses duplicates whose text arrived in a different
    //    normalization form — per doc a PRECOMPOSED phrase (U+00E9 é)
    //    and its DECOMPOSED twin (e + U+0301) are synthesized, and the
    //    engine must show raw bytes differ, NFC unifies them, md5 keys
    //    match post-NFC, and the diacritic fold produces the ASCII
    //    form. Closed-form oracle per branch. ───────────────────────────
    "docs_nfc_keys" -> ((s, d) => {
      import graft.functions.UnicodeNorm
      val composedArr = array(NfcComposed.map(lit): _*)
      val decomposedArr = array(NfcDecomposed.map(lit): _*)
      val idx = (pmod(col("doc_id"), lit(4)) + 1).cast("int")
      t(s, d, "documents").select(col("doc_id").cast("long").as("doc_id"))
        .select(col("doc_id"),
          element_at(composedArr, idx).as("composed"),
          element_at(decomposedArr, idx).as("decomposed"))
        .select(col("doc_id"),
          (col("decomposed") === col("composed")).as("raw_equal"),
          (UnicodeNorm.nfc(col("decomposed")) === col("composed"))
            .as("nfc_equal"),
          (md5(UnicodeNorm.nfc(col("decomposed"))) === md5(col("composed")))
            .as("key_match"),
          UnicodeNorm.stripMarks(col("composed")).as("folded"))
        .orderBy(col("doc_id"))
    }),

    // ── Porter stemming (1980 paper rules): 20 in-plan vectors spanning
    //    every step (1a plurals, 1b ed/ing + repairs, 1c y→i, 2/3 suffix
    //    maps, 4 m>1 strips incl. the ION s/t guard, 5a e-drop, the
    //    paper's no-fall-through semantics via "feed"/"rational") are
    //    stemmed by the real implementation; the oracle states each stem
    //    as a closed-form literal (the docs_url_canonical pattern —
    //    DuckDB has no offline stemmer to replay with). ─────────────────
    "docs_porter_stems" -> ((s, d) => {
      val stemUdf = udf(graft.functions.PorterStemmer.stem _)
      t(s, d, "documents").select(col("doc_id").cast("long").as("doc_id"))
        .select(col("doc_id"),
          element_at(array(PorterWords.map(lit): _*),
            (pmod(col("doc_id"), lit(20)) + 1).cast("int")).as("word"))
        .withColumn("stem", stemUdf(col("word")))
        .orderBy(col("doc_id"))
    }),

    // ── WET conversion (the CommonCrawl *.warc.wet product): WARC-in →
    //    conversion-record WARC-out through the full stack — HTTP parse,
    //    charset decode, de-chunking, html-vs-plain strip dispatch, WET
    //    re-encode — then decoded BACK through records() so the gate
    //    sees every conversion header and the stripped payload. Three
    //    response branches by doc_id%3 (html 200 whose strip drops a
    //    script and decodes &amp;, plain-text 200 passing through
    //    verbatim, html 404 dropped), chunked wire framing on %5==0,
    //    per-record gzip members on %2==0 — 3,5,2 pairwise coprime, all
    //    30 combos execute. Closed-form oracle per branch. ──────────────
    "docs_warc_wet" -> ((s, d) => {
      import graft.operators.WebArchive
      val synth = warcResponseSynth
      val wet = WebArchive.wetConversion(
        t(s, d, "documents").select(col("doc_id").cast("long")
            .as("doc_id"), col("text"))
          .select(col("doc_id"),
            synth(col("doc_id"), col("text")).as("bytes")),
        "doc_id", "bytes")
      WebArchive.records(wet, "doc_id", "wet")
        .orderBy(col("doc_id"), col("rec_idx"))
    }),

    // ── robots.txt sidecar directives: Sitemap (group-INDEPENDENT, the
    //    frontier bootstrap channel — robots.txt is the one URL a
    //    crawler always fetches first) and Crawl-delay (group-bound
    //    politeness pacing with exact-over-* selection). 4 in-plan
    //    policy branches × 3 hosts (%4, %3 coprime): *-group delay
    //    inherited by an agent with no group, exact-group delay BEATING
    //    a *-group delay, non-numeric delay ignored, sitemap lines
    //    inside a foreign group still extracted, empty file. Closed-form
    //    oracle per branch. ───────────────────────────────────────────
    "web_robots_sitemap" -> ((s, d) => {
      val sm = udf(graft.functions.RobotsTxt.sitemaps _)
      val cd = udf((t: String) =>
        graft.functions.RobotsTxt.crawlDelayOf(t, "graftbot"))
      val h = concat(lit("https://h"), pmod(col("doc_id"), lit(3)),
        lit(".com"))
      val m4 = pmod(col("doc_id"), lit(4))
      val txt = when(m4 === 0, concat(
          lit("User-agent: *\nDisallow: /x\nSitemap: "), h,
          lit("/sm.xml\nCrawl-delay: 2")))
        .when(m4 === 1, concat(
          lit("User-agent: graftbot\nCrawl-delay: 0.5\nDisallow:\n" +
            "User-agent: *\nCrawl-delay: 9\nSitemap: "), h,
          lit("/a.xml\nSitemap: "), h, lit("/b.xml")))
        .when(m4 === 2, lit("User-agent: *\nCrawl-delay: abc\n" +
          "Disallow: /p"))
        .otherwise(lit(""))
      t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), txt.as("_t"))
        .select(col("doc_id"),
          size(sm(col("_t"))).cast("bigint").as("n_sitemaps"),
          coalesce(get(sm(col("_t")), lit(0)), lit(""))
            .as("first_sitemap"),
          coalesce(cd(col("_t")), lit(-1.0)).as("crawl_delay"))
        .orderBy(col("doc_id"))
    }),

    // ── mined crawl frontier — the COMPOSITION the per-piece queries
    //    (web_sitemap, docs_url_canonical, web_robots_allowed,
    //    web_host_rank) each gate alone: sitemap discovery →
    //    canonicalization (the frontier dedup key) → distinct + anti-join
    //    against already-crawled keys → RFC 9309 robots gate → host-rank
    //    priority from the discovery graph (string-keyed integer
    //    PageRank) → politeness slots per registrable domain
    //    (row_number per domain = one fetch per domain per tick).
    //    Dedup/robots/priority all replay in closed form; the PR rounds
    //    unroll in the oracle exactly like web_host_rank's. ─────────────
    "web_frontier" -> ((s, d) => {
      import graft.operators.{GraphOps, Markup, WebArchive}
      import org.apache.spark.sql.expressions.Window
      val canon = udf(graft.functions.UrlFunctions.canonicalizeUrl _)
      val rdom = udf(graft.functions.UrlFunctions.registrableDomain _)
      val docs = t(s, d, "documents")
        .select(col("doc_id").cast("long").as("doc_id"))
      // per-doc sitemap: a messy same-site url (cased scheme/host, :80,
      // utm_ param — the canonicalization gauntlet) + a bare cross-site
      // one; hosts a{0,1,2}.example.com share one registrable domain so
      // the politeness grouping is non-degenerate
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc>  HTTP://A"),
        pmod(col("doc_id"), lit(3)), lit(".Example.COM:80/p/"),
        col("doc_id"), lit("?utm_source=x&id=7 </loc></url>" +
          "<url><loc>https://site"),
        pmod(col("doc_id"), lit(5)), lit(".com/b</loc></url></urlset>"))
      val discovered = docs
        .select(col("doc_id"), explode(Markup.sitemapEntries(xml)).as("e"))
        .select(col("doc_id"), canon(col("e.loc")).as("url"))
      // already-crawled keys: the %4 slice of the same-site urls, built
      // through the SAME canonicalizer (a frontier dedups on canonical
      // keys, never raw strings)
      val crawled = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(canon(concat(lit("HTTP://A"), pmod(col("doc_id"), lit(3)),
          lit(".Example.COM:80/p/"), col("doc_id"),
          lit("?utm_source=x&id=7"))).as("url"))
      val frontier = discovered.select(col("url")).distinct()
        .join(crawled, Seq("url"), "left_anti")
        .withColumn("host", regexp_extract(col("url"),
          "^[a-z]+://([^/]+)", 1))
        .withColumn("path", regexp_extract(col("url"),
          "^[a-z]+://[^/]+([^?]*)", 1))
      // robots gate: a0 bans /p/ outright, a1 bans the /p/1 prefix
      // (ids whose decimal starts with 1), a2 allows graftbot /p/ while
      // banning everyone else; site0.com publishes allow-all (no
      // Crawl-delay — the pacing-default branch); site{1-4}.com publish
      // no robots.txt → allowed per the RFC
      // 4th row (ADVICE r12): site0.com publishes an allow-all policy
      // WITH NO Crawl-delay — the host-in-robots-but-no-delay branch that
      // must fall back to the 1000 ms default (before the fix it took
      // the clamp value: least() skips NULLs). Its oracle value is the
      // same 1000 ms ELSE branch as the robots-less site hosts, so the
      // gate pins the default-before-clamp order.
      val robots = s.range(4)
        .select(when(col("id") < 3,
            concat(lit("a"), col("id"), lit(".example.com")))
            .otherwise(lit("site0.com")).as("host"),
          element_at(array(FrontierRobots.map(lit): _*),
            (col("id") + 1).cast("int")).as("robots_txt"))
      val allowed = WebArchive.robotsDecisions(frontier, "url", "host",
          "path", robots, "host", "robots_txt", agent = "graftbot")
        .filter(col("allowed"))
      // host-rank priority: the discovery graph (sitemap origin host →
      // discovered host, plus a back-link family so ranks DIFFER across
      // hosts — a0/a1 take two in-edges, a2 one, site0-2 one, site3/4
      // none) deduped at host grain — dimension-sized at any corpus
      // size — ranked by 3 integer-PageRank rounds
      def siteHost(m: org.apache.spark.sql.Column) =
        concat(lit("site"), m, lit(".com"))
      def aHost(m: org.apache.spark.sql.Column) =
        concat(lit("a"), m, lit(".example.com"))
      val m5 = pmod(col("doc_id"), lit(5))
      val m3 = pmod(col("doc_id"), lit(3))
      val edges = docs
        .select(siteHost(m5).as("src"), aHost(pmod(m5, lit(3))).as("dst"))
        .union(docs.select(aHost(m3).as("src"), siteHost(m3).as("dst")))
        .distinct()
      val pr = GraphOps.pageRankIntKeyed(edges, "src", "dst", iters = 3)
        .withColumnRenamed("id", "host")
      // politeness: one fetch slot per registrable domain per tick —
      // the window partitions by domain over the FRONTIER (already
      // dedup'd + gated: far smaller than the corpus), highest host
      // rank first, url as the total tiebreak. Each fetch's earliest
      // tick honors BOTH constraints (r12, VERDICT r11 #3): the domain
      // serialization (≥ slot−1) and the fetched host's declared
      // Crawl-delay pacing (≥ ceil((slot−1)·delay), exact-integer over
      // declared-millisecond delays — 1000 ms when the host declares
      // none or publishes no robots). The delay dimension rides the
      // SAME 4-row robots table the gate already broadcasts.
      val cdUdf = udf((t: String) =>
        graft.functions.RobotsTxt.crawlDelayOf(t, "graftbot"))
      // declared delays clamp to one hour (the common crawler practice —
      // an adversarial 'Crawl-delay: 9e9' must not starve the host's
      // slots forever, and the clamp keeps slot·delay products far from
      // long overflow at any frontier size)
      // default BEFORE the clamp (ADVICE r12): Spark least() skips
      // NULLs, so a host whose robots declares no (or an unparsable)
      // Crawl-delay would otherwise take least(NULL, 3600000) = the
      // CLAMP — starving it 3600× vs the documented 1000 ms default
      val delays = robots.select(col("host"),
        least(coalesce(
            round(cdUdf(col("robots_txt")) * lit(1000)).cast("long"),
            lit(1000L)),
          lit(3600000L)).as("_delay_ms"))
      val slotM1 = (col("slot") - lit(1)).cast("long")
      allowed.join(pr, Seq("host"), "left")
        .join(delays, Seq("host"), "left")
        .select(rdom(col("host")).as("domain"),
          col("url"), col("host"),
          coalesce(col("rank_i"), lit(0L)).as("rank_i"),
          coalesce(col("_delay_ms"), lit(1000L)).as("_delay_ms"))
        .withColumn("slot", row_number().over(Window.partitionBy(
          col("domain")).orderBy(col("rank_i").desc, col("url"))))
        .withColumn("not_before_tick",
          notBeforeTickCol(slotM1, col("_delay_ms")))
        .select(col("domain"), col("slot"), col("url"), col("host"),
          col("rank_i"), col("not_before_tick"))
        .orderBy(col("domain"), col("slot"))
    }))

  /** Earliest permissible fetch tick for a host's slot-th URL under
    * its declared Crawl-delay: `max(slot−1, ceil((slot−1)·delay_ms /
    * 1000))` — the domain-serialization floor AND the pacing floor,
    * whichever binds. ceil over exact longs via `floor((x+999)/1000)`:
    * Spark's `/` on longs is correctly-rounded double division, and
    * for any product this pipeline can produce (delay clamped to
    * 3 600 000 ms, so x+999 < 2^53 for slots into the billions) the
    * quotient is ≥ 1/1000 away from any integer unless exactly
    * divisible — floor is exact and DuckDB replays it with integer
    * `//`. [[notBeforeTickModel]] is the scalar twin; ScalaCheck pins
    * the two agree plus the monotone/bound algebra the scheduler
    * relies on ([[GraftProperties]]). */
  private[graft] def notBeforeTickCol(slotM1: Column,
      delayMs: Column): Column =
    greatest(slotM1,
      floor((slotM1 * delayMs + lit(999L)) / lit(1000L)).cast("long"))

  /** Exact-integer scalar model of [[notBeforeTickCol]]. */
  private[graft] def notBeforeTickModel(slotM1: Long,
      delayMs: Long): Long =
    math.max(slotM1, Math.floorDiv(slotM1 * delayMs + 999L, 1000L))

  /** RAKE stopwords for the synthetic corpus (its only function
    * words); interpolated into the oracle from this one value. */
  private val RakeStops = Seq("the", "a")

  /** The docs_warc_wet WARC synthesizer, shared with the flagship
    * end-to-end composition ([[PipelineQueries]]): per doc an archive of
    * a warcinfo record + one HTTP response record — 3 response branches
    * by id%3 (html 200 whose strip drops a script and decodes &amp;-family
    * entities, plain-text 200 passing through verbatim, html 404
    * dropped), chunked wire framing on %5==0, per-record gzip members on
    * %2==0 — 3, 5, 2 pairwise coprime, so all 30 combos execute. */
  private[graft] val warcResponseSynth =
    udf((id: Long, text: String) => {
      val status = if (id % 3 == 2) "404 Not Found" else "200 OK"
      val (ct, body) =
        if (id % 3 == 1)
          ("text/plain; charset=utf-8", text.getBytes("UTF-8"))
        else ("text/html; charset=utf-8",
          (s"<html><head><title>T$id</title><script>var x=1;" +
            s"</script></head><body><p>$text &amp; tail</p></body>" +
            "</html>").getBytes("UTF-8"))
      val chunked = id % 5 == 0
      val wire = if (!chunked) body else {
        val out = new java.io.ByteArrayOutputStream()
        def put(from: Int, until: Int): Unit = if (until > from) {
          out.write(s"${(until - from).toHexString}\r\n"
            .getBytes("ISO-8859-1"))
          out.write(body, from, until - from)
          out.write("\r\n".getBytes("ISO-8859-1"))
        }
        put(0, body.length / 2)
        put(body.length / 2, body.length)
        out.write("0\r\n\r\n".getBytes("ISO-8859-1"))
        out.toByteArray
      }
      val head = s"HTTP/1.1 $status\r\nContent-Type: $ct\r\n" +
        (if (chunked) "Transfer-Encoding: chunked\r\n" else "") + "\r\n"
      graft.functions.WarcCodec.encode(Seq(
        (Seq("WARC-Type" -> "warcinfo",
          "WARC-Record-ID" -> s"<urn:graft:info:$id>"),
          "software: graft\r\n".getBytes("UTF-8")),
        (Seq("WARC-Type" -> "response",
          "WARC-Record-ID" -> s"<urn:graft:resp:$id>",
          "WARC-Target-URI" -> s"http://example.org/doc/$id"),
          head.getBytes("ISO-8859-1") ++ wire)),
        gzipPerRecord = id % 2 == 0)
    })

  /** The 3 frontier robots policies (host a{i}.example.com): ban-all
    * under /p/, ban the /p/1 decimal prefix, graftbot-only allow. Each
    * also declares pacing (r12): a0's delay is unreachable (every a0
    * url is banned), a1 paces at 0.5 s via the *-group (graftbot
    * inherits — it has no own group there), a2 paces graftbot's OWN
    * group at 3 s. The 4th policy (site0.com) is allow-all with NO
    * Crawl-delay line — a published-robots host that must still pace at
    * the 1000 ms DEFAULT, not the clamp (ADVICE r12: the coalesce must
    * run before the least). site{1-4}.com publish no robots at all →
    * the same 1-tick default via the outer join's coalesce. */
  private val FrontierRobots = Seq(
    "User-agent: *\nDisallow: /p/\nCrawl-delay: 2",
    "User-agent: *\nDisallow: /p/1\nCrawl-delay: 0.5",
    "User-agent: graftbot\nAllow: /p/\nCrawl-delay: 3\n" +
      "User-agent: *\nDisallow: /",
    "User-agent: *\nDisallow:")

  /** The 5 meta-robots HTML branches (doc_id % 5). */
  private val MetaRobotsHtml = Seq(
    "<title>t</title>",
    "<meta name=\"robots\" content=\"noindex\">",
    "<meta content='noindex, nofollow' name='robots'>",
    "<meta name=\"robots\" content=\"index, follow\">",
    "<meta name=\"description\" content=\"noindex\">")

  /** NFC test phrases: precomposed forms and their combining-mark
    * decompositions (canonical equivalents — NFC must unify them). */
  private val NfcComposed = Seq("café", "señor", "naïve",
    "crème brûlée")

  private val NfcDecomposed = Seq("café", "señor",
    "naïve", "crème brûlée")

  /** Diacritic-fold expectations for the composed phrases. */
  private val NfcFolded = Seq("cafe", "senor", "naive", "creme brulee")

  /** The 20 stemmer vectors (word, expected stem), hand-traced through
    * the 1980 rules; the oracle interpolates BOTH columns so any engine
    * drift on any vector flips the gate. */
  private val PorterVectors = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "cats" -> "cat", "feed" -> "feed", "agreed" -> "agre",
    "plastered" -> "plaster", "motoring" -> "motor", "hopping" -> "hop",
    "sized" -> "size", "happy" -> "happi", "relational" -> "relat",
    "conditional" -> "condit", "rational" -> "ration",
    "electrical" -> "electr", "hopefulness" -> "hope",
    "goodness" -> "good", "formalize" -> "formal",
    "generalization" -> "gener", "triplicate" -> "triplic")

  private val PorterWords = PorterVectors.map(_._1)

  /** The 10 path branches `web_robots_allowed` routes by doc_id % 10. */
  private val RobotsPaths = Seq("/private/a", "/private/public/b",
    "/a.pdf", "/a.pdfx", "/tmp/x", "/index.html", "/private/public",
    "/", "/dual/x", "/img/a/raw")

  /** The 5 host policies (doc_id % 5): longest-match + allow-wins tie
    * (h0), exact-agent group beats '*' (h1), '*' wildcard + '$' anchor
    * (h2), empty Disallow = allow all (h3), no robots.txt (h4). */
  private val RobotsTexts = Seq(
    "User-agent: *\nDisallow: /private/\nAllow: /private/public/\n" +
      "Disallow: /dual/\nAllow: /dual/",
    "User-agent: graftbot\nDisallow: /\nUser-agent: *\nDisallow: /tmp/",
    "User-agent: *\nDisallow: /*.pdf$\nDisallow: /img/*/raw",
    "User-agent: *\nDisallow:",
    "")

  /** DuckDB gram separator matching the engine's  packing. */
  private val Sep = "chr(1)"

  /** The BLEU-2 oracle chain over an arbitrary `bpairs (ref_id,
    * cand_id)` CTE — shared by `docs_bleu_pairs` (adjacent-doc pairs)
    * and `emb_bitext_bleu` (mined bitext pairs) so the two replays
    * cannot drift. Pairs whose ids lack a document row or whose
    * candidate has < 2 tokens drop, matching
    * [[graft.operators.Bitext.bleuPairs]]'s contract. */
  def bleuOracleSql(bpairsCte: String): String =
    s"""WITH $bpairsCte,
      |toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |lens AS (SELECT doc_id, len(ws) AS l FROM toks),
      |g1 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
      |  SELECT doc_id, unnest(ws) AS g FROM toks) GROUP BY 1, 2),
      |g2 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
      |  SELECT doc_id, unnest([array_to_string(ws[i+1:i+2], $Sep)
      |    FOR i IN range(len(ws) - 1)]) AS g
      |  FROM toks WHERE len(ws) >= 2) GROUP BY 1, 2),
      |pairs AS (
      |  SELECT bp.ref_id, bp.cand_id, la.l AS r_len, lb.l AS c_len
      |  FROM bpairs bp
      |  JOIN lens la ON la.doc_id = bp.ref_id
      |  JOIN lens lb ON lb.doc_id = bp.cand_id
      |  WHERE lb.l >= 2),
      |m1 AS (SELECT p.ref_id, p.cand_id,
      |    CAST(sum(least(c.c, r.c)) AS BIGINT) AS m1
      |  FROM pairs p
      |  JOIN g1 c ON c.doc_id = p.cand_id
      |  JOIN g1 r ON r.doc_id = p.ref_id AND r.g = c.g
      |  GROUP BY 1, 2),
      |m2 AS (SELECT p.ref_id, p.cand_id,
      |    CAST(sum(least(c.c, r.c)) AS BIGINT) AS m2
      |  FROM pairs p
      |  JOIN g2 c ON c.doc_id = p.cand_id
      |  JOIN g2 r ON r.doc_id = p.ref_id AND r.g = c.g
      |  GROUP BY 1, 2)
      |SELECT p.ref_id, p.cand_id,
      |CAST(p.c_len AS BIGINT) AS t1, coalesce(m1.m1, 0) AS m1,
      |CAST(p.c_len - 1 AS BIGINT) AS t2, coalesce(m2.m2, 0) AS m2,
      |round(sqrt((CAST(coalesce(m1.m1, 0) AS DOUBLE) / p.c_len)
      |    * (CAST(coalesce(m2.m2, 0) AS DOUBLE) / (p.c_len - 1)))
      |  * least(1.0, CAST(p.c_len AS DOUBLE) / p.r_len), 6) + 0.0
      |  AS bleu2
      |FROM pairs p
      |LEFT JOIN m1 ON m1.ref_id = p.ref_id AND m1.cand_id = p.cand_id
      |LEFT JOIN m2 ON m2.ref_id = p.ref_id AND m2.cand_id = p.cand_id
      |ORDER BY p.ref_id, p.cand_id""".stripMargin

  def oracles: Map[String, String] = Map(

    "docs_kn_score" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |rbg AS (
        |  SELECT unnest([ws[i+1] || $Sep || ws[i+2]
        |    FOR i IN range(len(ws) - 1)]) AS g
        |  FROM toks WHERE doc_id % 2 = 0 AND len(ws) >= 2),
        |c2 AS (SELECT g, CAST(count(*) AS BIGINT) AS c2 FROM rbg
        |  GROUP BY 1),
        |c2s AS (SELECT string_split(g, $Sep)[1] AS u,
        |  string_split(g, $Sep)[2] AS v, c2 FROM c2),
        |ctx AS (SELECT u, CAST(sum(c2) AS BIGINT) AS cu,
        |  CAST(count(*) AS BIGINT) AS fanout FROM c2s GROUP BY 1),
        |cont AS (SELECT v, CAST(count(*) AS BIGINT) AS nc FROM c2s
        |  GROUP BY 1),
        |scal AS (SELECT CASE WHEN n1 + 2 * n2 = 0 THEN 0.5
        |    ELSE CAST(n1 AS DOUBLE) / (n1 + 2 * n2) END AS d, bt
        |  FROM (SELECT
        |    CAST(sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN c2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(count(*) AS BIGINT) AS bt FROM c2)),
        |dbm AS (
        |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS m FROM (
        |    SELECT doc_id, unnest([ws[i+1] || $Sep || ws[i+2]
        |      FOR i IN range(len(ws) - 1)]) AS g
        |    FROM toks WHERE len(ws) >= 2) GROUP BY 1, 2),
        |j AS (
        |  SELECT db.doc_id, db.m, c2s.c2 AS c2v, ctx.cu, ctx.fanout,
        |    cont.nc, scal.d, scal.bt
        |  FROM (SELECT doc_id, m, string_split(g, $Sep)[1] AS u,
        |      string_split(g, $Sep)[2] AS v FROM dbm) db
        |  LEFT JOIN c2s ON db.u = c2s.u AND db.v = c2s.v
        |  LEFT JOIN ctx ON db.u = ctx.u
        |  LEFT JOIN cont ON db.v = cont.v
        |  CROSS JOIN scal),
        |p AS (
        |  SELECT doc_id, m,
        |  m * CAST(round((CASE WHEN cu IS NOT NULL
        |    THEN greatest(coalesce(c2v, 0) - d, 0) / cu
        |      + (d * fanout / cu) * (CAST(coalesce(nc, 0) AS DOUBLE) / bt)
        |    ELSE CAST(coalesce(nc, 0) AS DOUBLE) / bt
        |    END) * 1e6) AS BIGINT) AS pm,
        |  CASE WHEN coalesce(c2v, 0) > 0 THEN m ELSE 0 END AS mh
        |  FROM j)
        |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
        |CAST(sum(mh) AS BIGINT) AS n_attested,
        |CAST(sum(pm) AS DOUBLE) / (sum(m) * 1e6) AS kn_score
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "docs_bleu_pairs" -> bleuOracleSql(
      """bpairs AS (
        |  SELECT a.doc_id AS ref_id, b.doc_id AS cand_id
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 2 = 0)""".stripMargin),

    "web_robots_allowed" ->
      s"""SELECT doc_id,
        |'h' || ((doc_id // 10) % 5) || '.example.com' AS host,
        |['/private/a', '/private/public/b', '/a.pdf', '/a.pdfx',
        | '/tmp/x', '/index.html', '/private/public', '/',
        | '/dual/x', '/img/a/raw'][(doc_id % 10) + 1] AS path,
        |NOT ((doc_id // 10) % 5 = 1
        |  OR ((doc_id // 10) % 5 = 0 AND doc_id % 10 IN (0, 6))
        |  OR ((doc_id // 10) % 5 = 2 AND doc_id % 10 IN (2, 9)))
        |  AS allowed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "events_quantile_sketch" ->
      s"""WITH ev AS (SELECT event_type, value FROM events),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM ev GROUP BY 1),
        |cw AS (SELECT event_type, value,
        |  sum(c) OVER (PARTITION BY event_type ORDER BY value) AS cum
        |  FROM (SELECT event_type, value, count(*) AS c FROM ev
        |    GROUP BY 1, 2)),
        |phis AS (SELECT * FROM (VALUES (1, 4), (1, 2), (3, 4), (9, 10))
        |  AS t(p_num, p_den)),
        |kth AS (SELECT n.event_type, p.p_num, p.p_den, n.n,
        |  (p.p_num * n.n + p.p_den - 1) // p.p_den AS kth
        |  FROM n, phis p)
        |SELECT k.event_type, CAST(k.p_num AS BIGINT) AS p_num,
        |CAST(k.p_den AS BIGINT) AS p_den, k.n,
        |(SELECT min(value) FROM cw
        |  WHERE cw.event_type = k.event_type AND cw.cum >= k.kth)
        |  AS exact_q,
        |true AS within_bound
        |FROM kth k ORDER BY event_type, p_den, p_num""".stripMargin,

    "docs_rake" -> {
      val stops = RakeStops.map(w => s"'$w'").mkString(", ")
      s"""WITH toks AS (
        |  SELECT doc_id, [x FOR x IN string_split(text, ' ')
        |    IF len(x) > 0] AS ws FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest([{'i': i, 'w': ws[i+1]}
        |    FOR i IN range(len(ws))], recursive := true)
        |  FROM toks),
        |sg AS (
        |  SELECT doc_id, i, w,
        |  sum(CASE WHEN w IN ($stops) THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY i) AS seg
        |  FROM tok),
        |words AS (SELECT * FROM sg WHERE w NOT IN ($stops)),
        |plen AS (SELECT doc_id, seg, CAST(count(*) AS BIGINT) AS plen
        |  FROM words GROUP BY 1, 2),
        |wstats AS (
        |  SELECT w, CAST(round(
        |    (CAST(sum(plen) AS DOUBLE) / count(*)) * 1e6) AS BIGINT)
        |    AS ws_micro
        |  FROM words JOIN plen USING (doc_id, seg) GROUP BY w),
        |inst AS (
        |  SELECT w2.doc_id, w2.seg,
        |  CAST(sum(ws.ws_micro) AS BIGINT) AS score_micro,
        |  string_agg(w2.w, ' ' ORDER BY w2.i) AS phrase
        |  FROM words w2 JOIN wstats ws USING (w) GROUP BY 1, 2)
        |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
        |CAST(max(score_micro) AS BIGINT) AS score_micro
        |FROM inst GROUP BY 1
        |ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin
    },

    "docs_warc_http" ->
      s"""SELECT doc_id, 1 AS rec_idx,
        |'http://example.org/doc/' || doc_id AS target_uri,
        |[200, 301, 404][(doc_id % 3) + 1] AS status,
        |CASE WHEN doc_id % 2 = 0 THEN 'text/html; charset=utf-8'
        |  ELSE 'text/plain; charset=ISO-8859-1' END AS content_type,
        |CASE WHEN doc_id % 2 = 0 THEN 'utf-8'
        |  ELSE 'ISO-8859-1' END AS charset,
        |CASE WHEN doc_id % 2 = 0 THEN '<p>' || text || '</p>'
        |  ELSE text || ' café' END AS body_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "web_meta_robots" ->
      s"""SELECT doc_id,
        |['', 'noindex', 'noindex, nofollow', 'index, follow', '']
        |  [(doc_id % 5) + 1] AS directives,
        |doc_id % 5 IN (1, 2) AS noindex,
        |doc_id % 5 = 2 AS nofollow
        |FROM documents ORDER BY doc_id""".stripMargin,

    "web_sitemap" ->
      s"""SELECT doc_id, t.idx,
        |CASE t.idx WHEN 0 THEN 'HTTP://Example' || (doc_id % 3)
        |    || '.COM:80/a/' || doc_id || '?utm_source=x&id=7'
        |  ELSE 'https://site' || (doc_id % 5) || '.com/b' END AS url,
        |CASE t.idx WHEN 0 THEN '2024-01-'
        |    || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
        |  ELSE '' END AS lastmod,
        |CASE t.idx WHEN 0 THEN 'http://example' || (doc_id % 3)
        |    || '.com/a/' || doc_id || '?id=7'
        |  ELSE 'https://site' || (doc_id % 5) || '.com/b' END
        |  AS canonical_url
        |FROM documents, (VALUES (0), (1)) t(idx)
        |ORDER BY doc_id, t.idx""".stripMargin,

    "docs_stem_vocab" -> {
      // hand-traced Porter stems of the closed corpus vocabulary; only
      // these six words move, the rest are fixed points
      val dict = Seq("key" -> "kei", "query" -> "queri",
        "customer" -> "custom", "merge" -> "merg", "table" -> "tabl",
        "value" -> "valu")
      val cases = dict.map { case (w, st) =>
        s"WHEN '$w' THEN '$st'" }.mkString(" ")
      s"""WITH toks AS (
        |  SELECT unnest([x FOR x IN string_split(text, ' ')
        |    IF len(x) > 0]) AS w FROM documents),
        |st AS (SELECT w, CASE w $cases ELSE w END AS stem FROM toks)
        |SELECT stem, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(count(DISTINCT w) AS BIGINT) AS n_forms
        |FROM st GROUP BY 1 ORDER BY stem""".stripMargin
    },

    "docs_nfc_keys" -> {
      val folded = NfcFolded.map(f => s"'$f'").mkString(", ")
      s"""SELECT doc_id,
        |false AS raw_equal,
        |true AS nfc_equal,
        |true AS key_match,
        |[$folded][(doc_id % 4) + 1] AS folded
        |FROM documents ORDER BY doc_id""".stripMargin
    },

    "docs_porter_stems" -> {
      val words = PorterVectors.map(v => s"'${v._1}'").mkString(", ")
      val stems = PorterVectors.map(v => s"'${v._2}'").mkString(", ")
      s"""SELECT doc_id,
        |[$words][(doc_id % 20) + 1] AS word,
        |[$stems][(doc_id % 20) + 1] AS stem
        |FROM documents ORDER BY doc_id""".stripMargin
    },

    "docs_warc_wet" ->
      """WITH p AS (
        |  SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN 'T' || doc_id || ' ' || text || ' & tail'
        |    ELSE text END AS payload
        |  FROM documents WHERE doc_id % 3 < 2)
        |SELECT doc_id, 0 AS rec_idx, 'conversion' AS warc_type,
        |'http://example.org/doc/' || doc_id AS target_uri,
        |'<urn:graft:resp:' || doc_id || '>' AS refers_to,
        |CAST(octet_length(encode(payload)) AS BIGINT) AS content_length,
        |payload
        |FROM p ORDER BY doc_id""".stripMargin,

    "web_robots_sitemap" ->
      """SELECT doc_id,
        |CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 0 END
        |  AS BIGINT) AS n_sitemaps,
        |CASE doc_id % 4
        |  WHEN 0 THEN 'https://h' || (doc_id % 3) || '.com/sm.xml'
        |  WHEN 1 THEN 'https://h' || (doc_id % 3) || '.com/a.xml'
        |  ELSE '' END AS first_sitemap,
        |CAST(CASE doc_id % 4 WHEN 0 THEN 2.0 WHEN 1 THEN 0.5
        |  ELSE -1.0 END AS DOUBLE) AS crawl_delay
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the frontier pieces in closed form (canonical urls, crawled keys,
    // the three robots decisions) + the discovery-graph PageRank rounds
    // unrolled exactly like web_host_rank's, keyed by host VARCHAR
    "web_frontier" -> {
      def iter(i: Int) =
        s"""i$i AS (SELECT e.dst AS id, sum(r${i - 1}.rank_i // deg.outdeg)
           |    AS s
           |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.id
           |  JOIN deg ON e.src = deg.src GROUP BY 1),
           |r$i AS (SELECT nodes.id,
           |  (CAST(15 AS BIGINT) * 1000000000) // (100 * n.n)
           |    + (85 * CAST(coalesce(i$i.s, 0) AS BIGINT)) // 100 AS rank_i
           |  FROM nodes CROSS JOIN n LEFT JOIN i$i ON nodes.id = i$i.id)"""
          .stripMargin
      s"""WITH u0 AS (
        |  SELECT doc_id,
        |  'http://a' || (doc_id % 3) || '.example.com/p/' || doc_id
        |    || '?id=7' AS url,
        |  'a' || (doc_id % 3) || '.example.com' AS host
        |  FROM documents),
        |f0 AS (
        |  SELECT url, host FROM u0
        |  WHERE doc_id % 4 <> 0
        |  AND doc_id % 3 <> 0
        |  AND NOT (doc_id % 3 = 1 AND CAST(doc_id AS VARCHAR) LIKE '1%')),
        |f1 AS (
        |  SELECT DISTINCT 'https://site' || (doc_id % 5) || '.com/b'
        |    AS url,
        |  'site' || (doc_id % 5) || '.com' AS host FROM documents),
        |f AS (SELECT * FROM f0 UNION ALL SELECT * FROM f1),
        |e AS (
        |  SELECT DISTINCT 'site' || (doc_id % 5) || '.com' AS src,
        |  'a' || ((doc_id % 5) % 3) || '.example.com' AS dst
        |  FROM documents
        |  UNION
        |  SELECT DISTINCT 'a' || (doc_id % 3) || '.example.com',
        |  'site' || (doc_id % 3) || '.com' FROM documents),
        |nodes AS (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        |  FROM e GROUP BY 1),
        |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) // n.n AS rank_i
        |  FROM nodes, n),
        |${iter(1)},
        |${iter(2)},
        |${iter(3)},
        |fr AS (
        |  SELECT f.url, f.host,
        |  CAST(coalesce(r3.rank_i, 0) AS BIGINT) AS rank_i,
        |  CASE WHEN f.host LIKE '%.example.com' THEN 'example.com'
        |    ELSE f.host END AS domain,
        |  CAST(CASE f.host WHEN 'a1.example.com' THEN 500
        |    WHEN 'a2.example.com' THEN 3000
        |    ELSE 1000 END AS BIGINT) AS delay_ms
        |  FROM f LEFT JOIN r3 ON f.host = r3.id),
        |sl AS (SELECT domain,
        |CAST(row_number() OVER (PARTITION BY domain
        |  ORDER BY rank_i DESC, url) AS INT) AS slot,
        |url, host, rank_i, delay_ms
        |FROM fr)
        |SELECT domain, slot, url, host, rank_i,
        |GREATEST(CAST(slot - 1 AS BIGINT),
        |  (CAST(slot - 1 AS BIGINT) * delay_ms + 999) // 1000)
        |  AS not_before_tick
        |FROM sl ORDER BY domain, slot""".stripMargin
    })
}
