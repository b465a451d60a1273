package graft

import graft.functions.RobotsTxt
import graft.operators.WebArchive

/** RFC 9309 robots.txt semantics: parsing (group formation, merging,
  * comments, unknown directives), wildcard/anchor matching, precedence
  * (longest match, Allow-wins-ties), group selection (exact agent over
  * `*`), the allow-all defaults, and the relational operator's parity
  * with the one-shot decision. The gate query `web_robots_allowed`
  * value-checks 5 host policies × 10 paths against DuckDB. */
class RobotsTxtSpec extends SparkSpec {

  import spark.implicits._
  import RobotsTxt.{isAllowed, matchLen, parse}

  test("matchLen: prefix, '*' wildcard, '$' anchor, precedence length") {
    assert(matchLen("/fish", "/fish.html") === 5)
    assert(matchLen("/fish", "/fishheads/yummy.html") === 5)
    assert(matchLen("/fish", "/catfish") === -1)
    assert(matchLen("/*.php", "/index.php") === 6)
    assert(matchLen("/*.php", "/folder/any.php.file.html") === 6)
    assert(matchLen("/*.php", "/index.html") === -1)
    assert(matchLen("/*.php$", "/filename.php") === 7)
    assert(matchLen("/*.php$", "/filename.php?parameters") === -1)
    assert(matchLen("/fish*.php", "/fish.php") === 10)
    assert(matchLen("/fish*.php", "/fishheads/catfish.php?p=1") === 10)
    assert(matchLen("/fish*.php", "/fish.html") === -1)
    // multiple wildcards place greedily without blocking later segments
    assert(matchLen("/a*b*c", "/axxbxxc-and-more") === 6)
    assert(matchLen("/a*b*c$", "/axxbxxc") === 7)
    assert(matchLen("/a*b*c$", "/axxbxxc-and-more") === -1)
    // '$' alone anchors the empty pattern prefix; '*$' matches any end
    assert(matchLen("/$", "/") === 2)
    assert(matchLen("/$", "/a") === -1)
    assert(matchLen("/*$", "/anything") === 3)
    // empty patterns never match (Disallow: = allow all)
    assert(matchLen("", "/anything") === -1)
  }

  test("parse: groups form on consecutive user-agent lines, merge " +
      "across repeats, strip comments, ignore unknown directives") {
    val txt =
      """# policy
        |User-agent: A
        |User-agent: B
        |Disallow: /x # trailing comment
        |Crawl-delay: 10
        |Allow: /x/y
        |
        |User-agent: a
        |Disallow: /z
        |Sitemap: https://example.com/sitemap.xml
        |""".stripMargin
    val g = parse(txt)
    assert(g("a").map(r => (r.allow, r.pattern)) ===
      Vector((false, "/x"), (true, "/x/y"), (false, "/z")))
    assert(g("b").map(_.pattern) === Vector("/x", "/x/y"))
    assert(!g.contains("sitemap"))
  }

  test("isAllowed: longest match wins, equal lengths tie to Allow, " +
      "no match allows, exact agent group beats '*'") {
    val txt =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/public/
        |Disallow: /dual/
        |Allow: /dual/
        |""".stripMargin
    assert(!isAllowed(txt, "anybot", "/private/a"))
    assert(isAllowed(txt, "anybot", "/private/public/b"))
    assert(isAllowed(txt, "anybot", "/dual/x")) // tie → Allow
    assert(isAllowed(txt, "anybot", "/open"))
    val specific = "User-agent: graftbot\nDisallow: /\n" +
      "User-agent: *\nDisallow: /tmp/\n"
    assert(!isAllowed(specific, "GraftBot", "/anything")) // case-insensitive
    assert(isAllowed(specific, "otherbot", "/anything"))
    assert(!isAllowed(specific, "otherbot", "/tmp/x"))
    assert(isAllowed("User-agent: *\nDisallow:", "anybot", "/all"))
    assert(isAllowed("", "anybot", "/all"))
    assert(isAllowed(null, "anybot", "/all"))
  }

  test("robotsDecisions matches the one-shot isAllowed on every " +
      "(policy, path) combination and keeps robots-less hosts") {
    val policies = Seq(
      "h0" -> ("User-agent: *\nDisallow: /private/\n" +
        "Allow: /private/public/\nDisallow: /dual/\nAllow: /dual/"),
      "h1" -> ("User-agent: graftbot\nDisallow: /\n" +
        "User-agent: *\nDisallow: /tmp/"),
      "h2" -> "User-agent: *\nDisallow: /*.pdf$\nDisallow: /img/*/raw",
      "h3" -> "User-agent: *\nDisallow:")
    val paths = Seq("/private/a", "/private/public/b", "/a.pdf",
      "/a.pdfx", "/tmp/x", "/index.html", "/private/public", "/",
      "/dual/x", "/img/a/raw")
    val hosts = policies.map(_._1) :+ "h4" // h4 has no robots row
    val pages = (for ((h, i) <- hosts.zipWithIndex; (p, j) <- paths.zipWithIndex)
      yield ((i * paths.size + j).toLong, h, p))
      .toDF("id", "host", "path")
    val robots = policies.toDF("host", "txt")
    val got = WebArchive.robotsDecisions(pages, "id", "host", "path",
        robots, "host", "txt", "graftbot")
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getBoolean(3))
      .toMap
    val byHost = policies.toMap
    for (h <- hosts; p <- paths) {
      val expected = isAllowed(byHost.getOrElse(h, ""), "graftbot", p)
      assert(got((h, p)) === expected, s"($h, $p)")
    }
    assert(got.size === hosts.size * paths.size)
  }

  test("Sitemap: directives extract group-independently, in order, " +
      "duplicates kept, comments and junk ignored") {
    import RobotsTxt.sitemaps
    val txt = "User-agent: a\nDisallow: /x\n" +
      "Sitemap: https://h.com/a.xml # trailing comment\n" +
      "User-agent: *\nSITEMAP: https://h.com/b.xml\n" +
      "sitemap:https://h.com/a.xml\n" +
      "Sitemap:\n" + // empty value drops
      "NotSitemap: https://h.com/c.xml\n"
    assert(sitemaps(txt) === Vector("https://h.com/a.xml",
      "https://h.com/b.xml", "https://h.com/a.xml"))
    assert(sitemaps("") === Vector.empty)
    assert(sitemaps(null) === Vector.empty)
  }

  test("Crawl-delay: group-bound with exact-over-* selection, " +
      "last-wins in group, non-numeric ignored") {
    import RobotsTxt.crawlDelayOf
    val txt = "User-agent: graftbot\nCrawl-delay: 0.5\nDisallow:\n" +
      "User-agent: *\nCrawl-delay: 9\n"
    assert(crawlDelayOf(txt, "GraftBot") === Some(0.5))
    assert(crawlDelayOf(txt, "otherbot") === Some(9.0))
    // an agent with its OWN group never inherits *'s delay
    val own = "User-agent: b\nDisallow: /x\nUser-agent: *\nCrawl-delay: 3"
    assert(crawlDelayOf(own, "b") === None)
    // last-wins within a group; non-numeric and negative ignored
    assert(crawlDelayOf(
      "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 4", "x") === Some(4.0))
    assert(crawlDelayOf("User-agent: *\nCrawl-delay: soon", "x") === None)
    assert(crawlDelayOf("User-agent: *\nCrawl-delay: -2", "x") === None)
    assert(crawlDelayOf(null, "x") === None)
  }

  test("Crawl-delay: infinities rejected like NaN — '1e999' or " +
      "'Infinity' must not poison pacing arithmetic (ADVICE r11)") {
    import RobotsTxt.crawlDelayOf
    assert(crawlDelayOf("User-agent: *\nCrawl-delay: 1e999", "x") === None)
    assert(crawlDelayOf("User-agent: *\nCrawl-delay: Infinity", "x")
      === None)
    assert(crawlDelayOf("User-agent: *\nCrawl-delay: -Infinity", "x")
      === None)
    assert(crawlDelayOf("User-agent: *\nCrawl-delay: NaN", "x") === None)
    // a later junk value must not erase an earlier good one? No —
    // last-wins applies only to ACCEPTED values; junk is skipped
    assert(crawlDelayOf(
      "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 1e999", "x")
      === Some(2.0))
  }

  test("pacing: notBeforeTickCol evaluated by Spark equals the " +
      "exact-integer scalar model on the full boundary grid — the " +
      "mechanical link the ScalaCheck pacing properties rest on") {
    import graft.queries.WebQueries.{notBeforeTickCol, notBeforeTickModel}
    import org.apache.spark.sql.functions.col
    // every delay boundary (0, the default, clamp edges) × slots
    // spanning the dense regime and a 2.5-billion-URL host — the
    // exactness edge of the double-division floor
    val delays = Seq(0L, 1L, 333L, 999L, 1000L, 1001L, 1500L, 2000L,
      3599999L, 3600000L)
    val slots = (0L to 64L) ++ Seq(999L, 1000L, 1001L, 65537L,
      1000000L, 2500000000L)
    val grid = for (s <- slots; d <- delays) yield (s, d)
    val got = spark.createDataFrame(grid.map { case (s, d) =>
        Tuple2(s, d) }).toDF("slot_m1", "delay_ms")
      .select(col("slot_m1"), col("delay_ms"),
        notBeforeTickCol(col("slot_m1"), col("delay_ms")).as("tick"))
      .collect()
    assert(got.length === grid.length)
    got.foreach { r =>
      val (s, d) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === notBeforeTickModel(s, d),
        s"Column/model divergence at slot_m1=$s delay_ms=$d")
    }
  }
}
