package graft

import graft.operators.Markup
import org.apache.spark.sql.functions._

class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Markup.htmlToText(col("h"))).as[String].head()

  test("tags stripped, text preserved, tag boundaries become word boundaries") {
    assert(strip("<p>hello</p><p>world</p>") === "hello world")
    assert(strip("<div class=\"x\" id='y'>a</div>") === "a")
    assert(strip("plain text, no markup") === "plain text, no markup")
  }

  test("script and style lose their CONTENT, not just their tags") {
    assert(strip("<script>var x = 1 < 2; if (x > 0) alert('hi');</script>ok")
      === "ok")
    assert(strip("<style>p { color: red; }</style>body") === "body")
    assert(strip("<SCRIPT TYPE=\"module\">code()</SCRIPT>after") === "after")
    // multi-line block (dot-all flag)
    assert(strip("<script>\nline1\nline2\n</script>kept") === "kept")
  }

  test("comments removed including markup inside them") {
    assert(strip("a<!-- <p>not real</p> -->b") === "a b")
    assert(strip("<!--\nmultiline\n-->x") === "x")
  }

  test("entities decode after tag strip; &amp; decodes last") {
    assert(strip("T&amp;C") === "T&C")
    assert(strip("1 &lt; 2 &gt; 0") === "1 < 2 > 0")
    assert(strip("&quot;q&quot; &#39;s&#39;") === "\"q\" 's'")
    assert(strip("a&nbsp;b") === "a b")
    // the escaped-escape case: &amp;lt; is a LITERAL "&lt;" in the text —
    // it must not double-decode into a strippable '<'
    assert(strip("&amp;lt;p&amp;gt;") === "&lt;p&gt;")
    // entity text inside a real tag's body survives as decoded text
    assert(strip("<p>&lt;script&gt;x&lt;/script&gt;</p>")
      === "<script>x</script>")
  }

  test("whitespace collapses to single spaces, trimmed") {
    assert(strip("  a \n\t b  ") === "a b")
    assert(strip("<p>\n  indented\n</p>") === "indented")
  }

  test("a full page reduces to its prose") {
    val page = "<html><head><title>t</title><style>a{}</style>" +
      "<script>var j = \"</div>\";</script></head>" +
      "<body><!-- nav --><h1>Title</h1><p>First&nbsp;para.</p>" +
      "<p>A &amp; B</p></body></html>"
    assert(strip(page) === "t Title First para. A & B")
  }

  private def metaFlags(html: String): (String, Boolean, Boolean) =
    Seq(html).toDF("h").select(Markup.metaRobotsContent(col("h")),
        Markup.metaNoindex(col("h")), Markup.metaNofollow(col("h")))
      .as[(String, Boolean, Boolean)].head()

  test("meta robots: both attribute orders and quote styles extract; " +
      "case folds; 'none' implies both flags; decoys don't match") {
    assert(metaFlags("<meta name=\"robots\" content=\"noindex\">") ===
      (("noindex", true, false)))
    assert(metaFlags("<meta content='noindex, nofollow' name='robots'>")
      === (("noindex, nofollow", true, true)))
    assert(metaFlags("<META NAME='ROBOTS' CONTENT='NOFOLLOW'>") ===
      (("nofollow", false, true)))
    assert(metaFlags("<meta name=\"robots\" content=\"none\">") ===
      (("none", true, true)))
    assert(metaFlags("<meta name=\"robots\" content=\"none, noarchive\">")
      === (("none, noarchive", true, true)))
    assert(metaFlags("<meta name=\"robots\" content=\"index, follow\">")
      === (("index, follow", false, false)))
    // decoys: wrong name (incl. a robots-PREFIXED name); content in a
    // LATER tag must not pair with an earlier tag's name=robots across
    // the '>' boundary
    assert(metaFlags("<meta name=\"description\" content=\"noindex\">")
      === (("", false, false)))
    assert(metaFlags("<meta name=\"robotsx\" content=\"noindex\">")
      === (("", false, false)))
    assert(metaFlags("<meta name=\"robots\"><meta name=\"d\" " +
      "content=\"noindex\">") === (("", false, false)))
    assert(metaFlags("<p>no meta at all</p>") === (("", false, false)))
  }

  private def sitemap(xml: String): Seq[(String, String)] =
    Seq(xml).toDF("x")
      .select(Markup.sitemapEntries(col("x")).as("e"))
      .as[Seq[(String, String)]].head()

  test("sitemap entries parse in document order, trim whitespace, " +
      "default missing lastmod to empty, and tolerate junk") {
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>  https://a.com/1 </loc>" +
      "<lastmod> 2024-02-03 </lastmod></url>" +
      "<url><loc>https://b.com/2</loc></url>" +
      "<url><lastmod>2024-01-01</lastmod></url></urlset>"
    assert(sitemap(xml) === Seq(
      ("https://a.com/1", "2024-02-03"),
      ("https://b.com/2", ""),
      ("", "2024-01-01")))
    assert(sitemap("no urls here") === Seq.empty)
    assert(sitemap("") === Seq.empty)
  }

  test("meta robots: HTML5 unquoted attributes match, and directives " +
      "combine across multiple robots tags") {
    assert(metaFlags("<meta name=robots content=noindex>") ===
      (("noindex", true, false)))
    assert(metaFlags("<meta name=robots content=\"noindex\">") ===
      (("noindex", true, false)))
    assert(metaFlags("<meta content=nofollow name=robots>") ===
      (("nofollow", false, true)))
    assert(metaFlags("<meta name=\"robots\" content=\"noindex\">" +
      "<p>x</p><meta name=robots content=nofollow>") ===
      (("noindex, nofollow", true, true)))
  }

  test("meta robots: flag membership is whole-token — 'nonetheless' or " +
      "'noindexable' content must not set flags (ADVICE r10)") {
    assert(metaFlags("<meta name=\"robots\" content=\"nonetheless\">") ===
      (("nonetheless", false, false)))
    assert(metaFlags("<meta name=\"robots\" content=\"noindexable\">") ===
      (("noindexable", false, false)))
    assert(metaFlags("<meta name=\"robots\" content=\"nofollower, x\">")
      === (("nofollower, x", false, false)))
    // and real tokens still match when packed without spaces
    assert(metaFlags("<meta name=\"robots\" content=\"noindex,nofollow\">")
      === (("noindex,nofollow", true, true)))
  }

  test("meta robots: whitespace-separated directive lists (no commas) " +
      "still set flags — dirty-crawl form honored by major crawlers " +
      "(ADVICE r11)") {
    assert(metaFlags("<meta name=\"robots\" content=\"noindex nofollow\">")
      === (("noindex nofollow", true, true)))
    assert(metaFlags("<meta name=\"robots\" content=\"noindex\tnofollow\">")
      === (("noindex\tnofollow", true, true)))
    // mixed commas + spaces, leading separator junk (directives keeps
    // the raw captured value — extraction never trims)
    assert(metaFlags(
      "<meta name=\"robots\" content=\", noindex ,, nofollow \">")
      === ((", noindex ,, nofollow ", true, true)))
    // whole-token discipline survives the new split
    assert(metaFlags("<meta name=\"robots\" content=\"nonetheless x\">")
      === (("nonetheless x", false, false)))
  }
}
