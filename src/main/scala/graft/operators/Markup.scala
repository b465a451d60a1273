package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup → clean text — the first step of every web-corpus
  * curation recipe (C4, CCNet, RefinedWeb all begin by reducing crawled
  * markup to running text before any quality or dedup signal is
  * computed). Implemented as a chain of `regexp_replace` columns so the
  * whole strip stays inside whole-stage codegen: one narrow pass, no
  * UDF, no shuffle.
  *
  * Pattern discipline: every regex avoids backreferences and lookaround
  * so the exact same pattern string runs under both java.util.regex and
  * RE2-family engines (an oracle replays the chain verbatim;
  * `<script>`/`<style>` get separate literal patterns instead of a
  * `<(script|style)>.*?</\1>` backreference for this reason). Case
  * folding and dot-all are inline flags `(?is)`, supported by both.
  *
  * Entity decoding covers the named entities that dominate real crawl
  * text (`&amp; &lt; &gt; &quot; &#39; &nbsp;`) — `&amp;` is decoded
  * LAST so `&amp;lt;` (an escaped literal `<` in the source page)
  * decodes to `&lt;` the text, not to a `<` that a second pass would
  * treat as markup. Numeric character references beyond `&#39;` are out
  * of scope (full HTML5 entity tables are a dictionary problem, not a
  * regex problem). */
object Markup {

  /** Drop `<script>…</script>` and `<style>…</style>` including content
    * (their text is code, not prose), then comments, then all remaining
    * tags; tags are replaced by a space so `…text</p><p>more…` does not
    * fuse words. */
  def stripTags(c: Column): Column = {
    val noScript =
      regexp_replace(c, "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    regexp_replace(noComment, "(?s)</?[A-Za-z!][^>]*>", " ")
  }

  /** Decode the high-frequency named entities; `&amp;` last (see
    * object scaladoc). */
  def decodeEntities(c: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (ent, ch)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(ent),
        java.util.regex.Matcher.quoteReplacement(ch))
    }
  }

  /** Collapse runs of whitespace to single spaces and trim. */
  def collapseWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** The full strip: tags (script/style/comment-aware) → entities →
    * whitespace. The order matters: entity decode must run AFTER tag
    * removal (so `&lt;p&gt;` in text never becomes a strippable tag)
    * and whitespace collapse last (tag replacement introduces spaces). */
  def htmlToText(c: Column): Column =
    collapseWhitespace(decodeEntities(stripTags(c)))

  /** The combined `<meta name="robots">` directives of a page,
    * lowercased and comma-joined across ALL robots meta tags — the
    * PAGE-level exclusion channel next to the host-level RFC 9309
    * filter ([[WebArchive.robotsDecisions]]): a compliant corpus
    * pipeline must honor both before a fetched page may train.
    * Matched: both attribute orders, quoted (either style) and
    * HTML5-legal UNQUOTED attribute values, any number of robots tags
    * (crawler semantics combine directives across tags). `[^>]*` keeps
    * each alternative inside ONE tag — a content= in a LATER tag
    * cannot pair with this tag's name=robots. Empty string when the
    * page carries no directive. Same pattern discipline as the strip
    * chain: no backreferences, no lookaround, inline `(?i)` only —
    * codegen'd regexp_extract_all, no UDF. */
  def metaRobotsContent(html: Column): Column = {
    // the trailing class consumes ONE boundary char (quote, space, '/',
    // '>') so name="robotsx" cannot false-match without lookahead
    val nameAttr = "name\\s*=\\s*['\"]?robots['\"\\s>/]"
    val quotedVal = "content\\s*=\\s*['\"]([^'\"]*)['\"]"
    val bareVal = "content\\s*=\\s*([^\\s>'\"]+)"
    // the four pattern cells are disjoint per tag (attribute order ×
    // quoting), so each robots tag contributes exactly one match
    val cells = Seq(
      s"(?i)<meta[^>]*$nameAttr[^>]*$quotedVal",
      s"(?i)<meta[^>]*$nameAttr[^>]*$bareVal",
      s"(?i)<meta[^>]*$quotedVal[^>]*$nameAttr",
      s"(?i)<meta[^>]*$bareVal[^>]*$nameAttr")
    val all = concat(cells.map(p =>
      regexp_extract_all(html, lit(p), lit(1))): _*)
    lower(array_join(filter(all, x => length(x) > 0), ", "))
  }

  /** (directives, noindex, nofollow) in ONE extraction pass — callers
    * selecting several robots columns should unpack this struct rather
    * than call the per-flag helpers (each of those rebuilds the full
    * extraction tree and relies on subexpression elimination). The
    * `none` directive implies both flags (Google/Bing semantics);
    * membership is WHOLE-TOKEN over the directive list split on commas
    * AND whitespace — substring matching would let content like
    * "nonetheless" or "noindexable" set the flags (ADVICE r10), while a
    * comma-only split would drop space-separated lists like
    * content="noindex nofollow", common in dirty crawls and honored by
    * major crawlers (ADVICE r11). */
  def metaRobotsFlags(html: Column): Column = {
    val c = metaRobotsContent(html)
    val toks = filter(transform(split(c, "[,\\s]+"), t => trim(t)),
      t => t =!= "")
    def has(d: String) = array_contains(toks, d)
    val none = has("none")
    struct(c.as("directives"),
      (has("noindex") || none).as("noindex"),
      (has("nofollow") || none).as("nofollow"))
  }

  def metaNoindex(html: Column): Column =
    metaRobotsFlags(html).getField("noindex")

  def metaNofollow(html: Column): Column =
    metaRobotsFlags(html).getField("nofollow")

  /** Sitemap (sitemaps.org) entries: array<struct<loc, lastmod>> in
    * document order — the crawl-DISCOVERY channel next to the
    * compliance filters (robots.txt tells a crawler where it may not
    * go; the sitemap tells it where to look and how fresh it is, the
    * lastmod being the incremental-recrawl scheduling signal). Each
    * `<url>` block parses independently; loc/lastmod values trim
    * surrounding whitespace; a block without `<lastmod>` yields ''.
    * One codegen-friendly regexp_extract_all + a row-grain transform —
    * no UDF, no XML library, the strip-chain pattern discipline
    * (lazy quantifiers only, no backreferences/lookaround). */
  def sitemapEntries(xml: Column): Column = {
    val blocks = regexp_extract_all(xml,
      lit("(?is)<url>(.*?)</url>"), lit(1))
    transform(blocks, b => struct(
      regexp_extract(b, "(?is)<loc>\\s*(.*?)\\s*</loc>", 1).as("loc"),
      regexp_extract(b, "(?is)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)
        .as("lastmod")))
  }
}
