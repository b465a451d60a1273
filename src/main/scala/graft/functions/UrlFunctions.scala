package graft.functions

/** URL canonicalization for crawl-corpus dedup (the RefinedWeb/C4-style
  * URL-level pass that runs BEFORE any content fetch or text dedup):
  * two spellings of the same resource must map to one key, or the
  * corpus keeps both copies and every per-URL stat double-counts.
  *
  * The rules are a small, DOCUMENTED string algebra (not java.net.URI,
  * whose parsing quirks an oracle cannot replay):
  *   1. strip the fragment (`#…`);
  *   2. lowercase the scheme and host;
  *   3. drop the default port (`:80` for http, `:443` for https);
  *   4. empty path → `/`;
  *   5. drop tracking query params — name starts with `utm_`, or name
  *      ∈ {fbclid, gclid} — keeping the REST in original order (param
  *      order can be semantic; sorting would merge distinct resources);
  *   6. drop the `?` when no params survive.
  * Malformed input (no `://`) returns the input unchanged — a filter
  * upstream decides what to do with non-URLs; silently "fixing" them
  * would manufacture collisions. */
object UrlFunctions {

  private val Tracking = Set("fbclid", "gclid")

  /** Multi-part public suffixes the domain extractor recognizes — a
    * deliberately SMALL embedded subset of the publicsuffix.org list
    * (the full list is a data file a deployment ships alongside; the
    * ALGORITHM is what's under test): if the host's last two labels
    * form one of these, the registrable domain keeps three labels,
    * else two. */
  private[graft] val MultiPartSuffixes = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.br", "com.au", "co.jp", "com.cn", "com.mx", "co.in")

  /** Registrable ("eTLD+1") domain of a host — the grouping key for
    * per-site corpus stats and host-level dedup/rate policies
    * (RefinedWeb/CCNet aggregate by it). Single-label hosts
    * (`localhost`) and bare suffixes pass through whole; output is
    * lowercased. Null → null. */
  def registrableDomain(host: String): String = {
    if (host == null) return null
    val h = host.toLowerCase(java.util.Locale.ROOT)
    // address literals group as themselves: an IPv4 host would otherwise
    // "register" as its last two octets ("192.168.0.1" → "0.1"), and an
    // IPv6 literal has no label structure at all. ASCII digits only —
    // Unicode-aware isDigit would misclassify hosts of non-ASCII digits
    // (e.g. Arabic-Indic) as address literals (ADVICE r11).
    if (h.startsWith("[") ||
      h.nonEmpty && h.forall(c => (c >= '0' && c <= '9') || c == '.'))
      return h
    val labels = h.split('.')
    if (labels.length <= 1) return h
    val last2 = labels.takeRight(2).mkString(".")
    val keep = if (MultiPartSuffixes.contains(last2)) 3 else 2
    labels.takeRight(math.min(keep, labels.length)).mkString(".")
  }

  def canonicalizeUrl(url: String): String = {
    if (url == null) return null
    val noFrag = {
      val h = url.indexOf('#')
      if (h >= 0) url.substring(0, h) else url
    }
    val sep = noFrag.indexOf("://")
    if (sep < 0) return noFrag
    val scheme = noFrag.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = noFrag.substring(sep + 3)
    val slash = rest.indexOf('/')
    val (hostport, pathq) =
      if (slash < 0) (rest, "") else (rest.substring(0, slash),
        rest.substring(slash))
    // the port separator is the colon AFTER a bracketed IPv6 literal's
    // ']' (RFC 3986 §3.2.2) — a bare indexOf(':') would split inside
    // "[2001:db8::1]:8080" and emit garbage host + port
    val colon =
      if (hostport.startsWith("[")) {
        val close = hostport.indexOf(']')
        if (close >= 0 && close + 1 < hostport.length &&
          hostport.charAt(close + 1) == ':') close + 1
        else -1
      } else hostport.indexOf(':')
    val host =
      (if (colon < 0) hostport else hostport.substring(0, colon))
        .toLowerCase(java.util.Locale.ROOT)
    val port = if (colon < 0) "" else hostport.substring(colon + 1)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    val q = pathq.indexOf('?')
    val path0 = if (q < 0) pathq else pathq.substring(0, q)
    val path = if (path0.isEmpty) "/" else path0
    val query = if (q < 0) "" else pathq.substring(q + 1)
    val kept = query.split("&").filter { p =>
      p.nonEmpty && {
        val name = p.split("=", 2)(0)
        !name.startsWith("utm_") && !Tracking.contains(name)
      }
    }
    scheme + "://" + host +
      (if (keepPort) ":" + port else "") + path +
      (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
  }
}
