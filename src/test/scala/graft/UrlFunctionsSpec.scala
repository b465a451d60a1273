package graft

import graft.functions.UrlFunctions.canonicalizeUrl
import org.scalatest.funsuite.AnyFunSuite

class UrlFunctionsSpec extends AnyFunSuite {

  test("scheme/host lowercase; path and params keep their case") {
    assert(canonicalizeUrl("HTTPS://WWW.Example.COM/Path?Q=Value") ===
      "https://www.example.com/Path?Q=Value")
  }

  test("default ports drop; non-default ports survive") {
    assert(canonicalizeUrl("http://a.com:80/x") === "http://a.com/x")
    assert(canonicalizeUrl("https://a.com:443/x") === "https://a.com/x")
    assert(canonicalizeUrl("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(canonicalizeUrl("https://a.com:80/x") === "https://a.com:80/x")
  }

  test("fragment strips; empty path becomes /") {
    assert(canonicalizeUrl("http://a.com#frag") === "http://a.com/")
    assert(canonicalizeUrl("http://a.com/x#a?b=1") === "http://a.com/x")
    assert(canonicalizeUrl("http://a.com") === "http://a.com/")
  }

  test("tracking params drop, remaining params keep ORIGINAL order") {
    assert(canonicalizeUrl(
      "http://a.com/p?utm_source=s&b=2&gclid=g&a=1&fbclid=f") ===
      "http://a.com/p?b=2&a=1")
    assert(canonicalizeUrl("http://a.com/p?utm_x=1") === "http://a.com/p")
    assert(canonicalizeUrl("http://a.com/p?") === "http://a.com/p")
    // params without '=' are names too
    assert(canonicalizeUrl("http://a.com/p?utm_z&keep") ===
      "http://a.com/p?keep")
  }

  test("non-URLs pass through unchanged (minus any fragment)") {
    assert(canonicalizeUrl("not a url") === "not a url")
    assert(canonicalizeUrl(null) === null)
  }

  test("registrable domain: two labels by default, three on known " +
      "multi-part suffixes") {
    import graft.functions.UrlFunctions.registrableDomain
    assert(registrableDomain("www.example.com") === "example.com")
    assert(registrableDomain("a.b.site.co.uk") === "site.co.uk")
    assert(registrableDomain("deep.x.portal.com.br") === "portal.com.br")
    assert(registrableDomain("example.org") === "example.org")
    assert(registrableDomain("localhost") === "localhost")
    assert(registrableDomain("CDN.Static.Example.ORG") === "example.org")
    // a bare multi-part suffix passes through whole
    assert(registrableDomain("co.uk") === "co.uk")
    assert(registrableDomain(null) === null)
  }

  test("idempotent: canonical of canonical is itself") {
    for (u <- Seq("HTTP://A.com:80/x?utm_a=1&k=2#f",
        "https://b.org", "http://c.net:9090/p?x=1",
        "http://[2001:DB8::1]:8080/x", "http://192.168.0.1/x")) {
      val once = canonicalizeUrl(u)
      assert(canonicalizeUrl(once) === once, u)
    }
  }

  test("bracketed IPv6 hosts: the port colon is the one AFTER ']', " +
      "never a colon inside the literal") {
    assert(canonicalizeUrl("http://[2001:DB8::1]:8080/x") ===
      "http://[2001:db8::1]:8080/x")
    assert(canonicalizeUrl("http://[2001:db8::1]:80/x") ===
      "http://[2001:db8::1]/x")
    assert(canonicalizeUrl("http://[::1]/x") === "http://[::1]/x")
  }

  test("address-literal hosts group as themselves, not their tail " +
      "octets") {
    import graft.functions.UrlFunctions.registrableDomain
    assert(registrableDomain("192.168.0.1") === "192.168.0.1")
    assert(registrableDomain("[2001:db8::1]") === "[2001:db8::1]")
    // all-digit multi-label NAMES don't exist; digits+dots = IPv4
    assert(registrableDomain("10.0.0.0") === "10.0.0.0")
    // ASCII digits ONLY: a host of non-ASCII digits (Arabic-Indic,
    // Devanagari) is a NAME, not an address literal — it must take the
    // normal registrable-domain path and reduce to eTLD+1 (ADVICE r11;
    // the literal path would have passed all 3 labels through whole)
    assert(registrableDomain("١.٢.٣") === "٢.٣")
    assert(registrableDomain("x.१२.com") === "१२.com")
  }
}
