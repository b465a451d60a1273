package graft

import graft.functions.HttpMessage._
import org.scalatest.funsuite.AnyFunSuite

/** HTTP/1.x response parsing for WARC blocks: separator and line-ending
  * leniency, status extraction, header order and case-insensitivity,
  * charset parameter parsing, decode fallbacks, and the degrade-never-
  * throw contract on garbage. The gate query `docs_warc_http` drives
  * the full WARC→HTTP→text path with a closed-form oracle. */
class HttpMessageSpec extends AnyFunSuite {

  private def bytes(s: String, cs: String = "ISO-8859-1") = s.getBytes(cs)

  test("a well-formed response parses: status, ordered headers, body") {
    val r = parseResponse(bytes(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "X-Dup: first\r\nx-dup: second\r\n\r\nbody bytes")).get
    assert(r.status === 200)
    assert(r.header("content-type") === Some("text/html"))
    // duplicates keep document order; header() returns the FIRST
    assert(r.header("X-DUP") === Some("first"))
    assert(new String(r.body, "UTF-8") === "body bytes")
  }

  test("LF-only line endings and a missing reason phrase still parse; " +
      "malformed header lines skip") {
    val r = parseResponse(bytes(
      "HTTP/1.0 301\nLocation: /new\nnot-a-header\n\n")).get
    assert(r.status === 301)
    assert(r.header("Location") === Some("/new"))
    assert(r.headers.length === 1)
    assert(r.body.isEmpty)
  }

  test("non-HTTP blocks, unparsable status codes, and blocks without " +
      "a header/body separator return None") {
    assert(parseResponse(bytes("<html>not http</html>\r\n\r\n")) === None)
    assert(parseResponse(bytes("HTTP/1.1 abc OK\r\n\r\n")) === None)
    assert(parseResponse(bytes("HTTP/1.1 200 OK\r\nno separator")) === None)
    assert(parseResponse(null) === None)
    assert(parseResponse(Array.emptyByteArray) === None)
  }

  test("charsetOf: parameter extraction, quoting, casing, defaults") {
    assert(charsetOf("text/html; charset=UTF-8") === "UTF-8")
    assert(charsetOf("text/html;charset=\"iso-8859-1\"") === "iso-8859-1")
    assert(charsetOf("text/html; CHARSET=latin1") === "latin1")
    assert(charsetOf("text/plain") === "UTF-8")
    assert(charsetOf("") === "UTF-8")
    assert(charsetOf(null) === "UTF-8")
    assert(charsetOf("text/html; charset=") === "UTF-8")
  }

  test("decodeBody honors the declared charset and falls back to a " +
      "replacing UTF-8 decode on unknown names") {
    val latin = "café".getBytes("ISO-8859-1") // single 0xE9 byte
    assert(decodeBody(latin, "ISO-8859-1") === "café")
    // the same byte is an invalid UTF-8 sequence → replacement char
    assert(decodeBody(latin, "no-such-charset").contains('�'))
    assert(decodeBody("ok".getBytes("UTF-8"), "utf-8") === "ok")
  }
}
