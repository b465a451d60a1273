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
    // single-quoted parameter values are common in dirty crawls — an
    // unstripped quote would silently fall decodeBody back to UTF-8
    assert(charsetOf("text/html; charset='iso-8859-1'") === "iso-8859-1")
    assert(charsetOf("text/html; charset=''") === "UTF-8")
  }

  test("status line splits on whitespace RUNS: a doubled space must not " +
      "drop the record") {
    val r = parseResponse(bytes(
      "HTTP/1.1  200 OK\r\nContent-Type: text/plain\r\n\r\nok")).get
    assert(r.status === 200)
    assert(parseResponse(bytes("HTTP/1.1\t404\tNot Found\r\n\r\n"))
      .get.status === 404)
  }

  test("decodeChunked: multi-chunk bodies with extensions round-trip; " +
      "empty bodies are a lone terminator; malformation returns None") {
    val chunked = bytes("5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
    assert(decodeChunked(chunked).map(new String(_, "UTF-8")) ===
      Some("hello world"))
    assert(decodeChunked(bytes("0\r\n\r\n"))
      .map(_.length) === Some(0))
    // lenient LF-only framing
    assert(decodeChunked(bytes("3\nabc\n0\n\n"))
      .map(new String(_, "UTF-8")) === Some("abc"))
    assert(decodeChunked(bytes("zz\r\nhello\r\n0\r\n\r\n")) === None)
    assert(decodeChunked(bytes("ff\r\nhello\r\n0\r\n\r\n")) === None)
    assert(decodeChunked(bytes("5\r\nhello")) === None)
    assert(decodeChunked(bytes("plain body, no framing")) === None)
    assert(decodeChunked(Array.emptyByteArray) === None)
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
