package graft.functions

import java.nio.charset.Charset

/** Minimal HTTP/1.x response-message parsing — the step between a WARC
  * response record's block and the HTML/text stack: a crawl response
  * block is "status line, header lines, blank line, body", and the
  * charset needed to decode the body lives in the Content-Type header.
  * Lenient where real crawls are dirty (LF-only line endings, missing
  * reason phrases, unknown or absent charsets fall back to UTF-8's
  * replacing decode, malformed header lines skip); `None` only when the
  * block is not an HTTP response at all (no `HTTP/` status line, no
  * parseable status code, or no header/body separator) — degrade,
  * never throw (the [[WarcCodec]] discipline). Header NAMES compare
  * case-insensitively; duplicate headers keep document order and
  * `header()` returns the FIRST occurrence (RFC 9110 field order). */
object HttpMessage {

  final case class Response(status: Int,
      headers: Vector[(String, String)], body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
  }

  def parseResponse(block: Array[Byte]): Option[Response] = {
    if (block == null) return None
    // header/body separator: the EARLIEST of CRLFCRLF and LFLF — a
    // LF-only header section must split at its own blank line, not at
    // a CRLF blank line further down inside a CRLF-bodied HTML file
    // (the two patterns cannot start at the same offset)
    val crlf = ByteSearch.indexOf(block, "\r\n\r\n".getBytes, 0)
    val lf = ByteSearch.indexOf(block, "\n\n".getBytes, 0)
    val (sep, bodyAt) =
      if (crlf < 0 && lf < 0) (-1, 0)
      else if (lf < 0 || (crlf >= 0 && crlf < lf)) (crlf, crlf + 4)
      else (lf, lf + 2)
    if (sep < 0) return None
    // header bytes are latin-1 by spec — every byte round-trips
    val head = new String(block, 0, sep, "ISO-8859-1")
    val lines = head.split("\r?\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return None
    // split on whitespace RUNS: a doubled space ("HTTP/1.1  200 OK") in a
    // dirty crawl must not make statusParts(1) empty and drop the record
    // (the parser is otherwise lenient — ADVICE r10)
    val statusParts = lines(0).trim.split("\\s+", 3)
    if (statusParts.length < 2) return None
    val status = statusParts(1).toIntOption.getOrElse(return None)
    val headers = lines.iterator.drop(1).flatMap { l =>
      val ci = l.indexOf(':')
      if (ci <= 0) None
      else Some(l.substring(0, ci).trim -> l.substring(ci + 1).trim)
    }.toVector
    Some(Response(status, headers,
      java.util.Arrays.copyOfRange(block, bodyAt, block.length)))
  }

  /** The `charset` parameter of a Content-Type value, verbatim
    * (unquoted, whitespace-trimmed); "UTF-8" when absent. */
  def charsetOf(contentType: String): String = {
    if (contentType == null) return "UTF-8"
    contentType.split(";").iterator.map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("charset=") =>
        // both quote styles occur in dirty crawls (charset="utf-8" and
        // charset='utf-8'); an unstripped quote makes Charset.forName
        // throw and decodeBody silently fall back to UTF-8 (ADVICE r10)
        p.substring("charset=".length).trim
          .stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("'").stripSuffix("'")
    }.filter(_.nonEmpty).getOrElse("UTF-8")
  }

  /** Decode body bytes under the declared charset; unknown or
    * unsupported names fall back to UTF-8. Always a REPLACING decode —
    * mojibake degrades, never throws. */
  def decodeBody(body: Array[Byte], charset: String): String = {
    val cs =
      try Charset.forName(charset)
      catch { case _: Exception => Charset.forName("UTF-8") }
    new String(body, cs)
  }

  /** Decode a `Transfer-Encoding: chunked` body (RFC 9112 §7.1):
    * hex-size[;extensions] CRLF, chunk bytes, CRLF, …, terminated by a
    * zero-size chunk (trailers ignored). `None` on any malformation —
    * callers fall back to the RAW bytes, because a crawl block that
    * CLAIMS chunking but is stored de-chunked (some WARC writers strip
    * it without dropping the header) is the common dirty case. */
  def decodeChunked(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    while (true) {
      // read the size line
      var eol = i
      while (eol < body.length && body(eol) != '\n') eol += 1
      if (eol >= body.length) return None
      val lineEnd = if (eol > i && body(eol - 1) == '\r') eol - 1 else eol
      val line = new String(body, i, lineEnd - i, "ISO-8859-1")
      val sizeHex = line.takeWhile(_ != ';').trim
      if (sizeHex.isEmpty ||
          !sizeHex.forall(c => Character.digit(c, 16) >= 0)) return None
      val size =
        try Integer.parseInt(sizeHex, 16)
        catch { case _: NumberFormatException => return None }
      i = eol + 1
      if (size == 0) return Some(out.toByteArray) // trailers ignored
      // subtraction form: `i + size` overflows Int at adversarial
      // sizes like 7fffffff and would crash the copy instead of
      // degrading to None
      if (size > body.length - i) return None
      out.write(body, i, size)
      i += size
      // the chunk's trailing CRLF (lenient: LF alone)
      if (i < body.length && body(i) == '\r') i += 1
      if (i >= body.length || body(i) != '\n') return None
      i += 1
    }
    None // unreachable
  }

}
