package graft.functions

import java.util.zip.Inflater
import scala.collection.mutable

/** Pure-JVM PDF parsing for the extract pipeline — the reference drives
  * pymupdf (`enem_pdf_extractor.py:236` `page.get_text()`, `:297-335`
  * image extraction); this parser re-expresses the subset of that
  * behavior that is decodable without native libraries, so the S2/S3
  * pipeline runs END-TO-END on raw PDF bytes instead of stopping at a
  * pre-extracted fixture boundary.
  *
  * Supported (the honest subset):
  *  - object scan: `N G obj … endobj` across the file (robust to xref
  *    style — classic tables and stream-xref files both resolve, since
  *    we never trust the xref, we scan)
  *  - FlateDecode streams (zlib via `java.util.zip.Inflater`); raw
  *    (unfiltered) streams; DCTDecode passthrough (JPEG bytes)
  *  - page tree walk: /Root → /Pages → /Kids (recursive), giving true
  *    page ORDER — not object-definition order
  *  - content-stream text: BT/ET blocks, `Tj` `'` `"` literal +
  *    `TJ` array show operators, PDF string escapes (\n \r \t \b \f
  *    \( \) \\ \ooo octal, line continuations) and <hex> strings;
  *    Td, TD and T-star treated as line breaks — matching get_text()'s
  *    line-per-text-op shape for the simple-font PDFs this targets
  *  - image XObjects: /Subtype /Image resources per page, with raw
  *    stream bytes (a DCTDecode image IS a .jpg payload; FlateDecode
  *    images inflate to raw samples)
  *
  * Documented limitations: embedded-subset fonts with non-standard
  * encodings garble (no ToUnicode CMap handling), encrypted PDFs are
  * rejected, and composite (CID) fonts show as raw bytes. Text strings
  * decode as Latin-1 — correct for Standard/WinAnsi-encoded simple
  * fonts, which covers Portuguese accents. */
object PdfCodec {

  final case class PdfPage(pageIdx: Int, text: String, hasImages: Boolean,
      imageNames: Seq[String])
  final case class PdfImage(pageIdx: Int, name: String, filter: String,
      bytes: Array[Byte])

  private final case class PdfObj(num: Int, dict: String,
      stream: Option[Array[Byte]])

  // ── public API ────────────────────────────────────────────────────────

  /** All pages in page-tree order with extracted text + image flags.
    * Returns Nil (never throws) for bytes this subset cannot parse. */
  def extractPages(bytes: Array[Byte]): Seq[PdfPage] =
    try {
      val objs = scanObjects(bytes)
      orderedPageObjects(objs).zipWithIndex.map { case (page, idx) =>
        val text = pageText(page, objs)
        val images = pageImages(page, objs)
        PdfPage(idx, text, images.nonEmpty, images.map(_._1))
      }
    } catch { case _: Exception => Nil }

  /** Image XObject payloads per page (reference: one file per page image,
    * `enem_pdf_extractor.py:297-335`). DCTDecode streams are emitted
    * verbatim (valid JPEG files); FlateDecode streams are inflated to raw
    * samples. */
  def extractImages(bytes: Array[Byte]): Seq[PdfImage] =
    try {
      val objs = scanObjects(bytes)
      orderedPageObjects(objs).zipWithIndex.flatMap { case (page, idx) =>
        pageImages(page, objs).map { case (name, obj) =>
          val filter = if (obj.dict.contains("/DCTDecode")) "DCTDecode"
            else if (obj.dict.contains("/FlateDecode")) "FlateDecode"
            else "raw"
          val payload = filter match {
            case "DCTDecode" => obj.stream.getOrElse(Array.empty[Byte])
            case "FlateDecode" =>
              obj.stream.map(inflate).getOrElse(Array.empty[Byte])
            case _ => obj.stream.getOrElse(Array.empty[Byte])
          }
          PdfImage(idx, name, filter, payload)
        }
      }
    } catch { case _: Exception => Nil }

  // ── object scan ───────────────────────────────────────────────────────

  /** Scan for every `N G obj … endobj` span. The dictionary text and the
    * raw (still-filtered) stream bytes are kept per object; later
    * definitions of the same number win (incremental updates append). */
  private def scanObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val out = mutable.Map[Int, PdfObj]()
    val n = bytes.length
    var i = 0
    while (i < n) {
      // find "obj" keyword preceded by "N G "
      val objAt = indexOf(bytes, "obj", i)
      if (objAt < 0) { i = n }
      else {
        // walk back over "N G " to the object number
        var j = objAt - 1
        while (j >= 0 && isWs(bytes(j))) j -= 1
        val genEnd = j + 1
        while (j >= 0 && isDigit(bytes(j))) j -= 1
        val genStart = j + 1
        while (j >= 0 && isWs(bytes(j))) j -= 1
        val numEnd = j + 1
        while (j >= 0 && isDigit(bytes(j))) j -= 1
        val numStart = j + 1
        if (numEnd > numStart && genEnd > genStart) {
          val num = new String(bytes, numStart, numEnd - numStart,
            "US-ASCII").toInt
          val endAt = indexOf(bytes, "endobj", objAt)
          val bodyEnd = if (endAt < 0) n else endAt
          val body = objAt + 3
          // stream payload: between "stream\r?\n" and "endstream"
          val streamKw = indexOf(bytes, "stream", body)
          val (dictEnd, stream) =
            if (streamKw >= 0 && streamKw < bodyEnd) {
              var s = streamKw + 6
              if (s < n && bytes(s) == '\r') s += 1
              if (s < n && bytes(s) == '\n') s += 1
              val se = indexOf(bytes, "endstream", s)
              val e = if (se < 0 || se > bodyEnd) bodyEnd else se
              (streamKw, Some(java.util.Arrays.copyOfRange(bytes, s, e)))
            } else (bodyEnd, None)
          val dict = new String(bytes, body, dictEnd - body, "ISO-8859-1")
          out(num) = PdfObj(num, dict, stream)
          i = if (endAt < 0) n else endAt + 6
        } else i = objAt + 3
      }
    }
    out.toMap
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\r' || b == '\n' || b == '\t' || b == 0
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nd = needle.getBytes("US-ASCII")
    var i = math.max(from, 0)
    val last = hay.length - nd.length
    while (i <= last) {
      var k = 0
      while (k < nd.length && hay(i + k) == nd(k)) k += 1
      if (k == nd.length) return i
      i += 1
    }
    -1
  }

  // ── dictionary mini-parsing (regex over the dict text) ────────────────

  private val RefRe = """(\d+)\s+\d+\s+R""".r
  // anchored: the reference must follow the key IMMEDIATELY (an inline
  // dictionary value like `/Resources << /XObject << /Im1 8 0 R >> >>`
  // must NOT resolve as `/Resources 8 0 R`)
  private val KeyRefRe = """^\s*(\d+)\s+\d+\s+R""".r

  private def dictRef(dict: String, key: String): Option[Int] = {
    val at = dict.indexOf(key)
    if (at < 0) None
    else KeyRefRe.findFirstMatchIn(dict.substring(at + key.length))
      .map(_.group(1).toInt)
  }

  private def dictRefArray(dict: String, key: String): Seq[Int] = {
    val at = dict.indexOf(key)
    if (at < 0) return Nil
    val open = dict.indexOf('[', at)
    // single-ref form: /Contents 5 0 R
    if (open < 0 || dict.substring(at + key.length, open).trim.nonEmpty)
      return dictRef(dict, key).toSeq
    val close = dict.indexOf(']', open)
    if (close < 0) return Nil
    RefRe.findAllMatchIn(dict.substring(open, close))
      .map(_.group(1).toInt).toSeq
  }

  // ── page tree ─────────────────────────────────────────────────────────

  private def orderedPageObjects(objs: Map[Int, PdfObj]): Seq[PdfObj] = {
    val catalog = objs.values.find(o => o.dict.contains("/Catalog"))
    val rootPages = catalog.flatMap(c => dictRef(c.dict, "/Pages"))
    def walk(num: Int, depth: Int): Seq[PdfObj] = {
      if (depth > 64) return Nil // cycle guard
      objs.get(num) match {
        case None => Nil
        case Some(o) if o.dict.contains("/Kids") =>
          dictRefArray(o.dict, "/Kids").flatMap(walk(_, depth + 1))
        case Some(o) if o.dict.contains("/Page") => Seq(o)
        case _ => Nil
      }
    }
    rootPages.map(walk(_, 0)).getOrElse {
      // no catalog (damaged file): fall back to object-number order
      objs.values.filter(o => o.dict.contains("/Type") &&
        o.dict.contains("/Page") && !o.dict.contains("/Pages"))
        .toSeq.sortBy(_.num)
    }
  }

  // ── text extraction ───────────────────────────────────────────────────

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (!inf.finished()) return out.toByteArray // truncated
    }
    inf.end()
    out.toByteArray
  }

  private def contentBytes(page: PdfObj, objs: Map[Int, PdfObj]): Array[Byte] = {
    val parts = dictRefArray(page.dict, "/Contents").flatMap(objs.get)
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach { o =>
      val raw = o.stream.getOrElse(Array.empty[Byte])
      val data = if (o.dict.contains("/FlateDecode")) inflate(raw) else raw
      out.write(data)
      out.write('\n')
    }
    out.toByteArray
  }

  private def pageText(page: PdfObj, objs: Map[Int, PdfObj]): String = {
    val cs = new String(contentBytes(page, objs), "ISO-8859-1")
    val sb = new StringBuilder
    var i = 0
    val n = cs.length

    def readLiteral(start: Int): (String, Int) = {
      val b = new StringBuilder
      var depth = 1
      var j = start
      while (j < n && depth > 0) {
        val c = cs(j)
        if (c == '\\' && j + 1 < n) {
          cs(j + 1) match {
            case 'n' => b.append('\n'); j += 2
            case 'r' => b.append('\r'); j += 2
            case 't' => b.append('\t'); j += 2
            case 'b' => b.append('\b'); j += 2
            case 'f' => b.append('\f'); j += 2
            case '(' => b.append('('); j += 2
            case ')' => b.append(')'); j += 2
            case '\\' => b.append('\\'); j += 2
            case '\n' => j += 2 // line continuation
            case '\r' =>
              j += 2; if (j < n && cs(j) == '\n') j += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; j += 1
              while (k < 3 && j < n && cs(j) >= '0' && cs(j) <= '7') {
                v = v * 8 + (cs(j) - '0'); j += 1; k += 1
              }
              b.append((v & 0xff).toChar)
            case other => b.append(other); j += 2
          }
        } else if (c == '(') { depth += 1; b.append(c); j += 1 }
        else if (c == ')') {
          depth -= 1; if (depth > 0) b.append(c); j += 1
        } else { b.append(c); j += 1 }
      }
      (b.toString, j)
    }

    def readHex(start: Int): (String, Int) = {
      val b = new StringBuilder
      var j = start
      val digits = new StringBuilder
      while (j < n && cs(j) != '>') {
        val c = cs(j)
        if (Character.digit(c, 16) >= 0) digits.append(c)
        j += 1
      }
      if (digits.length % 2 == 1) digits.append('0')
      var k = 0
      while (k + 1 < digits.length + 1 && k + 2 <= digits.length) {
        b.append(Integer.parseInt(digits.substring(k, k + 2), 16).toChar)
        k += 2
      }
      (b.toString, if (j < n) j + 1 else j)
    }

    // operator lookbehind: last two non-string tokens (for Td/TD/T*)
    var lastOp = ""
    var pendingLine = false
    def emit(s: String): Unit = {
      if (pendingLine && sb.nonEmpty) sb.append('\n')
      pendingLine = false
      sb.append(s)
    }

    while (i < n) {
      val c = cs(i)
      if (c == '(') {
        val (s, j) = readLiteral(i + 1)
        // find the operator after this string (Tj / ' / " / part of TJ)
        emit(s)
        i = j
      } else if (c == '<' && i + 1 < n && cs(i + 1) != '<') {
        val (s, j) = readHex(i + 1)
        emit(s)
        i = j
      } else if (c == '<' ) { i += 2 } // dict open inside content — skip
      else {
        // token scan for line-break operators
        if (c == 'T' && i + 1 < n &&
          (cs(i + 1) == 'd' || cs(i + 1) == 'D' || cs(i + 1) == '*')) {
          pendingLine = true
          i += 2
        } else if (c == '\'' || c == '"') { pendingLine = true; i += 1 }
        else i += 1
      }
      lastOp = "" // lookbehind kept simple; line ops handled above
    }
    sb.toString
  }

  // ── images ────────────────────────────────────────────────────────────

  /** (name, object) for every /Subtype /Image XObject reachable from the
    * page's /Resources — direct dict or referenced dict. */
  private def pageImages(page: PdfObj,
      objs: Map[Int, PdfObj]): Seq[(String, PdfObj)] = {
    // /Resources may be inline (<< /XObject << /Im1 9 0 R >> >>) or a ref
    val resDict = dictRef(page.dict, "/Resources")
      .flatMap(objs.get).map(_.dict)
      .getOrElse {
        val at = page.dict.indexOf("/Resources")
        if (at < 0) "" else page.dict.substring(at)
      }
    val xAt = resDict.indexOf("/XObject")
    if (xAt < 0) return Nil
    val sub = resDict.substring(xAt)
    """/(\w+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(sub).flatMap { m =>
      objs.get(m.group(2).toInt)
        .filter(_.dict.contains("/Image"))
        .map(o => (m.group(1), o))
    }.toSeq.distinct
  }
}
