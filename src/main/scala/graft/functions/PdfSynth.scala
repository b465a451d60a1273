package graft.functions

/** Deterministic PDF WRITER — the encode-side complement of
  * [[PdfCodec]]: assembles complete, spec-valid PDF files (object
  * syntax, page tree, FlateDecode content streams, optional image
  * XObjects, xref table, trailer) from per-page text lines. Built from
  * the published PDF 1.4 specification only.
  *
  * Two uses:
  *  - the `pdf_pages_scan` gate+bench entry synthesizes a corpus of real
  *    PDFs in-plan and round-trips them through the `graft-pdf` DSv2
  *    scan, putting the codec kernel — the reference's core competence
  *    (enem_pdf_extractor.py:959-996) — on the driver's bench line;
  *  - test fixtures ([[graft.PdfFixture]] delegates here), so the bytes
  *    the specs parse are genuine PDFs with no fixture boundary.
  *
  * Determinism contract: identical inputs produce identical bytes
  * (single-pass Deflater with default settings, fixed object numbering,
  * no timestamps/ids), which is what makes a gate query that WRITES
  * these files idempotent under re-runs. The text round-trip contract
  * (each page's extracted text equals its lines joined by \n plus a
  * trailing \n) is pinned in PdfCodecSpec against [[PdfCodec]]. */
object PdfSynth {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    // drain until finished — a single deflate() call into a
    // data.length-sized buffer silently truncates incompressible input
    // (stored-block overhead exceeds any fixed slack for large enough
    // data), corrupting the stream with a matching /Length
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Escape a text line into a PDF literal string. */
  private def lit(s: String): String =
    "(" + s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    } + ")"

  /** A content stream that shows each line with a Td line advance —
    * the Tj/Td shape every simple text PDF uses. */
  def contentStream(lines: Seq[String]): Array[Byte] =
    deflate((Seq("BT", "/F1 10 Tf", "72 760 Td") ++
      lines.flatMap(l => Seq(lit(l) + " Tj", "0 -14 Td")) ++
      Seq("ET")).mkString("\n").getBytes("ISO-8859-1"))

  /** Assemble a complete PDF: one page per entry of `pageLines`;
    * `imageOnPages` embeds a tiny FlateDecode image XObject on those
    * page indices. Returns the full file bytes. */
  def build(pageLines: Seq[Seq[String]],
      imageOnPages: Set[Int] = Set.empty,
      imageBytes: Array[Byte] = Array.tabulate(12)(_.toByte)): Array[Byte] = {
    val nPages = pageLines.length
    // object numbering: 1 catalog, 2 pages-root, then per page i:
    // (3+3i) page, (4+3i) contents, (5+3i) image (allocated always,
    // emitted only when used)
    val objs = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    val kids = (0 until nPages).map(i => s"${3 + 3 * i} 0 R").mkString(" ")
    objs += 1 -> s"<< /Type /Catalog /Pages 2 0 R >>".getBytes("ISO-8859-1")
    objs += 2 -> s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>"
      .getBytes("ISO-8859-1")
    for (i <- 0 until nPages) {
      val pageNum = 3 + 3 * i
      val contNum = 4 + 3 * i
      val imgNum = 5 + 3 * i
      val res =
        if (imageOnPages(i))
          s"/Resources << /XObject << /Im$i $imgNum 0 R >> >> "
        else ""
      objs += pageNum ->
        (s"<< /Type /Page /Parent 2 0 R $res/MediaBox [0 0 612 792] " +
          s"/Contents $contNum 0 R >>").getBytes("ISO-8859-1")
      val cs = contentStream(pageLines(i))
      objs += contNum ->
        (s"<< /Length ${cs.length} /Filter /FlateDecode >>\nstream\n"
          .getBytes("ISO-8859-1") ++ cs ++
          "\nendstream".getBytes("ISO-8859-1"))
      if (imageOnPages(i)) {
        val flated = deflate(imageBytes)
        val body =
          (s"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
            s"/ColorSpace /DeviceRGB /BitsPerComponent 8 " +
            s"/Filter /FlateDecode /Length ${flated.length} >>\nstream\n")
            .getBytes("ISO-8859-1") ++ flated ++
            "\nendstream".getBytes("ISO-8859-1")
        objs += imgNum -> body
      }
    }
    // serialize with a valid xref + trailer
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.Map[Int, Int]()
    objs.sortBy(_._1).foreach { case (num, body) =>
      offsets(num) = out.size()
      out.write(s"$num 0 obj\n".getBytes("ISO-8859-1"))
      out.write(body)
      out.write("\nendobj\n".getBytes("ISO-8859-1"))
    }
    val xrefAt = out.size()
    val maxObj = objs.map(_._1).max
    out.write(s"xref\n0 ${maxObj + 1}\n".getBytes("ISO-8859-1"))
    // allocated-but-unemitted numbers (image slots of image-less
    // pages) must be FREE entries — an in-use 'n' entry at offset 0
    // points a conforming reader at the %PDF header and fails strict
    // validators. PDF 1.4 §3.4.3 further requires the free entries to
    // form a LINKED LIST: entry 0's offset field names the first free
    // object, each free entry names the next, and the last points
    // back to 0 (gen 65535 = never reuse).
    val freeObjs = (1 to maxObj).filterNot(offsets.contains)
    val nextFree: Map[Int, Int] =
      (0 +: freeObjs).zip(freeObjs :+ 0).toMap
    out.write(
      f"${nextFree(0)}%010d 65535 f \n".getBytes("ISO-8859-1"))
    for (n <- 1 to maxObj)
      out.write((offsets.get(n) match {
        case Some(off) => f"$off%010d 00000 n \n"
        case None => f"${nextFree(n)}%010d 65535 f \n"
      }).getBytes("ISO-8859-1"))
    out.write(
      (s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
        s"startxref\n$xrefAt\n%%EOF\n").getBytes("ISO-8859-1"))
    out.toByteArray
  }
}
