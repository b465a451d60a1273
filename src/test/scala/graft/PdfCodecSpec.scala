package graft

import graft.functions.PdfCodec
import graft.operators.ExtractPipeline
import graft.sources.PdfSource
import org.scalatest.funsuite.AnyFunSuite

/** Builds REAL PDF files from the published spec (object syntax, page
  * tree, FlateDecode content streams, image XObjects, xref table) and
  * parses them back — no golden binaries, no fixture boundary: the bytes
  * on disk are genuine PDFs (validated structure: header, body, xref,
  * trailer, startxref). */
object PdfFixture {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](data.length + 64)
    val n = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, n)
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
    out.write("0000000000 65535 f \n".getBytes("ISO-8859-1"))
    for (n <- 1 to maxObj)
      out.write(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n"
        .getBytes("ISO-8859-1"))
    out.write(
      (s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
        s"startxref\n$xrefAt\n%%EOF\n").getBytes("ISO-8859-1"))
    out.toByteArray
  }
}

class PdfCodecSpec extends AnyFunSuite {

  test("multi-page text roundtrip in page-tree order") {
    val pages = Seq(
      Seq("cover page", "ENEM 2023"),
      Seq("QUESTÃO 1", "Qual é a resposta?", "A alpha", "B bravo"),
      Seq("QUESTÃO 2", "Outra pergunta", "C charlie"))
    val got = PdfCodec.extractPages(PdfFixture.build(pages))
    assert(got.length === 3)
    assert(got.map(_.pageIdx) === Seq(0, 1, 2))
    got.zip(pages).foreach { case (p, lines) =>
      // pymupdf's get_text ends every page with a trailing newline —
      // the codec reproduces that (proven against the reference goldens)
      assert(p.text === lines.mkString("", "\n", "\n"),
        s"page ${p.pageIdx} text mismatch")
    }
  }

  test("PDF string escapes and accents survive extraction") {
    val tricky = Seq(Seq(
      "par(ê)nteses e acentos: ção, médio",
      "backslash \\ done"))
    val got = PdfCodec.extractPages(PdfFixture.build(tricky))
    assert(got.head.text === tricky.head.mkString("", "\n", "\n"))
  }

  test("image XObjects: flags, names, and payload bytes") {
    val img = Array.tabulate(12)(i => (i * 7).toByte)
    val bytes = PdfFixture.build(
      Seq(Seq("no image"), Seq("has image")),
      imageOnPages = Set(1), imageBytes = img)
    val pages = PdfCodec.extractPages(bytes)
    assert(pages.map(_.hasImages) === Seq(false, true))
    assert(pages(1).imageNames === Seq("Im1"))
    val images = PdfCodec.extractImages(bytes)
    assert(images.length === 1)
    assert(images.head.pageIdx === 1)
    assert(images.head.filter === "FlateDecode")
    assert(images.head.bytes.toSeq === img.toSeq)
  }

  test("corrupt bytes return empty, never throw") {
    assert(PdfCodec.extractPages("not a pdf at all".getBytes).isEmpty)
    val valid = PdfFixture.build(Seq(Seq("page")))
    val truncated = java.util.Arrays.copyOf(valid, valid.length / 3)
    PdfCodec.extractPages(truncated) // must not throw
  }
}

/** End-to-end: PDFs on disk → PdfSource (binaryFile) → the S2 extract
  * pipeline — raw bytes to question records with no fixture boundary. */
class PdfSourceSpec extends SparkSpec {

  test("questionsFromPages runs end-to-end from raw PDF bytes on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf").toString
    // booklet naming carries year/day fields (T8)
    val pdf = PdfFixture.build(Seq(
      Seq("capa do caderno", "2023"),
      // PDF extraction doubles alternative letters: marker line, then
      // the body line opening with the same letter (enem layout)
      Seq("QUESTÃO 1", "Primeira pergunta sobre texto?",
        "A", "A primeira alternativa",
        "B", "B segunda alternativa",
        "C", "C terceira alternativa",
        "D", "D quarta alternativa",
        "E", "E quinta alternativa"),
      Seq("QUESTÃO 2", "Segunda pergunta, também com alternativas?",
        "A", "A um",
        "B", "B dois",
        "C", "C três",
        "D", "D quatro",
        "E", "E cinco")))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "2023_PV_impresso_D1_CD1.pdf"), pdf)

    val pages = PdfSource.pages(spark, dir)
    assert(pages.count() === 3)
    val q = ExtractPipeline.questionsFromPages(pages).collect()
    assert(q.length === 2, s"expected 2 questions, got ${q.length}")
    val byN = q.sortBy(_.getAs[Int]("n"))
    assert(byN(0).getAs[String]("question_text").contains("QUESTÃO 1"))
    assert(byN(1).getAs[String]("question_text").contains("QUESTÃO 2"))
    assert(byN(0).getAs[Seq[String]]("alternatives").length === 5)
    assert(byN(0).getAs[Int]("year") === 2023)
  }

  test("image extraction feeds the binary sink (S3 on raw bytes)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf2").toString
    val img = Array.tabulate(24)(i => (i * 3).toByte)
    val pdf = PdfFixture.build(
      Seq(Seq("page with picture")), imageOnPages = Set(0),
      imageBytes = img)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "2023_PV_impresso_D1_CD2.pdf"), pdf)

    val images = PdfSource.images(spark, dir)
    val rows = images.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Array[Byte]]("image_bytes").toSeq === img.toSeq)

    // write out one file per image, reference-style
    val outDir = java.nio.file.Files.createTempDirectory("graft_png").toString
    graft.operators.Multimodal.writeBinaryFiles(
      images.selectExpr(
        "concat(file_name, '_page', page_idx, '_', image_name) AS name",
        "image_bytes"),
      outDir, "name", "image_bytes")
    val written = new java.io.File(outDir).list()
    assert(written.length === 1)
  }
}
