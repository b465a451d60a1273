package graft

import graft.functions.PdfCodec
import graft.operators.ExtractPipeline
import graft.sources.PdfSource
import org.scalatest.funsuite.AnyFunSuite

/** Builds REAL PDF files from the published spec and parses them back —
  * no golden binaries, no fixture boundary: the bytes on disk are
  * genuine PDFs (validated structure: header, body, xref, trailer,
  * startxref). The writer itself lives in main as
  * [[graft.functions.PdfSynth]] (the pdf_pages_scan gate synthesizes
  * its corpus with it); this object keeps the fixture name the specs
  * use. */
object PdfFixture {
  def contentStream(lines: Seq[String]): Array[Byte] =
    graft.functions.PdfSynth.contentStream(lines)

  def build(pageLines: Seq[Seq[String]],
      imageOnPages: Set[Int] = Set.empty,
      imageBytes: Array[Byte] = Array.tabulate(12)(_.toByte)): Array[Byte] =
    graft.functions.PdfSynth.build(pageLines, imageOnPages, imageBytes)
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

  test("xref marks allocated-but-unemitted image slots as FREE entries " +
      "— an in-use 'n' entry at offset 0 would point a conforming " +
      "reader at the %PDF header and fail strict validators") {
    val bytes = graft.functions.PdfSynth.build(Seq(Seq("a"), Seq("b")))
    val text = new String(bytes, "ISO-8859-1")
    val xref = text.substring(text.indexOf("xref\n0 "))
    val entries = xref.linesIterator
      .filter(l => l.endsWith("n ") || l.endsWith("f ")).toVector
    // objects 0-7: catalog, pages, 2×(page, contents) emitted; page
    // 0's unused image slot (obj 5) is INSIDE the table and must be a
    // free entry; page 1's (obj 8) is past maxObj and absent entirely
    assert(entries.length === 8, s"xref rows: $entries")
    assert(!entries.exists(e => e.startsWith("0000000000") &&
      e.endsWith("n ")), s"in-use entry at offset 0: $entries")
    assert(entries.count(_.endsWith("f ")) === 2, // obj 0 + obj 5
      s"unused slots must be free entries: $entries")
    // and the file still parses with both pages intact
    val pages = PdfCodec.extractPages(bytes)
    assert(pages.map(_.text) === Seq("a\n", "b\n"))
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
