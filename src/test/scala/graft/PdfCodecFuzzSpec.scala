package graft

import graft.functions.{PdfCodec, PdfSynth}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz-style hardening of the PDF codec (VERDICT r15 #3): the one
  * component whose inputs at 100 TB are HOSTILE bytes — a crawled corpus
  * contains truncated files, bit rot, and deliberately crafted bombs.
  *
  * Contract under test, for every mutated or adversarial input:
  * [[PdfCodec.extractPages]] / [[PdfCodec.extractImages]] PARSE OR
  * RETURN NIL — never throw (any Throwable escaping is a fail), never
  * hang (wide-cycle blowups are the hang class; each crafted case is
  * wall-clock-bounded far below its pre-fix cost), never OOM (the
  * decompression-bomb case inflates ≤ the documented cap), and when
  * they DO parse, the result respects the structural invariants
  * (sequential pageIdx, non-null text). Mutations are applied to
  * genuine [[PdfSynth]] PDFs so the fuzz surface starts from valid
  * structure — pure-junk robustness is separately covered by the
  * PropertySpec decoder properties. Deterministic seeds: failures
  * replay exactly. */
class PdfCodecFuzzSpec extends AnyFunSuite {

  private def basePdf(rnd: scala.util.Random): Array[Byte] = {
    val nPages = 1 + rnd.nextInt(4)
    val pages = Seq.tabulate(nPages)(p =>
      Seq.tabulate(1 + rnd.nextInt(6))(l => s"page $p line $l " +
        Seq.fill(rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString))
    val imgPages =
      (0 until nPages).filter(_ => rnd.nextBoolean()).toSet
    PdfSynth.build(pages, imgPages)
  }

  /** Both public entry points must return (anything) without throwing;
    * when pages come back, they must satisfy the structural contract. */
  private def assertSurvives(bytes: Array[Byte], what: String): Unit = {
    val pages =
      try PdfCodec.extractPages(bytes)
      catch { case t: Throwable => fail(s"$what: extractPages threw $t") }
    pages.zipWithIndex.foreach { case (p, i) =>
      assert(p.pageIdx == i, s"$what: non-sequential pageIdx")
      assert(p.text != null, s"$what: null text")
      assert(p.imageNames != null, s"$what: null imageNames")
    }
    val images =
      try PdfCodec.extractImages(bytes)
      catch { case t: Throwable => fail(s"$what: extractImages threw $t") }
    images.foreach { im =>
      assert(im.bytes != null && im.name != null, s"$what: null image part")
    }
  }

  test("mutated-corpus sweep: bit flips, truncations, splices, region " +
      "zeroing/duplication over synthesized PDFs — parse or Nil, " +
      "never throw") {
    val rnd = new scala.util.Random(0xF0221)
    // structural keywords spliced mid-file stress the scanners/parsers
    // far harder than random bytes do (they create half-valid objects,
    // dangling streams, hostile CMap ranges)
    val tokens = Seq("obj", "endobj", "stream", "endstream", "xref",
      "/Kids [2 0 R 2 0 R]", "/ObjStm", "/FlateDecode",
      "beginbfrange <0000> <FFFFFFFF> <0000> endbfrange",
      "<< /Type /Page /Parent 2 0 R >>", "/Contents 99 0 R",
      "0 65535 f", "%%EOF", "/Length 999999999")
    for (iter <- 1 to 120) {
      val base = basePdf(rnd)
      val mutated: Array[Byte] = rnd.nextInt(5) match {
        case 0 => // bit flips
          val m = base.clone()
          for (_ <- 0 to rnd.nextInt(16))
            m(rnd.nextInt(m.length)) =
              (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
          m
        case 1 => // truncation (head or tail)
          val cut = rnd.nextInt(base.length)
          if (rnd.nextBoolean()) base.take(cut) else base.drop(cut)
        case 2 => // token splice at a random offset
          val tok = tokens(rnd.nextInt(tokens.length))
            .getBytes("ISO-8859-1")
          val at = rnd.nextInt(base.length)
          base.take(at) ++ tok ++ base.drop(at)
        case 3 => // zero a region
          val m = base.clone()
          val at = rnd.nextInt(m.length)
          val len = math.min(rnd.nextInt(64), m.length - at)
          java.util.Arrays.fill(m, at, at + len, 0.toByte)
          m
        case _ => // duplicate a region (fake incremental update / objstm)
          val at = rnd.nextInt(base.length)
          val len = math.min(1 + rnd.nextInt(256), base.length - at)
          base ++ base.slice(at, at + len)
      }
      assertSurvives(mutated, s"iter $iter")
    }
  }

  test("page-tree wide cycle: two /Pages nodes each listing the other " +
      "many times must walk in O(objects), not b^depth") {
    // hand-build: catalog → 2, nodes 2 and 3 list each other 40 times
    // plus one real page each; pre-fix (depth-only guard) this walk is
    // 40^64 calls — a hang; with the visited set it is 4 node visits
    def obj(num: Int, body: String) = s"$num 0 obj\n$body\nendobj\n"
    val kids23 = Seq.fill(40)("3 0 R").mkString(" ")
    val kids32 = Seq.fill(40)("2 0 R").mkString(" ")
    val cs = PdfSynth.contentStream(Seq("hello"))
    val sb = new java.io.ByteArrayOutputStream()
    sb.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    sb.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      .getBytes("ISO-8859-1"))
    sb.write(obj(2, s"<< /Type /Pages /Kids [ $kids23 4 0 R ] /Count 1 >>")
      .getBytes("ISO-8859-1"))
    sb.write(obj(3, s"<< /Type /Pages /Kids [ $kids32 5 0 R ] /Count 1 >>")
      .getBytes("ISO-8859-1"))
    sb.write(obj(4, "<< /Type /Page /Parent 2 0 R " +
      "/MediaBox [0 0 612 792] /Contents 6 0 R >>").getBytes("ISO-8859-1"))
    sb.write(obj(5, "<< /Type /Page /Parent 3 0 R " +
      "/MediaBox [0 0 612 792] /Contents 6 0 R >>").getBytes("ISO-8859-1"))
    sb.write((s"6 0 obj\n<< /Length ${cs.length} /Filter /FlateDecode " +
      ">>\nstream\n").getBytes("ISO-8859-1"))
    sb.write(cs)
    sb.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    val bytes = sb.toByteArray
    val t0 = System.nanoTime()
    assertSurvives(bytes, "wide page-tree cycle")
    val pages = PdfCodec.extractPages(bytes)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 10.0, f"wide cycle took $secs%.1f s — blowup regressed")
    // the walk still finds the two genuine pages exactly once
    assert(pages.map(_.text).count(_.contains("hello")) == 2)
  }

  test("form-XObject content bomb: a self-invoking form repeated per " +
      "level trips the work budget instead of b^8 re-executions") {
    // form 5 invokes ITSELF 64 times per execution; depth cap 8 alone
    // still allows 64^8 ≈ 2.8e14 runs (each re-inflating the stream) —
    // the invocation budget must cut this off loudly and quickly
    val formBody = ("/R1 gs " + Seq.fill(64)("/Fz Do").mkString(" "))
      .getBytes("ISO-8859-1")
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val fz = deflate(formBody)
    val pageContent = deflate("BT /F1 10 Tf (x) Tj ET /Fz Do"
      .getBytes("ISO-8859-1"))
    def obj(num: Int, body: String) = s"$num 0 obj\n$body\nendobj\n"
    val sb = new java.io.ByteArrayOutputStream()
    sb.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    sb.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      .getBytes("ISO-8859-1"))
    sb.write(obj(2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>")
      .getBytes("ISO-8859-1"))
    sb.write(obj(3, "<< /Type /Page /Parent 2 0 R /Resources " +
      "<< /XObject << /Fz 5 0 R >> >> /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R >>").getBytes("ISO-8859-1"))
    sb.write((s"4 0 obj\n<< /Length ${pageContent.length} " +
      "/Filter /FlateDecode >>\nstream\n").getBytes("ISO-8859-1"))
    sb.write(pageContent)
    sb.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    sb.write((s"5 0 obj\n<< /Type /XObject /Subtype /Form /Resources " +
      s"<< /XObject << /Fz 5 0 R >> >> /Length ${fz.length} " +
      "/Filter /FlateDecode >>\nstream\n").getBytes("ISO-8859-1"))
    sb.write(fz)
    sb.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    val bytes = sb.toByteArray
    val t0 = System.nanoTime()
    assertSurvives(bytes, "form bomb")
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 20.0, f"form bomb took $secs%.1f s — budget regressed")
  }

  test("decompression bomb: a content stream inflating past the cap " +
      "raises the limit loudly inside, Nil outside — never OOMs") {
    // ~300 MiB of zeros deflates to ~300 KB; the 256 MiB inflate cap
    // must trip before materializing it
    val d = new java.util.zip.Deflater()
    val zeros = new Array[Byte](1 << 20)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    for (_ <- 1 to 300) {
      d.setInput(zeros)
      while (!d.needsInput()) out.write(buf, 0, d.deflate(buf))
    }
    d.finish()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val bomb = out.toByteArray
    assert(bomb.length < (1 << 21), "bomb unexpectedly incompressible")
    def obj(num: Int, body: String) = s"$num 0 obj\n$body\nendobj\n"
    val sb = new java.io.ByteArrayOutputStream()
    sb.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    sb.write(obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      .getBytes("ISO-8859-1"))
    sb.write(obj(2, "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>")
      .getBytes("ISO-8859-1"))
    sb.write(obj(3, "<< /Type /Page /Parent 2 0 R " +
      "/MediaBox [0 0 612 792] /Contents 4 0 R >>").getBytes("ISO-8859-1"))
    sb.write((s"4 0 obj\n<< /Length ${bomb.length} " +
      "/Filter /FlateDecode >>\nstream\n").getBytes("ISO-8859-1"))
    sb.write(bomb)
    sb.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    val bytes = sb.toByteArray
    assertSurvives(bytes, "zip bomb")
    // the loud inner signal is the named limit exception — pin it so the
    // cap can't silently become a truncation
    val e = intercept[PdfCodec.PdfLimitException] {
      PdfCodec.inflate(bomb)
    }
    assert(e.getMessage.contains("decompression bomb"), e.getMessage)
  }

  test("well-formed PDFs still parse after the hardening (no false " +
      "positives from the bounds on legitimate structure)") {
    val rnd = new scala.util.Random(0xF0222)
    for (_ <- 1 to 20) {
      val nPages = 1 + rnd.nextInt(5)
      val pages = Seq.tabulate(nPages)(p => Seq(s"content of page $p"))
      val got = PdfCodec.extractPages(PdfSynth.build(pages))
      assert(got.length == nPages)
      got.zipWithIndex.foreach { case (pg, i) =>
        assert(pg.text.contains(s"content of page $i"))
      }
    }
  }
}
