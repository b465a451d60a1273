package graft

import graft.operators.{ExtractPipeline, Pairing}
import org.apache.spark.sql.functions._

/** THE reference's true end-to-end oracle, from RAW BYTES: run
  * `PdfSource → ExtractPipeline.extract` over the actual 2023 booklet
  * (`pdfs_enem/2023/2023_PV_impresso_D2_CD7.pdf`, 16 Identity-H CID
  * fonts + 124 ToUnicode CMaps) and its ObjStm-packed answer key, and
  * require every one of the 35 committed golden math records
  * (`pdf_content_to_files/2023_D2_/2023_math_questions.json`, produced
  * by the reference's pymupdf run — `enem_pdf_extractor.py:959-996`) to
  * match byte-exactly: question_text, alternatives, correct_answer, ID,
  * year, day, question_num.
  *
  * GoldenParitySpec covers the same transform chain from reconstructed
  * fixture text; this spec pins the DECODER (PdfCodec) end of the chain.
  */
class PdfGoldenSpec extends SparkSpec {

  private val pdfDir = "/root/reference/pdfs_enem/2023"
  private val goldenPath =
    "/root/reference/pdf_content_to_files/2023_D2_/2023_math_questions.json"

  private def available: Boolean =
    new java.io.File(s"$pdfDir/2023_PV_impresso_D2_CD7.pdf").exists() &&
      new java.io.File(goldenPath).exists()

  test("all 72 golden 2023 D2 records (math + natu) reproduce from " +
      "raw PDF bytes") {
    assume(available, "reference PDFs not present")

    val all = graft.sources.PdfSource.pages(spark, pdfDir)
    val pages = all.filter(col("file_name").contains("PV"))
    val keyTexts = all
      .filter(col("file_name").contains("GB") && col("page_idx") === 0)
      .select(col("file_name"), col("page_text").as("key_text"))
    val files = pages.select(col("file_name"))
      .union(keyTexts.select(col("file_name"))).distinct()
    val pairs = Pairing.pair(files)
    val extracted = ExtractPipeline.extract(pages, keyTexts, pairs)
      .persist()
    try Seq(("math", goldenPath, 35),
        ("natu", goldenPath.replace("math", "natu"), 37)).foreach {
      case (subject, path, expected) =>
        val mine = extracted
          .filter(col("subject") === subject)
          .select(col("question_num"), col("question_text"),
            col("alternatives"), col("correct_answer"), col("id"),
            col("year"), col("day"))
          .collect()
          .map(r => r.getInt(0) -> ((r.getString(1), r.getSeq[String](2),
            r.getString(3), r.getString(4), r.getInt(5), r.getString(6))))
          .toMap

        val golden = spark.read.option("multiLine", "true").json(path)
          .select(col("question_num").cast("int"), col("question_text"),
            col("alternatives"), col("correct_answer"), col("ID"),
            col("year").cast("int"), col("day"))
          .collect()
          .map(r => r.getInt(0) -> ((r.getString(1), r.getSeq[String](2),
            r.getString(3), r.getString(4), r.getInt(5), r.getString(6))))
          .toMap

        assert(golden.size === expected, s"$subject golden size")
        assert(mine.keySet === golden.keySet,
          s"$subject question-number sets differ: " +
            s"missing=${golden.keySet -- mine.keySet}" +
            s" extra=${mine.keySet -- golden.keySet}")
        golden.foreach { case (num, g) =>
          val m = mine(num)
          assert(m._1 === g._1, s"$subject Q$num question_text differs")
          assert(m._2 === g._2, s"$subject Q$num alternatives differ")
          assert(m._3 === g._3, s"$subject Q$num correct_answer differs")
          assert(m._4 === g._4, s"$subject Q$num ID differs")
          assert(m._5 === g._5, s"$subject Q$num year differs")
          assert(m._6 === g._6, s"$subject Q$num day differs")
        }
    } finally { extracted.unpersist(); () }
  }

  test("D1 keys: the num/English/Spanish language block parses both " +
      "occurrences from real bytes") {
    // the real D1 grids print `1\nC\nC` (number once, English then
    // Spanish letter — read at +2/+4 by the reference,
    // enem_pdf_extractor.py:203-213); AnswerKey.parse must emit both
    // occurrence rows from the raw ObjStm GB bytes
    val f = new java.io.File(
      "/root/reference/pdfs_enem/2021/2021_GB_impresso_D1_CD1.pdf")
    assume(f.exists(), "reference PDFs not present")
    import org.apache.spark.sql.functions.{col => c}
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val page0 = graft.functions.PdfCodec.extractPages(bytes).head.text
    import spark.implicits._
    val keyDf = Seq(("2021_GB_impresso_D1_CD1.pdf", page0))
      .toDF("file_name", "key_text")
    val parsed = graft.operators.AnswerKey
      .parse(keyDf, "file_name", "key_text")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getString(3)).toMap
    // language questions 1-5 carry BOTH occurrences
    (1 to 5).foreach { n =>
      assert(parsed.contains((n, 0)), s"q$n English answer missing")
      assert(parsed.contains((n, 1)), s"q$n Spanish answer missing")
    }
    // 2021 D1: English and Spanish answers diverge on q3/q4/q5
    assert(parsed((1, 0)) === "C" && parsed((1, 1)) === "C")
    assert(parsed((3, 0)) === "A" && parsed((3, 1)) === "E")
    assert(parsed((4, 0)) === "B" && parsed((4, 1)) === "A")
    // non-language questions have exactly one occurrence
    assert(parsed.contains((46, 0)) && !parsed.contains((46, 1)))
    assert(parsed((46, 0)) === "B")
  }

  test("2021 booklets run end-to-end from raw bytes (D1 Spanish path)") {
    // no committed goldens exist for 2021, so this is a structural
    // gate: both days extract, every subject produces records, answers
    // resolve from the ObjStm keys (incl. the D1 language-block
    // occurrences), and IDs are well-formed
    val dir = new java.io.File("/root/reference/pdfs_enem/2021")
    assume(dir.isDirectory &&
      new java.io.File(dir, "2021_PV_impresso_D1_CD1.pdf").exists(),
      "2021 reference PDFs not present")
    val all = graft.sources.PdfSource.pages(spark, dir.getPath)
    val pages = all.filter(col("file_name").contains("PV"))
    val keyTexts = all
      .filter(col("file_name").contains("GB") && col("page_idx") === 0)
      .select(col("file_name"), col("page_text").as("key_text"))
    val files = pages.select(col("file_name"))
      .union(keyTexts.select(col("file_name"))).distinct()
    val pairs = Pairing.pair(files)
    val q = ExtractPipeline.extract(pages, keyTexts, pairs).cache()
    try {
      val bySubject = q.groupBy(col("day"), col("subject"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("correct_answer").rlike("^[A-E]$"), 1)
            .otherwise(0)).as("answered"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      // Both D2 subjects must extract SOME complete records. Science
      // subjects run chart/diagram alternatives whose markers overprint
      // (fake-bold at one origin) — the doubled-letter parse rejects
      // them just as the reference's own 2023 natu golden drops its
      // chart questions (110-113/132-135), so low natu counts are
      // reference-faithful F4 behavior, not a decode defect.
      bySubject.toSeq.sortBy(_._1).foreach { case (k, (n, a)) =>
        info(s"$k: $n records, $a answered")
      }
      // text-heavy subjects decode near-fully (the GID-layout recovery
      // — see PdfCodec.CoreGidToChar); image-heavy pages are F3-skipped
      // in no-images mode, so natu/eng/spani counts are structurally low
      // (the reference's own 2020 metadata has NO natu row for the same
      // reason)
      assert(bySubject(("D2", "math"))._1 >= 30, "math under-extracted")
      assert(bySubject(("D1", "huma"))._1 >= 30, "huma under-extracted")
      Seq(("D1", "lang"), ("D1", "eng"), ("D1", "spani"),
          ("D2", "natu"), ("D2", "math")).foreach { k =>
        assert(bySubject.contains(k), s"no records for $k")
        val (n, answered) = bySubject(k)
        assert(n >= 1, s"$k: no records")
        // annulled questions ("anulada" in the key grid — 2021 Q138)
        // carry the reference's miss sentinel, everything else a letter
        assert(answered >= n - 1,
          s"$k: ${n - answered} of $n records missing a key answer")
      }
      val badAnswers = q.filter(
        !col("correct_answer").rlike("^[A-E]$") &&
          col("correct_answer") =!=
            graft.operators.AnswerKey.AnswerNotFound).count()
      assert(badAnswers === 0L,
        s"$badAnswers records with malformed answers")
      // the question NUMBERING must have seen the full booklet: the
      // last D2 math record sits in the 136-180 display range
      val maxNum = q.filter(col("day") === "D2")
        .agg(max(col("question_num"))).collect()(0).getInt(0)
      assert(maxNum >= 136 && maxNum <= 180,
        s"D2 numbering off: max question_num = $maxNum")
      // every ID is well-formed
      val badIds = q.filter(!col("id").rlike("^2021_D[12]_N[0-9]{1,3}$"))
        .count()
      assert(badIds === 0L)
    } finally { q.unpersist(); () }
  }

  test("TXT-mode golden files reproduce byte-exactly from raw bytes") {
    // S5 parity from the decoder end: the committed
    // 2023_{math,natu}_questions.txt are the reference's TXT-mode runs
    // (template enem_pdf_extractor.py:47, concatenated in question
    // order) — rebuild them from the raw PDFs and require byte equality
    assume(available, "reference PDFs not present")
    val all = graft.sources.PdfSource.pages(spark, pdfDir)
    val pages = all.filter(col("file_name").contains("PV"))
    val keyTexts = all
      .filter(col("file_name").contains("GB") && col("page_idx") === 0)
      .select(col("file_name"), col("page_text").as("key_text"))
    val files = pages.select(col("file_name"))
      .union(keyTexts.select(col("file_name"))).distinct()
    val q = ExtractPipeline.extract(pages, keyTexts, Pairing.pair(files))
    val txt = ExtractPipeline.toTxtRecords(q.orderBy(col("question_num")))
      .select(col("subject"), col("record"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).mkString).toMap
    Seq("math", "natu").foreach { subject =>
      val goldenFile = new java.io.File(
        s"/root/reference/pdf_content_to_files/2023_D2_/" +
          s"2023_${subject}_questions.txt")
      assume(goldenFile.exists(), s"$subject golden txt absent")
      val golden = new String(
        java.nio.file.Files.readAllBytes(goldenFile.toPath), "UTF-8")
      assert(txt.getOrElse(subject, "") === golden,
        s"$subject TXT-mode output differs from the committed golden")
    }
  }

  test("images mode on real bytes keeps the F3-skipped questions") {
    assume(available, "reference PDFs not present")
    val all = graft.sources.PdfSource.pages(spark, pdfDir)
    val pages = all.filter(col("file_name").contains("PV"))
    val keyTexts = all
      .filter(col("file_name").contains("GB") && col("page_idx") === 0)
      .select(col("file_name"), col("page_text").as("key_text"))
    val files = pages.select(col("file_name"))
      .union(keyTexts.select(col("file_name"))).distinct()
    val pairs = Pairing.pair(files)
    def mathNums(imagesMode: Boolean): Set[Int] =
      ExtractPipeline.extract(pages, keyTexts, pairs, imagesMode)
        .filter(col("subject") === "math")
        .select(col("question_num")).collect().map(_.getInt(0)).toSet
    val noImg = mathNums(imagesMode = false)
    val withImg = mathNums(imagesMode = true)
    // images mode keeps pages F3 drops: a strict superset, including
    // questions the golden (no-images) run is missing
    assert(noImg.subsetOf(withImg),
      s"images mode lost ${noImg -- withImg}")
    assert((withImg -- noImg).nonEmpty,
      "images mode recovered no image-page questions")
    assert((withImg -- noImg).exists(n => Seq(144, 145, 146, 149,
      163, 164, 165, 178, 179, 180).contains(n)),
      s"recovered set ${withImg -- noImg} misses the known image pages")
  }

  test("core-font GID recovery: 2021 subset-font body text decodes") {
    // pins CoreGidToChar end-to-end: these sentences render entirely
    // through gNN /Differences names (sparse ToUnicode), including
    // accents, the fi ligature, and curly quotes
    val d1 = new java.io.File(
      "/root/reference/pdfs_enem/2021/2021_PV_impresso_D1_CD1.pdf")
    assume(d1.exists(), "reference PDFs not present")
    val t1 = graft.functions.PdfCodec.extractPages(
      java.nio.file.Files.readAllBytes(d1.toPath))(2).text
    assert(t1.contains("Back in the ancestral homeland of Michelle Obama"))
    assert(t1.contains("honorific Miss or"), "fi ligature (g192)")
    assert(t1.contains("“gal” or “auntie”"), "curly quotes")
    assert(t1.contains("Disponível em"), "iacute (g118)")
    val d2 = new java.io.File(
      "/root/reference/pdfs_enem/2021/2021_PV_impresso_D2_CD7.pdf")
    val t2 = graft.functions.PdfCodec.extractPages(
      java.nio.file.Files.readAllBytes(d2.toPath))(3).text
    assert(t2.contains(
      "Na cidade de São Paulo, as ilhas de calor são"))
    assert(t2.contains("região de mananciais"), "atilde + ccedilla")
  }

  test("mutation fuzz: corrupted real-PDF bytes never throw") {
    val f = new java.io.File(
      "/root/reference/pdfs_enem/2023/2023_GB_impresso_D2_CD7.pdf")
    assume(f.exists(), "reference PDFs not present")
    val base = java.nio.file.Files.readAllBytes(f.toPath)
    val rnd = new scala.util.Random(42) // fixed seed: reproducible
    (1 to 25).foreach { trial =>
      val b = base.clone()
      // flip a burst of bytes at a random offset (hits xref, ObjStm
      // headers, stream payloads, dicts...)
      val at = rnd.nextInt(b.length - 64)
      (0 until 1 + rnd.nextInt(64)).foreach { k =>
        b(at + k) = rnd.nextInt(256).toByte
      }
      // contract: degrade (fewer/garbled pages), never throw
      val pages = graft.functions.PdfCodec.extractPages(b)
      val images = graft.functions.PdfCodec.extractImages(b)
      assert(pages != null && images != null, s"trial $trial")
    }
    // truncations at every granularity
    Seq(0, 1, 16, 1024, base.length / 2, base.length - 3).foreach { n =>
      val b = java.util.Arrays.copyOf(base, n)
      assert(graft.functions.PdfCodec.extractPages(b) != null)
    }
  }

  test("2022 key grids parse COMPLETELY from raw bytes, both days") {
    // the reference ships NO 2022 PV booklets (pdfs_enem/2022 holds only
    // the two GB keys), so the 119-record 2022 E1 parity stays a fixture
    // proof (GoldenParitySpec) and full-folder raw-bytes E1 is proven on
    // 2021. What IS provable from the 2022 artifacts: the complete
    // answer-key GRIDS — D1 covers q1-90 with the q1-5 language double
    // occurrence, D2 covers q91-180, every answer a letter (or the
    // annulled sentinel) — i.e. the exact key surface the reference's
    // extractor would consume for 2022.
    val dir = new java.io.File("/root/reference/pdfs_enem/2022")
    assume(dir.isDirectory, "reference PDFs not present")
    import spark.implicits._
    Seq(("2022_GB_impresso_D1_CD1.pdf", 1 to 90, true),
        ("2022_GB_impresso_D2_CD7.pdf", 91 to 180, false)).foreach {
      case (name, range, langBlock) =>
        val bytes = java.nio.file.Files
          .readAllBytes(new java.io.File(dir, name).toPath)
        val page0 = graft.functions.PdfCodec.extractPages(bytes).head.text
        val parsed = graft.operators.AnswerKey
          .parse(Seq((name, page0)).toDF("file_name", "key_text"),
            "file_name", "key_text")
          .collect()
          .map(r => (r.getInt(1), r.getInt(2)) -> r.getString(3)).toMap
        val nums = parsed.keySet.map(_._1)
        // annulled cells print "Anulado" instead of a letter and are
        // (correctly) dropped by the parse — 2022 D2 annuls q157. A
        // missing number is acceptable ONLY if the raw grid really marks
        // it annulled; anything else is a decode defect.
        val missing = range.toSet -- nums
        missing.foreach { m =>
          assert(page0.matches(s"(?s).*\\b$m\\s*\\n\\s*Anulado.*"),
            s"$name: q$m missing from parse but NOT annulled in the grid")
        }
        assert(missing.size <= 2,
          s"$name: too many missing numbers $missing")
        assert((nums -- range.toSet).isEmpty,
          s"$name: unexpected extra numbers ${nums -- range.toSet}")
        if (langBlock) (1 to 5).foreach { n =>
          assert(parsed.contains((n, 0)) && parsed.contains((n, 1)),
            s"$name: q$n language double-occurrence missing")
        }
        // every parsed answer is a letter; annulled cells may surface as
        // non-letters but must stay rare (ENEM annuls ≤ a couple per day)
        val bad = parsed.filterNot(_._2.matches("^[A-E]$"))
        assert(bad.size <= 2, s"$name: non-letter answers $bad")
    }
  }

  test("ObjStm answer keys parse for every committed GB PDF") {
    assume(new java.io.File("/root/reference/pdfs_enem").isDirectory)
    // every year's GB file stores objects in /ObjStm (2021-2023) or
    // classic objects (2020): all must yield a non-trivial parsed key
    val years = Seq("2020", "2021", "2022", "2023")
    years.foreach { y =>
      val dir = new java.io.File(s"/root/reference/pdfs_enem/$y")
      val gbs = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.contains("GB"))
      gbs.foreach { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val pages = graft.functions.PdfCodec.extractPages(bytes)
        assert(pages.nonEmpty, s"${f.getName}: no pages decoded")
        val keyText = pages.head.text
        // the key grid must surface as short number/letter lines (F7)
        val shortLines = keyText.split("\n")
          .count(l => l.trim.matches("^\\d{1,3}$"))
        assert(shortLines >= 40,
          s"${f.getName}: only $shortLines question-number lines decoded")
      }
    }
  }
}
