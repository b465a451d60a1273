package graft

import graft.operators.{ExtractPipeline, Pairing}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extraction parity against the reference's own committed golden records
  * (BASELINE.md target 3): the 2023_D1_ and 2023_D2_ question JSONs under
  * /root/reference/pdf_content_to_files.
  *
  * The container has no PDF parser, so the raw page text is RECONSTRUCTED
  * from the golden records by inverting the reference's only lossy text
  * transform — the alternative reformat "X\nX body" → "X)body" — and
  * re-concatenating the slices in booklet order with non-standard filler
  * questions occupying the question numbers the reference dropped (the
  * numbering must count them, W1). Running our extract pipeline over the
  * reconstruction must reproduce every golden record byte-exactly:
  * question_text, alternatives, correct_answer, ID, year, day,
  * question_num, subject.
  */
class GoldenParitySpec extends SparkSpec {

  private val refBase = "/root/reference/pdf_content_to_files"

  private def available: Boolean = new java.io.File(refBase).isDirectory

  /** Golden record as (displayedNum, text, alternatives, answer, id). */
  private case class Golden(num: Int, text: String, alts: Seq[String],
      answer: String, id: String, subject: String)

  private def loadGolden(day: String, files: Map[String, String]): Seq[Golden] = {
    files.toSeq.flatMap { case (subject, path) =>
      val f = s"$refBase/$path"
      if (!new java.io.File(f).exists()) Seq.empty
      else {
        val df = spark.read.option("multiLine", "true").json(f)
        if (!df.columns.contains("question_num")) Seq.empty
        else df.select(col("question_num").cast("int"), col("question_text"),
            col("alternatives"), col("correct_answer"), col("ID"))
          .collect().map { r =>
            Golden(r.getInt(0), r.getString(1), r.getSeq[String](2),
              r.getString(3), r.getString(4), subject)
          }.toSeq
      }
    }
  }

  /** Invert the reformat: a substitution site "X)" is never followed by
    * whitespace (the pattern's trailing \s* ate it), so only those invert
    * to "X\nX"; an in-body "(C) foo" (reference-untouched) stays as-is.
    * substitute(invert(text)) == text for every golden record. */
  private def invertAlternatives(text: String): String =
    text.replaceAll("([A-E])\\)(?!\\s)", "$1\n$1")

  private def filler: String =
    "QUESTÃO filler não-padrão\nA\nA um\nB\nB dois\n"

  /** Pack raw-numbered slices into pages so every page ends on a filler
    * (the reference's end-of-page sentinel adds a trailing space to the
    * last slice of each page; a dropped filler absorbs it). Page ends are
    * derived from the dropped numbers: close a page at any missing raw
    * number at least 8 questions after the previous page break; the
    * booklet's last raw number must itself be missing. */
  private def buildPages(file: String, byRaw: Map[Int, Golden],
      maxRaw: Int): Seq[(String, Int, String, Boolean)] = {
    assert(!byRaw.contains(maxRaw),
      s"last raw number $maxRaw must be a dropped question")
    val pageEnds = {
      val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
      var start = 1
      (1 to maxRaw).foreach { raw =>
        if (!byRaw.contains(raw) && (raw == maxRaw || raw - start >= 8)) {
          ends += raw; start = raw + 1
        }
      }
      if (ends.isEmpty || ends.last != maxRaw) ends += maxRaw
      ends.toSeq
    }
    val cover = (file, 0, "INSTRUÇÕES — capa sem questões", false)
    var start = 1
    val pages = pageEnds.zipWithIndex.map { case (end, i) =>
      val slices = (start to end).map { raw =>
        byRaw.get(raw).map(g => invertAlternatives(g.text)).getOrElse(filler)
      }
      start = end + 1
      (file, i + 1, "ENEM 2023 cabeçalho\n" + slices.mkString(""), false)
    }
    cover +: pages
  }

  private def keyText(header: String, entries: Seq[(Int, String)]): String =
    header + "\n" + entries.map { case (n, a) => s"$n\n$a" }.mkString("\n")

  private def runExtract(pages: Seq[(String, Int, String, Boolean)],
      keys: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val pagesDf = pages.toDF("file_name", "page_idx", "page_text", "has_images")
    val keysDf = keys.toDF("file_name", "key_text")
    val pairs = Pairing.pair(pagesDf.select(col("file_name"))
      .union(keysDf.select(col("file_name"))).distinct())
    ExtractPipeline.extract(pagesDf, keysDf, pairs)
  }

  private def assertParity(out: DataFrame, golden: Seq[Golden]): Unit = {
    val got = out.select("question_num", "question_text", "alternatives",
        "correct_answer", "id", "subject")
      .collect().map { r =>
        (r.getInt(0), r.getString(5)) ->
          (r.getString(1), r.getSeq[String](2), r.getString(3), r.getString(4))
      }.toMap
    assert(got.size === golden.size,
      s"row count: got ${got.size}, golden ${golden.size}")
    golden.foreach { g =>
      val (text, alts, answer, id) = got((g.num, g.subject))
      assert(text === g.text, s"question_text mismatch at ${g.id}")
      assert(alts === g.alts, s"alternatives mismatch at ${g.id}")
      assert(answer === g.answer, s"answer mismatch at ${g.id}")
      assert(id === g.id, s"id mismatch at ${g.id}")
    }
  }

  test("D2 2023: math+natu golden records reproduce byte-exactly " +
    "(72 records)") {
    assume(available, "reference golden artifacts not present")
    val golden = loadGolden("D2", Map(
      "natu" -> "2023_D2_/2023_natu_questions.json",
      "math" -> "2023_D2_/2023_math_questions.json"))
    assert(golden.size === 72)
    // displayed = raw + 90; booklet raw 1..90.
    val byRaw = golden.map(g => (g.num - 90) -> g).toMap
    val pages = buildPages(TestBooklet.d2File, byRaw, 90)
    val key = keyText("CONFIRA O GABARITO DO ENEM 2023 D2",
      (91 to 180).map(d => d -> golden.find(_.num == d).map(_.answer)
        .getOrElse("A")))
    val out = runExtract(pages, Seq(TestBooklet.d2KeyFile -> key))
      .filter(col("day") === "D2")
    assertParity(out, golden)
  }

  test("D1 2023: spani+lang+huma golden records reproduce byte-exactly " +
    "(63 records; eng is empty in the golden run)") {
    assume(available, "reference golden artifacts not present")
    val golden = loadGolden("D1", Map(
      "eng" -> "2023_D1_/2023_eng_questions.json",
      "spani" -> "2023_D1_/2023_spani_questions.json",
      "lang" -> "2023_D1_/2023_lang_questions.json",
      "huma" -> "2023_D1_/2023_huma_questions.json"))
    assert(golden.size === 63)
    // raw = displayed for 1..5 (eng); spanish displayed 1-5 = raw 6-10;
    // lang/huma displayed = raw - 5 (raw > 5).
    val byRaw = golden.map { g =>
      val raw = g.subject match {
        case "eng"   => g.num
        case "spani" => g.num + 5
        case _       => g.num + 5
      }
      raw -> g
    }.toMap
    val pages = buildPages(TestBooklet.d1File, byRaw, 95)
    // key: english block 1-5, spanish block 1-5, then 6-90.
    val engBlock = (1 to 5).map(d => d -> "A")
    val spaBlock = (1 to 5).map(d =>
      d -> golden.filter(_.subject == "spani").find(_.num == d)
        .map(_.answer).getOrElse("B"))
    val rest = (6 to 90).map(d => d -> golden
      .filter(g => g.subject == "lang" || g.subject == "huma")
      .find(_.num == d).map(_.answer).getOrElse("C"))
    val key = keyText("CONFIRA O GABARITO DO ENEM 2023 D1",
      engBlock ++ spaBlock ++ rest)
    val out = runExtract(pages, Seq(TestBooklet.d1KeyFile -> key))
      .filter(col("day") === "D1")
    assertParity(out, golden)
  }

  test("TXT mode: toTxtRecords concatenation equals the committed golden " +
    "TXT byte-for-byte; T7 chunk split recovers every record") {
    assume(available, "reference golden artifacts not present")
    val goldenTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$refBase/2023_D2_/2023_math_questions.txt")), "UTF-8")

    // rebuild the booklet, project TXT records for math, concatenate.
    val golden = loadGolden("D2", Map(
      "natu" -> "2023_D2_/2023_natu_questions.json",
      "math" -> "2023_D2_/2023_math_questions.json"))
    val byRaw = golden.map(g => (g.num - 90) -> g).toMap
    val pages = buildPages(TestBooklet.d2File, byRaw, 90)
    val key = keyText("CONFIRA O GABARITO DO ENEM 2023 D2",
      (91 to 180).map(d => d -> golden.find(_.num == d).map(_.answer)
        .getOrElse("A")))
    val out = runExtract(pages, Seq(TestBooklet.d2KeyFile -> key))
      .filter(col("subject") === "math")
    val rebuilt = ExtractPipeline.toTxtRecords(out
        .orderBy(col("question_num")))
      .select("record").collect().map(_.getString(0)).mkString("")
    assert(rebuilt === goldenTxt)

    // T7: chunk-splitting the golden TXT yields one chunk per record, each
    // ending in the answer line the 22-char buffer captures.
    val chunks = graft.functions.TextFunctions.chunkSplit(goldenTxt)
    assert(chunks.size === 35)
    assert(chunks.forall(_.contains("(RESPOSTA CORRETA)")))
    assert(chunks.head.startsWith("(Enem/2023)  QUESTÃO 136"))
    assert(chunks.forall(c => c.takeRight(3).matches(": [A-E]") ||
      c.takeRight(3).endsWith("\n") ))
  }

  /** 2022 parity (BASELINE.md row 1): the reference commits no 2022 golden
    * records, only the per-subject counts of its 2022 ETL run
    * (extraction_metadata/test_extraction_metadata.csv rows 2-3:
    * math 37, natu 29, spani 3, lang 24, huma 26 — 119 total,
    * tests/etl_test_result.md:23). A 2022 D1+D2 booklet pair is
    * reconstructed with non-standard fillers occupying every dropped raw
    * position, so the extract must land on EXACTLY those counts, and the
    * stats pivot must reproduce the committed CSV row. */
  /** Doubled-letter question (2022/2023-era PDF text shape). */
  private def doubledQ(year: Int)(raw: Int): String =
    s"QUESTÃO\nenunciado $year raw$raw\n" +
      (1 to 5).zip(Seq("A", "B", "C", "D", "E")).map {
        case (i, l) => s"$l\n$l alternativa $i"
      }.mkString("\n") + "\n"

  /** Single-letter + two-space question (the 2020-era shape that only the
    * fallback regex `([A-E])\s{2}` recognizes —
    * enem_pdf_extractor.py:123). */
  private def singleLetterQ(year: Int)(raw: Int): String =
    s"QUESTÃO\nenunciado $year raw$raw\n" +
      (1 to 5).zip(Seq("A", "B", "C", "D", "E")).map {
        case (i, l) => s"$l  alternativa $i"
      }.mkString("\n") + "\n"

  private def buildCountBooklet(file: String, keepRaws: Set[Int],
      maxRaw: Int, year: Int,
      standardQ: Int => String): Seq[(String, Int, String, Boolean)] = {
    val cover = (file, 0, s"INSTRUÇÕES — capa $year", false)
    val pages = (1 to maxRaw).grouped(12).zipWithIndex.map {
      case (raws, i) =>
        val body = raws.map { raw =>
          if (keepRaws(raw)) standardQ(raw) else filler
        }.mkString("")
        (file, i + 1, s"ENEM $year cabeçalho\n" + body, false)
    }.toSeq
    cover +: pages
  }

  test("2022 D1+D2: extraction count parity with the reference's committed " +
    "metadata (math 37, natu 29, spani 3, lang 24, huma 26 — 119 total)") {
    val metaCsv = new java.io.File(
      "/root/reference/extraction_metadata/test_extraction_metadata.csv")
    assume(metaCsv.exists(), "reference extraction metadata not present")
    // the committed 2022 counts, straight from the artifact.
    val lines = scala.io.Source.fromFile(metaCsv).getLines().toSeq
    val cols = lines.head.split(",").drop(1) // math,natu,spani,lang,huma
    val todas = lines.find(_.startsWith("2022 todas questoes")).get
      .split(",").drop(1).map(_.toDouble.toLong)
    val refCounts = cols.zip(todas).toMap
    assert(refCounts.values.sum === 119L)

    val d1File = "2022_PV_impresso_D1_CD1.pdf"
    val d1Key = "2022_GB_impresso_D1_CD1.pdf"
    val d2File = "2022_PV_impresso_D2_CD7.pdf"
    val d2Key = "2022_GB_impresso_D2_CD7.pdf"

    // D1 raw layout: eng 1-5, spani 6-10, lang 11-50, huma 51-95. Keep
    // exactly the reference's surviving counts (eng is never loaded).
    val d1Keep = Set.empty[Int] ++
      Seq(6, 8, 9).take(refCounts("spani").toInt) ++
      (11 to 50).take(refCounts("lang").toInt) ++
      (51 to 95).take(refCounts("huma").toInt)
    // D2: natu 1-45, math 46-90.
    val d2Keep = Set.empty[Int] ++
      (1 to 45).take(refCounts("natu").toInt) ++
      (46 to 90).take(refCounts("math").toInt)

    val pages = buildCountBooklet(d1File, d1Keep, 95, 2022, doubledQ(2022)) ++
      buildCountBooklet(d2File, d2Keep, 90, 2022, doubledQ(2022))
    val d1KeyTxt = keyText("CONFIRA O GABARITO DO ENEM 2022 D1",
      (1 to 5).map(d => d -> "A") ++ (1 to 5).map(d => d -> "B") ++
        (6 to 90).map(d => d -> "C"))
    val d2KeyTxt = keyText("CONFIRA O GABARITO DO ENEM 2022 D2",
      (91 to 180).map(d => d -> "D"))

    val out = runExtract(pages, Seq(d1Key -> d1KeyTxt, d2Key -> d2KeyTxt))
    val got = out.groupBy(col("subject")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refCounts.filter(_._2 > 0),
      s"2022 per-subject counts diverge: got $got, reference $refCounts")
    assert(got.values.sum === 119L)
    // every surviving record carries a key answer and a 2022 id.
    assert(out.filter(col("correct_answer").isNull).count() === 0)
    assert(out.filter(!col("id").startsWith("2022_")).count() === 0)
  }

  /** 2020 parity (BASELINE.md row 2): the single-letter-alternative era —
    * the shape only T5's fallback regex recognizes. Counts come from the
    * reference's committed qdrant load metadata
    * (extraction_metadata/qdrant_extraction_data.csv rows 4-5: lang 14,
    * huma 34, math 18, eng 3, spani 5 — 74 total; natu EMPTY, matching the
    * reference's note that 2020 D2's unusual character encoding defeats
    * text extraction, enem_pdf_extractor.py:12 — modeled here as every
    * natu slot non-standard). */
  test("2020 D1+D2: single-letter-era extraction count parity with the " +
    "reference's committed qdrant metadata (lang 14, huma 34, math 18, " +
    "eng 3, spani 5 — 74 total; natu unextractable)") {
    val metaCsv = new java.io.File(
      "/root/reference/extraction_metadata/qdrant_extraction_data.csv")
    assume(metaCsv.exists(), "reference qdrant metadata not present")
    val lines = scala.io.Source.fromFile(metaCsv).getLines().toSeq
    val cols = lines.head.split(",", -1).drop(1) // lang,huma,math,eng,spani,natu
    val todas = lines.find(_.startsWith("2020 todas questoes")).get
      .split(",", -1).drop(1)
      .map(s => if (s.trim.isEmpty) 0L else s.toDouble.toLong)
    val refCounts = cols.zip(todas).toMap
    assert(refCounts.values.sum === 74L)
    assert(refCounts("natu") === 0L)

    val d1File = "2020_PV_impresso_D1_CD1.pdf"
    val d1Key = "2020_GB_impresso_D1_CD1.pdf"
    val d2File = "2020_PV_impresso_D2_CD5.pdf"
    val d2Key = "2020_GB_impresso_D2_CD5.pdf"

    // D1 raw layout: eng 1-5, spani 6-10, lang 11-50, huma 51-95.
    val d1Keep = Set.empty[Int] ++
      (1 to 5).take(refCounts("eng").toInt) ++
      (6 to 10).take(refCounts("spani").toInt) ++
      (11 to 50).take(refCounts("lang").toInt) ++
      (51 to 95).take(refCounts("huma").toInt)
    // D2: natu 1-45 (all unextractable → kept empty), math 46-90.
    val d2Keep = Set.empty[Int] ++
      (46 to 90).take(refCounts("math").toInt)

    val pages =
      buildCountBooklet(d1File, d1Keep, 95, 2020, singleLetterQ(2020)) ++
      buildCountBooklet(d2File, d2Keep, 90, 2020, singleLetterQ(2020))
    val d1KeyTxt = keyText("CONFIRA O GABARITO DO ENEM 2020 D1",
      (1 to 5).map(d => d -> "A") ++ (1 to 5).map(d => d -> "B") ++
        (6 to 90).map(d => d -> "C"))
    val d2KeyTxt = keyText("CONFIRA O GABARITO DO ENEM 2020 D2",
      (91 to 180).map(d => d -> "D"))

    val out = runExtract(pages, Seq(d1Key -> d1KeyTxt, d2Key -> d2KeyTxt))
    val got = out.groupBy(col("subject")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refCounts.filter(_._2 > 0),
      s"2020 per-subject counts diverge: got $got, reference $refCounts")
    assert(got.values.sum === 74L)
    // every record parsed through the FALLBACK path with all 5
    // alternatives recovered, carries a key answer, and a 2020 id.
    assert(out.filter(size(col("alternatives")) =!= 5).count() === 0)
    assert(out.filter(col("correct_answer").isNull).count() === 0)
    assert(out.filter(!col("id").startsWith("2020_")).count() === 0)
  }

  /** 2020 degraded-encoding behavior (enem_pdf_extractor.py:6-13, :123):
    * 2020 PDFs do NOT double the alternative letters — the reference falls
    * back to the single-letter-plus-two-spaces pattern. No golden records
    * exist (the reference cannot extract 2020 text at all), so the pinned
    * contract is the fallback reformat semantics end-to-end through
    * extract. */
  test("2020 D1: single-letter alternatives parse via the two-space " +
    "fallback, end-to-end") {
    val file = "2020_PV_impresso_D1_CD1.pdf"
    val keyF = "2020_GB_impresso_D1_CD1.pdf"
    def q2020(i: Int): String =
      s"QUESTÃO\nenunciado 2020 número $i\n" +
        s"A  alternativa um\nB  alternativa dois\nC  alternativa três\n" +
        s"D  alternativa quatro\nE  alternativa cinco\n"
    // raw 1-5 eng, 6-10 spani, 11-13 lang; booklet truncated after 13.
    val pages = Seq(
      (file, 0, "INSTRUÇÕES — capa 2020", false),
      (file, 1, "ENEM 2020 cabeçalho\n" + (1 to 6).map(q2020).mkString(""),
        false),
      (file, 2, (7 to 13).map(q2020).mkString(""), false))
    val key = keyText("CONFIRA O GABARITO DO ENEM 2020 D1",
      (1 to 5).map(d => d -> "A") ++ (1 to 5).map(d => d -> "B") ++
        (6 to 90).map(d => d -> "C"))
    val out = runExtract(pages, Seq(keyF -> key)).collect()
    assert(out.length === 13)
    val first = out.minBy(_.getAs[Int]("question_num"))
    // the fallback reformat replaces "A  " with "A)" (two spaces consumed,
    // no trailing space) — byte-exact contract of the reference's
    // replace_match on the single_letter_pattern.
    assert(first.getAs[String]("question_text").contains(
      "A)alternativa um\nB)alternativa dois\nC)alternativa três\n" +
        "D)alternativa quatro\nE)alternativa cinco\n"))
    assert(first.getAs[Seq[String]]("alternatives") === Seq(
      "A)alternativa um\n", "B)alternativa dois\n", "C)alternativa três\n",
      "D)alternativa quatro\n", "E)alternativa cinco\n"))
    // 2020 ids + key answers resolve through the same J2 join.
    assert(out.forall(_.getAs[String]("id").startsWith("2020_D1_")))
    assert(out.forall(_.getAs[String]("correct_answer") != null))
    // a MIXED corpus (2020-style + 2023-style booklets in one folder)
    // parses each question by its own shape.
    val mixed = runExtract(pages ++ TestBooklet.d1Pages,
      Seq(keyF -> key,
        TestBooklet.d1KeyFile -> TestBooklet.d1KeyText)).collect()
    assert(mixed.count(_.getAs[String]("id").startsWith("2020_")) === 13)
    assert(mixed.count(_.getAs[String]("id").startsWith("2023_")) > 0)
  }

  test("2022 stats pivot reproduces the committed metadata CSV row") {
    val metaCsv = new java.io.File(
      "/root/reference/extraction_metadata/test_extraction_metadata.csv")
    assume(metaCsv.exists(), "reference extraction metadata not present")
    import spark.implicits._
    // the 2022 per-(year, subject) counts as the pipeline's A4 input.
    val counts = Seq(
      (2022, "math", "todas questoes", 37L),
      (2022, "natu", "todas questoes", 29L),
      (2022, "spani", "todas questoes", 3L),
      (2022, "lang", "todas questoes", 24L),
      (2022, "huma", "todas questoes", 26L),
      (2022, "math", "questoes add", 37L),
      (2022, "natu", "questoes add", 29L),
      (2022, "spani", "questoes add", 3L),
      (2022, "lang", "questoes add", 24L),
      (2022, "huma", "questoes add", 26L)
    ).toDF("year", "subject", "kind", "n")
    val pivoted = graft.stats.LoadStats.pivot(counts)
      .collect().map(r => r.getString(0) ->
        graft.stats.LoadStats.Subjects.zipWithIndex
          .map { case (s, i) => s -> r.getLong(i + 1) }.toMap).toMap

    val refLines = scala.io.Source.fromFile(metaCsv).getLines().toSeq
    val refCols = refLines.head.split(",").drop(1)
    Seq("todas questoes", "questoes add").foreach { kind =>
      val refRow = refLines.find(_.startsWith(s"2022 $kind")).get
        .split(",").drop(1).map(_.toDouble.toLong)
      val ours = pivoted(s"2022 $kind")
      refCols.zip(refRow).foreach { case (subj, n) =>
        assert(ours(subj) === n, s"2022 $kind $subj: ours ${ours(subj)}, ref $n")
      }
      assert(ours("eng") === 0L) // the reference CSV has no eng column
    }
  }

  test("E3: loadTxtFile loads the golden TXT into the collection " +
    "(35 chunks, ids dense from the existing offset)") {
    assume(available, "reference golden artifacts not present")
    val root = java.nio.file.Files.createTempDirectory("graft_golden").toString
    graft.sources.VectorCollection.recreate(spark, root, "enem", dim = 32)
    val (attempted, added) = graft.etl.Pipeline.loadTxtFile(spark,
      s"$refBase/2023_D2_/2023_math_questions.txt", root, "enem",
      subject = "math", year = 2023, dim = 32)
    assert(attempted === 35)
    assert(added === 35)
    val coll = graft.sources.VectorCollection.read(spark, root, "enem")
    assert(coll.select("id").collect().map(_.getLong(0)).sorted
      === (0L until 35L).toArray)
    // empty TXT (golden 2023 eng) loads nothing — F5.
    val engTxt = s"$refBase/2023_D1_/2023_eng_questions.txt"
    if (new java.io.File(engTxt).exists()) {
      val (a2, d2) = graft.etl.Pipeline.loadTxtFile(spark, engTxt, root,
        "enem", subject = "eng", year = 2023, dim = 32)
      assert(a2 === 0L && d2 === 0L)
    }
  }
}
