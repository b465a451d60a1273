package graft

import graft.operators.{AnswerKey, ExtractPipeline, Pairing}
import org.apache.spark.sql.functions._

class ExtractPipelineSpec extends SparkSpec {

  private lazy val pages = TestBooklet.pagesDf(spark)
  private lazy val keys = TestBooklet.keysDf(spark)
  private lazy val pairs = Pairing.pair(
    pages.select(col("file_name"))
      .union(keys.select(col("file_name"))).distinct())
  private lazy val out =
    ExtractPipeline.extract(pages, keys, pairs).cache()

  test("J1: pairing matches tests to keys on (day, color)") {
    val p = pairs.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(p(TestBooklet.d1File) === TestBooklet.d1KeyFile)
    assert(p(TestBooklet.d2File) === TestBooklet.d2KeyFile)
  }

  test("W1/F3/F4: numbering counts image-page and non-standard questions " +
    "but output drops them") {
    val d1 = out.filter(col("day") === "D1")
    // 12 markers in the booklet; Q6-7 on the image page and Q12
    // (non-standard) are dropped → 9 rows, but numbering reflects all 12.
    assert(d1.count() === 9)
    val nums = d1.select("question_num").collect().map(_.getInt(0)).sorted
    // displayed numbers: eng 1-5 → 1-5; spanish 8-10 → 3-5; lang 11 → 6.
    assert(nums === Array(1, 2, 3, 3, 4, 4, 5, 5, 6))
  }

  test("T9/J3: subject bucketing by raw in-booklet position") {
    val bySubject = out.filter(col("day") === "D1")
      .groupBy("subject").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySubject === Map("eng" -> 5L, "spani" -> 3L, "lang" -> 1L))
  }

  test("J2: answers join through displayed number + Spanish occurrence") {
    val byId = out.filter(col("day") === "D1")
      .select(col("question_num"), col("subject"), col("correct_answer"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getString(2))
      .toMap
    assert(byId((1, "eng")) === "A")   // english block: 1→A
    assert(byId((5, "eng")) === "E")
    assert(byId((3, "spani")) === "C") // spanish block: 3→C (EDCBA)
    assert(byId((5, "spani")) === "A")
    assert(byId((6, "lang")) === "A")  // 6-90 cycle starts at A
  }

  test("T10: D2 questions renumbered +90 and keyed accordingly") {
    val d2 = out.filter(col("day") === "D2")
      .select(col("question_num"), col("subject"), col("correct_answer"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(d2.map(_._1).toSeq === Seq(91, 92, 93, 94))
    assert(d2.forall(_._2 == "natu"))
    assert(d2.map(_._3).toSeq === Seq("A", "B", "C", "D"))
  }

  test("T12: stable ids use year/day/displayed number") {
    val ids = out.select("id").collect().map(_.getString(0))
    assert(ids.contains("2023_D1_N1"))
    assert(ids.contains("2023_D2_N91"))
  }

  test("T2: barcode tokens are stripped from question text") {
    val texts = out.select("question_text").collect().map(_.getString(0))
    assert(!texts.exists(_.contains("*ABCDEFGHI*")))
  }

  test("imagesMode keeps image-page questions") {
    val withImages = ExtractPipeline.extract(pages, keys, pairs,
      imagesMode = true)
    assert(withImages.filter(col("day") === "D1").count() === 12 - 1) // Q12 still non-standard
  }

  test("extractTyped: Dataset[Question] boundary round-trips the rows") {
    val typed = ExtractPipeline.extractTyped(pages, keys, pairs)
    val qs = typed.collect()
    assert(qs.length === out.count())
    assert(qs.forall(q => q.alternatives.size >= 5))
    assert(qs.map(_.id).toSet ===
      out.select("id").collect().map(_.getString(0)).toSet)
  }

  test("T13: TXT-mode template matches the reference format") {
    val txt = ExtractPipeline.toTxtRecords(
      out.filter(col("id") === "2023_D1_N1"))
      .select("record").first().getString(0)
    assert(txt.startsWith("(Enem/2023)  QUESTÃO"))
    assert(txt.endsWith("(RESPOSTA CORRETA): A\n\n"))
  }

  test("J1 abort path: a test without a key is reported") {
    import spark.implicits._
    val files = Seq("2022_PV_impresso_D1_CD3.pdf").toDF("file_name")
    assert(Pairing.unpairedTests(files).count() === 1)
  }

  test("AnswerKey.parse: duplicate numbers get occurrence indices") {
    val parsed = AnswerKey.parse(keys, "file_name", "key_text")
      .filter(col("key_file") === TestBooklet.d1KeyFile)
    assert(parsed.count() === 95) // 5 eng + 5 spa + 85 rest
    val dups = parsed.filter(col("question_num") === 3)
      .orderBy("occurrence")
      .collect().map(r => (r.getInt(2), r.getString(3)))
    assert(dups.toSeq === Seq((0, "C"), (1, "C")))
  }
}
