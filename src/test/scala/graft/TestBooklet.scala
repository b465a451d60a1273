package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic ENEM-shaped booklet fixtures reproducing the structures the
  * reference parses (FIXTURES.md §A): doubled alternative letters, barcode
  * tokens, cover pages, image pages, the D1 English/Spanish overlap, and a
  * grid-style answer key. Derived from the golden artifacts' structure
  * (pdf_content_to_files/2023_D2_/2023_math_questions.json), not copied. */
object TestBooklet {

  private def q(body: String, alts: Seq[String]): String = {
    val altText = alts.zip(Seq("A", "B", "C", "D", "E")).map {
      case (a, l) => s"$l\n$l $a"
    }.mkString("\n")
    s"QUESTÃO\n$body\n$altText\n"
  }

  val d1File = "2023_PV_impresso_D1_CD1.pdf"
  val d1KeyFile = "2023_GB_impresso_D1_CD1.pdf"
  val d2File = "2023_PV_impresso_D2_CD7.pdf"
  val d2KeyFile = "2023_GB_impresso_D2_CD7.pdf"

  private val fiveAlts =
    Seq("primeira alternativa", "segunda alternativa", "terceira alternativa",
      "quarta alternativa", "quinta alternativa")

  /** (file_name, page_idx, page_text, has_images) rows for a D1 booklet:
    * page0 cover; page1 Q1-5 (english); page2 Q6-7 (spanish, HAS IMAGES);
    * page3 Q8-10 (spanish) + barcode; page4 Q11 (lang) + Q12 non-standard. */
  def d1Pages: Seq[(String, Int, String, Boolean)] = Seq(
    (d1File, 0, "INSTRUÇÕES PARA A PROVA — capa sem questões", false),
    (d1File, 1,
      "Questões de 1 a 5 (inglês)\n" +
        (1 to 5).map(i =>
          q(s"enunciado inglês $i reading comprehension idiomEng$i", fiveAlts))
        .mkString(" "),
      false),
    (d1File, 2,
      (6 to 7).map(i =>
        q(s"enunciado espanhol $i com imagem lectura idiomSpa$i", fiveAlts))
        .mkString(" "),
      true),
    (d1File, 3,
      "*ABCDEFGHI* " +
        (8 to 10).map(i =>
          q(s"enunciado espanhol $i lectura comprensión idiomSpa$i", fiveAlts))
        .mkString(" "),
      false),
    (d1File, 4,
      q("enunciado linguagens 11", fiveAlts) + " " +
        "QUESTÃO\nenunciado não-padrão 12\nA\nA só\nB\nB duas\nC\nC três\n",
      false)
  )

  /** D2 booklet: page0 cover; page1 Q1-4 (natureza). */
  def d2Pages: Seq[(String, Int, String, Boolean)] = Seq(
    (d2File, 0, "INSTRUÇÕES — capa", false),
    (d2File, 1,
      (1 to 4).map(i =>
        q(s"enunciado natureza $i física química bioTema$i", fiveAlts))
        .mkString(" "),
      false)
  )

  /** Grid-style answer-key text (long header lines get dropped by F7):
    * D1 = english 1-5 (A..E), spanish 1-5 (E..A), 6-90 cycling A-E;
    * D2 = 91-180 cycling A-E. */
  def d1KeyText: String = {
    val eng = (1 to 5).map(i => s"$i\n${"ABCDE"(i - 1)}")
    val spa = (1 to 5).map(i => s"$i\n${"EDCBA"(i - 1)}")
    val rest = (6 to 90).map(i => s"$i\n${"ABCDE"((i - 6) % 5)}")
    "CONFIRA AQUI O GABARITO DAS PROVAS DO ENEM 2023 D1\n" +
      (eng ++ spa ++ rest).mkString("\n")
  }

  def d2KeyText: String = {
    val rest = (91 to 180).map(i => s"$i\n${"ABCDE"((i - 91) % 5)}")
    "CONFIRA AQUI O GABARITO DAS PROVAS DO ENEM 2023 D2\n" +
      rest.mkString("\n")
  }

  def pagesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (d1Pages ++ d2Pages)
      .toDF("file_name", "page_idx", "page_text", "has_images")
  }

  def keysDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((d1KeyFile, d1KeyText), (d2KeyFile, d2KeyText))
      .toDF("file_name", "key_text")
  }
}
