package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J2 build side — the answer-key parser.
  *
  * The reference keeps the key as one page-0 string with all lines longer
  * than 4 chars deleted (F7 — enem_pdf_extractor.py:961-966), then probes it
  * per question with a linear regex search + hard-coded char offsets
  * (:190-227). We parse the key ONCE into a relational
  * `answer_key(question_num, occurrence, answer)` table and replace the
  * O(questions × key_size) probing with a broadcast equi-join.
  *
  * `occurrence` disambiguates the D1 language block: numbers 1-5 appear
  * twice in the key (English then Spanish — the reference selects between
  * them with a +2/+4 char offset, :203-213); occurrence 0 = first listing
  * (English), 1 = second (Spanish).
  */
object AnswerKey {

  /** keysText: (file_name, key_text) one row per answer PDF.
    *
    * Two real key-grid layouts feed `occurrence` (both observed in the
    * reference's own GB PDFs): (a) the language block prints the number
    * ONCE followed by BOTH letters — `1\nC\nC` = English then Spanish
    * (2021/2023 D1 keys; the reference reads them at char offsets +2
    * and +4, enem_pdf_extractor.py:203-213) — captured via a two-ahead
    * lookahead; (b) the number is listed TWICE (English block then
    * Spanish block) — captured by the duplicate-number rank. */
  def parse(keyText: DataFrame, fileCol: String, textCol: String): DataFrame = {
    // F7: keep only short lines (the number/letter columns of the key grid).
    val lines = keyText.select(col(fileCol).as("key_file"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .filter(length(trim(col("line"))) <= 4 && length(trim(col("line"))) > 0)
      .select(col("key_file"), col("line_no"), trim(col("line")).as("line"))

    // pair each question-number line with the next answer-letter line —
    // and, when the line after THAT is also a letter (layout (a)), emit
    // it as the Spanish occurrence.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key_file")).orderBy(col("line_no"))
    val eyed = lines
      .withColumn("next_line", lead(col("line"), 1).over(w))
      .withColumn("next2_line", lead(col("line"), 2).over(w))
      .filter(col("line").rlike("^[0-9]{1,3}$") &&
        col("next_line").rlike("^[A-E]$"))
    val paired = eyed
      .select(col("key_file"), col("line_no"),
        col("line").cast("int").as("question_num"),
        col("next_line").as("answer"), lit(0).as("slot"))
      .unionByName(eyed
        .filter(col("next2_line").rlike("^[A-E]$"))
        .select(col("key_file"), col("line_no"),
          col("line").cast("int").as("question_num"),
          col("next2_line").as("answer"), lit(1).as("slot")))

    // occurrence: rank within a question number across BOTH layouts —
    // (line_no, slot) orders English before Spanish in layout (a) and
    // first listing before second in layout (b).
    val occ = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key_file"), col("question_num"))
      .orderBy(col("line_no"), col("slot"))
    paired.withColumn("occurrence", row_number().over(occ) - 1)
      .select(col("key_file"), col("question_num"), col("occurrence"),
        col("answer"))
  }

  val AnswerNotFound = "não achou a questão"

  /** J2: broadcast left-outer join questions → answers with the reference's
    * miss sentinel (enem_pdf_extractor.py:197, :216). */
  def joinAnswers(questions: DataFrame, answerKey: DataFrame,
      keyFileCol: Column, numCol: Column, spanishCol: Column): DataFrame =
    questions.join(broadcast(answerKey),
        keyFileCol === col("key_file") &&
          numCol === col("question_num") &&
          when(spanishCol, 1).otherwise(0) === col("occurrence"),
        "left")
      .withColumn("correct_answer",
        coalesce(col("answer"), lit(AnswerNotFound)))
      .drop("key_file", "question_num", "occurrence", "answer")
}
