package graft.model

/** Core data model of the engine — the reference's implicit Python dict/str
  * structures normalized to fixed Spark schemas (SURVEY.md §1.1).
  *
  * Reference shapes:
  *  - Page:      enem_pdf_extractor.py:234-236 (fitz.Page + text)
  *  - Question:  enem_pdf_extractor.py:339-389 (__get_json_from_question__)
  *  - Point:     qdrant_text_loader.py:204-212 (PointStruct id/vector/payload)
  *  - AnswerKey: enem_pdf_extractor.py:961-966 (filtered key text, parsed)
  *  - SubjectRange: enem_pdf_extractor.py:408 (D1), :559 (D2)
  */
final case class PdfFile(
    path: String,
    fileName: String,
    year: Int,
    day: String,   // "D1" | "D2"
    kind: String,  // "PV" (test) | "GB" (answer key)
    color: String  // "CD1".."CD9"
)

final case class Page(
    fileName: String,
    pageIdx: Int,
    pageText: String,
    hasImages: Boolean,
    imageNames: Seq[String]
)

final case class Question(
    question_text: String,
    correct_answer: String,
    alternatives: Seq[String],
    page_images: Seq[String],
    id: String,
    year: Int,
    day: String,
    question_num: Int,
    subject: String
)

final case class AnswerKeyEntry(question_num: Int, answer: String)

/** Subject bucketing as data, not code paths (SURVEY.md op T9/J3). */
final case class SubjectRange(day: String, lo: Int, hi: Int, subject: String)

object SubjectRange {
  /** enem_pdf_extractor.py:408 (D1) and :559 (D2). Question numbers are the
    * raw in-booklet positions (before T10 renumbering). */
  val all: Seq[SubjectRange] = Seq(
    SubjectRange("D1", 1, 5, "eng"),
    SubjectRange("D1", 6, 10, "spani"),
    SubjectRange("D1", 11, 50, "lang"),
    SubjectRange("D1", 51, 95, "huma"),
    SubjectRange("D2", 1, 45, "natu"),
    SubjectRange("D2", 46, 91, "math")
  )
}

/** Vector point row: qdrant_text_loader.py:204-212. Payload's nested
  * metadata {materia, ano} is flattened to columns. */
final case class Point(
    id: Long,
    vector: Seq[Float],
    page_content: String,
    materia: String,
    ano: Int
)

final case class LoadStat(year: Int, subject: String, kind: String, n: Long)
