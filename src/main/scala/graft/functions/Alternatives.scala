package graft.functions

import scala.util.matching.Regex

/** T5 — the reference's alternative reformatter + splitter
  * (enem_pdf_extractor.py:116-175).
  *
  * PDF text extraction doubles each alternative letter ("A\nA body…");
  * the reference rewrites those markers to "A) ", counting substitutions,
  * with a two-space fallback pattern for 2020-era PDFs, then slices the
  * question body at the 5 markers. Questions with fewer than 5 marker
  * substitutions, or any empty alternative body (image alternatives), are
  * "non-standard" and dropped downstream (F4: :129-149, consumers :457-460).
  *
  * Pure Scala function: registered as a UDF in the extract pipeline (the
  * stateful two-pass regex logic doesn't decompose into built-in
  * expressions; it runs once per question record, off the hot scan path).
  */
object Alternatives {
  private val doubled: Regex = "([A-E])\\s*\\n\\1\\s*".r
  private val fallback: Regex = "([A-E])\\s{2}".r
  private val letters = Seq("A)", "B)", "C)", "D)", "E)")

  final case class Parsed(question_text: String, alternatives: Seq[String],
      standard: Boolean)

  def parse(raw: String): Parsed = {
    if (raw == null) return Parsed(null, Seq.empty, standard = false)
    var count = 0
    var text = doubled.replaceAllIn(raw, m => { count += 1; m.group(1) + ") " })
    if (count < 5) {
      count = 0
      text = fallback.replaceAllIn(raw, m => { count += 1; m.group(1) + ") " })
    }
    val idxs = letters.map(text.indexOf)
    if (count < 5 || idxs.exists(_ < 0) || idxs != idxs.sorted)
      return Parsed(text.trim, Seq.empty, standard = false)
    val bounds = idxs :+ text.length
    val alts = letters.indices.map { i =>
      text.substring(bounds(i), bounds(i + 1)).trim
    }
    val body = text.substring(0, idxs.head).trim
    // empty body after the "X)" marker (2 chars) ⇒ image alternative.
    val anyEmpty = alts.exists(_.length <= 2)
    Parsed(body, alts, standard = !anyEmpty)
  }
}
