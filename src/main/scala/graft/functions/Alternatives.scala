package graft.functions

import scala.util.matching.Regex

/** T5 — the reference's alternative reformatter + splitter
  * (enem_pdf_extractor.py:116-175), byte-exact.
  *
  * PDF text extraction doubles each alternative letter ("A\nA body…"); the
  * reference rewrites those markers to "A)" (no trailing space), counting
  * substitutions; fewer than 5 triggers the 2020-era two-space fallback ON
  * THE ALREADY-SUBSTITUTED text, and fewer than 5 again ⇒ "non-standard
  * alternatives" (dropped downstream, F4). The question text KEEPS the
  * reformatted alternatives; the alternatives list is re-derived from every
  * `[A-E])` occurrence — slice from each marker start to the next marker
  * start (so entries look like "A)body\n") — and any EMPTY body between a
  * marker end and the next marker start (an image alternative) also ⇒
  * non-standard. Verified byte-exact against the reference's committed
  * golden records (GoldenParitySpec).
  *
  * Pure Scala function: registered as a UDF in the extract pipeline (the
  * stateful two-pass regex logic doesn't decompose into built-in
  * expressions; it runs once per question record, off the hot scan path).
  */
object Alternatives {
  private val doubled: Regex = "([A-E])\\s*\\n\\1\\s*".r
  private val fallback: Regex = "([A-E])\\s{2}".r
  private val altMarker: Regex = "([A-E])\\)".r

  final case class Parsed(question_text: String, alternatives: Seq[String],
      standard: Boolean)

  def parse(raw: String): Parsed = {
    if (raw == null) return Parsed(null, Seq.empty, standard = false)
    var n1 = 0
    var text = doubled.replaceAllIn(raw, m => { n1 += 1; m.group(1) + ")" })
    if (n1 < 5) {
      var n2 = 0
      text = fallback.replaceAllIn(text, m => { n2 += 1; m.group(1) + ")" })
      if (n2 < 5) return Parsed(text, Seq.empty, standard = false)
    }
    val ms = altMarker.findAllMatchIn(text).toVector
    val bounds = ms.map(_.start) :+ text.length
    val anyEmpty = ms.indices.exists { i =>
      text.substring(ms(i).end, bounds(i + 1)).isEmpty
    }
    if (anyEmpty) return Parsed(text, Seq.empty, standard = false)
    val alts = ms.indices.map(i => text.substring(ms(i).start, bounds(i + 1)))
    Parsed(text, alts, standard = true)
  }
}
