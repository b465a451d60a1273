package graft

import graft.functions.UnicodeNorm
import org.apache.spark.sql.functions._

/** Unicode NFC normalization and diacritic folding: canonical
  * composition cases, idempotence, the ASCII fast path, non-Latin
  * passthrough, null propagation through the codegen'd expressions,
  * and the dedup-key scenario the operator exists for (cross-form
  * duplicates collapse under one md5 after NFC). Composed forms are
  * written with \\u escapes and decomposed twins DERIVED via NFD, so
  * the fixtures cannot be silently re-normalized by tooling. The gate
  * query `docs_nfc_keys` drives 4 phrase branches through the oracle. */
class UnicodeNormSpec extends SparkSpec {

  import spark.implicits._
  import UnicodeNorm.{nfcString, stripMarksString}

  private val Cafe = "café"
  private val Senor = "señor"
  private val Creme = "crème brûlée"
  private val NaiveResume = "naïve résumé"

  private def nfd(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)

  test("NFC composes combining sequences to precomposed forms and is " +
      "idempotent") {
    for (s <- Seq(Cafe, Senor, Creme, NaiveResume)) {
      val dec = nfd(s)
      assert(dec !== s, s"NFD must actually decompose <$s>")
      assert(nfcString(dec) === s)
      assert(nfcString(s) === s)
    }
    // ASCII fast path returns the SAME reference (isNormalized shortcut)
    val ascii = "plain ascii text"
    assert(nfcString(ascii) eq ascii)
  }

  test("stripMarks folds diacritics from either normalization form and " +
      "leaves non-Latin text intact") {
    assert(stripMarksString(Cafe) === "cafe")
    assert(stripMarksString(nfd(Cafe)) === "cafe")
    assert(stripMarksString(Creme) === "creme brulee")
    assert(stripMarksString(NaiveResume) === "naive resume")
    val cjk = "日本語" // 日本語 — no combining marks
    assert(stripMarksString(cjk) === cjk)
    assert(stripMarksString("") === "")
  }

  test("cross-form duplicates collapse under one md5 key after NFC; " +
      "nulls propagate") {
    val df = Seq(Some(s"$Cafe menu"), Some(s"${nfd(Cafe)} menu"), None)
      .toDF("text")
    val keys = df.select(md5(UnicodeNorm.nfc(col("text"))).as("k"))
    assert(keys.filter(col("k").isNotNull).distinct().count() === 1L)
    assert(keys.filter(col("k").isNull).count() === 1L)
    val raw = df.select(md5(col("text")).as("k"))
    assert(raw.filter(col("k").isNotNull).distinct().count() === 2L)
    assert(df.select(UnicodeNorm.stripMarks(col("text")).as("f"))
      .filter(col("f").isNull).count() === 1L)
  }
}
