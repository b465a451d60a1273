package graft

import graft.functions.PorterStemmer.stem
import org.scalatest.funsuite.AnyFunSuite

/** Porter (1980) stemmer: the paper's own step examples, the
  * no-fall-through semantics, the 1b repair branches, y-as-consonant
  * logic, and guards. The gate query `docs_porter_stems` drives 20 of
  * these through the driver oracle. */
class PorterStemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    // step 1a (plurals)
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b: EED needs m>0; no fall-through to ED when it fails
    "feed" -> "feed", "agreed" -> "agre",
    // step 1b repairs: AT/BL/IZ regain E, double-consonant single-letters
    // except l/s/z, short (m=1, *o) stems regain E
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzing" -> "fizz", "failing" -> "fail",
    "filing" -> "file", "motoring" -> "motor", "plastered" -> "plaster",
    // step 1c: y→i only over a vowel-bearing stem
    "happy" -> "happi", "sky" -> "sky",
    // steps 2-4 chains
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "electrical" -> "electr",
    "hopefulness" -> "hope", "goodness" -> "good",
    "formalize" -> "formal", "generalization" -> "gener",
    "triplicate" -> "triplic", "adjustable" -> "adjust",
    "defensible" -> "defens", "activate" -> "activ",
    "replacement" -> "replac",
    // step 4 ION requires S/T stem
    "adoption" -> "adopt",
    // step 5b: double L single-letters only at m>1
    "controlling" -> "control", "roll" -> "roll")

  test("the paper's examples stem correctly across every step") {
    for ((w, s) <- vectors) assert(stem(w) === s, s"stem($w)")
  }

  test("input folds to lowercase; short words and null pass through") {
    assert(stem("Caresses") === "caress")
    assert(stem("AS") === "as")
    assert(stem("be") === "be")
    assert(stem("a") === "a")
    assert(stem(null) === null)
  }
}
