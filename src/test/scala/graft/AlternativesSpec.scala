package graft

import graft.functions.Alternatives
import org.scalatest.funsuite.AnyFunSuite

class AlternativesSpec extends AnyFunSuite {

  test("T5: doubled-letter markers are rewritten and split (reference " +
    "golden format: 'X)body', text keeps alternatives)") {
    val raw = "QUESTÃO\nenunciado\nA\nA um\nB\nB dois\nC\nC três\n" +
      "D\nD quatro\nE\nE cinco\n"
    val p = Alternatives.parse(raw)
    assert(p.standard)
    // \s* after the doubled letter eats the separator space; entries run
    // from each marker start to the next marker start (incl. newline) —
    // exactly the reference's committed golden-JSON shape.
    assert(p.alternatives === Seq("A)um\n", "B)dois\n", "C)três\n",
      "D)quatro\n", "E)cinco\n"))
    assert(p.question_text ===
      "QUESTÃO\nenunciado\nA)um\nB)dois\nC)três\nD)quatro\nE)cinco\n")
  }

  test("T5: 2020-style two-space fallback pattern") {
    val raw = "QUESTÃO enunciado A  um B  dois C  três D  quatro E  cinco"
    val p = Alternatives.parse(raw)
    assert(p.standard)
    assert(p.alternatives.head === "A)um ")
    assert(p.alternatives.last === "E)cinco")
  }

  test("F4: fewer than 5 alternatives is non-standard") {
    val raw = "QUESTÃO x\nA\nA um\nB\nB dois\nC\nC três\n"
    assert(!Alternatives.parse(raw).standard)
  }

  test("F4: empty alternative body (image alternative) is non-standard") {
    val raw = "QUESTÃO x\nA\nA \nB\nB dois\nC\nC três\nD\nD quatro\nE\nE cinco\n"
    assert(!Alternatives.parse(raw).standard)
  }

  test("null-safe") {
    assert(!Alternatives.parse(null).standard)
  }
}
