package graft

import graft.operators.AnswerKey

/** Synthetic unit coverage for BOTH real answer-key grid layouts (the
  * real-bytes face of this is in PdfGoldenSpec; this spec survives
  * without /root/reference):
  *  (a) language block prints the number ONCE with both letters after
  *      it — `1\nC\nC` = English then Spanish (2021/2023 D1 keys);
  *  (b) the number is listed TWICE, English block then Spanish block.
  */
class AnswerKeyLayoutSpec extends SparkSpec {

  private def parse(text: String): Map[(Int, Int), String] = {
    import spark.implicits._
    AnswerKey.parse(Seq(("k.pdf", text)).toDF("file_name", "key_text"),
        "file_name", "key_text")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getString(3)).toMap
  }

  test("layout (a): num + English + Spanish letters in a triple") {
    val key = "1\nC\nC\n2\nA\nE\n3\nB\n4\nD\n5\nE\nA\n6\nB\n7\nD\n"
    val parsed = parse(key)
    assert(parsed((1, 0)) === "C" && parsed((1, 1)) === "C")
    assert(parsed((2, 0)) === "A" && parsed((2, 1)) === "E")
    assert(parsed((5, 0)) === "E" && parsed((5, 1)) === "A")
    // single-letter rows yield exactly one occurrence
    assert(parsed((3, 0)) === "B" && !parsed.contains((3, 1)))
    assert(parsed((6, 0)) === "B" && !parsed.contains((6, 1)))
    assert(parsed((7, 0)) === "D" && !parsed.contains((7, 1)))
  }

  test("layout (b): number listed twice across language blocks") {
    val key = "1\nC\n2\nA\n3\nB\n1\nE\n2\nD\n3\nA\n"
    val parsed = parse(key)
    assert(parsed((1, 0)) === "C" && parsed((1, 1)) === "E")
    assert(parsed((2, 0)) === "A" && parsed((2, 1)) === "D")
    assert(parsed((3, 0)) === "B" && parsed((3, 1)) === "A")
  }

  test("D2 grid with an annulled row yields no entry for that number") {
    val key = "136\nB\n137\nC\n138\nanulada\n139\nE\n"
    val parsed = parse(key)
    assert(parsed((136, 0)) === "B" && parsed((139, 0)) === "E")
    assert(!parsed.exists(_._1._1 == 138))
  }
}
