package graft

import graft.operators.{Boilerplate, Chunking}
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(segLists: Seq[(Long, Seq[String])], budget: Int) =
    Chunking.packSegments(
        segLists.toDF("doc_id", "segs"), "doc_id", col("segs"), budget)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, String, Long, Int)].collect()

  test("greedy first-fit: chunk closes when the NEXT segment would overflow") {
    val got = pack(Seq((1L, Seq("a b c", "d e", "f g h i", "j"))), budget = 5)
    // 3 + 2 = 5 fits; +4 would be 9 → close; 4 + 1 = 5 fits
    assert(got === Array(
      (1L, 0, "a b c d e", 5L, 2),
      (1L, 1, "f g h i j", 5L, 2)))
  }

  test("an oversize segment forms its own chunk; text is never dropped") {
    val got = pack(Seq((1L, Seq("a", "b c d e f g", "h"))), budget = 3)
    assert(got === Array(
      (1L, 0, "a", 1L, 1),
      (1L, 1, "b c d e f g", 6L, 1),
      (1L, 2, "h", 1L, 1)))
    // every input token survives, in order
    assert(got.map(_._3).mkString(" ") === "a b c d e f g h")
  }

  test("empty segments are skipped; empty/missing seg arrays emit nothing") {
    val got = pack(Seq(
      (1L, Seq("", "a b", "")),
      (2L, Seq.empty[String]),
      (3L, null)
    ), budget = 10)
    assert(got === Array((1L, 0, "a b", 2L, 1)))
  }

  test("composes with wordWindows: full coverage, budget respected " +
      "except oversize singletons") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val got = Chunking.packSegments(docs, "doc_id",
        Boilerplate.wordWindows(col("text"), 5), budgetTokens = 10)
      .orderBy("chunk_idx")
      .as[(Long, Int, String, Long, Int)].collect()
    // windows: 5 + 5 + 2 words → chunks: (5+5), (2)
    assert(got.map(_._4).toSeq === Seq(10L, 2L))
    assert(got.map(_._3).mkString(" ") ===
      "one two three four five six seven eight nine ten eleven twelve")
  }

  test("budget guard fails loudly") {
    intercept[IllegalArgumentException] {
      Chunking.packSegments(Seq((1L, Seq("a"))).toDF("doc_id", "segs"),
        "doc_id", col("segs"), 0)
    }
  }
}
