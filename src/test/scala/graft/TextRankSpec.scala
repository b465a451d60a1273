package graft

import graft.operators.{GraphOps, TextAnalysis}
import org.apache.spark.sql.functions._

/** TextRank keyword extraction and the string-keyed PageRank it rides
  * on: keyed/long kernels agree on the same graph, the co-occurrence
  * graph is undirected and self-loop-free, hub words outrank leaf
  * words, and the whole pipeline is partitioning-invariant. The gate
  * query `docs_textrank` value-checks against DuckDB's unrolled
  * replay at sf0.01. */
class TextRankSpec extends SparkSpec {

  import spark.implicits._

  test("pageRankIntKeyed equals pageRankInt on the same graph " +
      "modulo key type") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val asLong = GraphOps.pageRankInt(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    val keyed = GraphOps.pageRankIntKeyed(
        edges.select(concat(lit("w"), col("src")).as("src"),
          concat(lit("w"), col("dst")).as("dst")),
        "src", "dst", iters = 3)
      .collect().map(r => r.getString(0).drop(1) -> r.getLong(1)).toMap
    assert(keyed === asLong)
  }

  test("a hub word adjacent to every other word outranks the leaves; " +
      "ties break by word") {
    // docs: "hub a", "hub b", "hub c" → hub touches 3 words, each leaf 1
    val docs = Seq((0L, "hub a"), (1L, "hub b"), (2L, "hub c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textRankWords(docs, "doc_id", "text",
      iters = 3, topK = 10).collect()
    assert(out.head.getString(0) === "hub")
    assert(out.map(_.getString(0)).toSeq === Seq("hub", "a", "b", "c"))
    // leaves are symmetric → identical integer ranks, word-ordered
    assert(out.drop(1).map(_.getLong(1)).distinct.length === 1)
  }

  test("self-pairs and repeated co-occurrence collapse: 'x x y' " +
      "contributes only the x—y edge") {
    val docs = Seq((0L, "x x y"), (1L, "y x")).toDF("doc_id", "text")
    val out = TextAnalysis.textRankWords(docs, "doc_id", "text",
      iters = 2, topK = 10).collect()
    assert(out.map(_.getString(0)).sorted === Array("x", "y"))
    // two-node symmetric graph → equal ranks
    assert(out.map(_.getLong(1)).distinct.length === 1)
  }

  test("textRankWords is partitioning-invariant and respects topK") {
    val docs = (0L until 60L).map(i =>
      (i, (0 to (i % 5).toInt + 1).map(j => s"w${(i + 2 * j) % 9}")
        .mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val a = TextAnalysis.textRankWords(df, "doc_id", "text", 3, 5)
      .collect().toSeq
    val b = TextAnalysis.textRankWords(df.repartition(7), "doc_id",
      "text", 3, 5).collect().toSeq
    assert(a === b)
    assert(a.length === 5)
  }
}
