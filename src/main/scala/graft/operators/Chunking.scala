package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structure-aware RAG chunking: greedily pack an ORDERED segmentation
  * of each document (sentences, lines, paragraphs, fixed word windows —
  * the caller picks; see [[Boilerplate.wordWindows]]) into chunks of at
  * most `budgetTokens` whitespace tokens, never splitting a segment.
  * The fixed-stride complement is `TextFunctions.slidingChunks`
  * (character windows, no structure); this one respects boundaries —
  * the chunker retrieval pipelines actually want, because a chunk that
  * cuts mid-sentence embeds noise.
  *
  * Greedy-close semantics (first-fit, order-preserving): a chunk closes
  * when the NEXT segment would overflow the budget; a single segment
  * larger than the budget forms its own oversize chunk (dropping it
  * would silently lose text — callers wanting a hard cap compose with
  * `slidingChunks` on the oversize rows). Pure integer/string logic —
  * no floating point anywhere, so an oracle replays the greedy
  * recursion exactly.
  *
  * Scale: one typed-kernel pass (PLANS.md lesson 7); each document's
  * greedy loop is O(segments), rows never leave their partition until
  * the caller's sink. */
object Chunking {

  /** Pack `segsCol` (array<string>, caller-ordered) into token-budget
    * chunks. Output: (doc_id, chunk_idx, chunk_text, n_tokens, n_segs)
    * — chunk_text joins the chunk's segments with a single space;
    * n_tokens counts whitespace tokens; docs with no (or all-empty)
    * segments emit nothing. */
  def packSegments(docs: DataFrame, idCol: String, segsCol: Column,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, "budgetTokens must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("_id"),
        coalesce(segsCol, array().cast("array<string>")).as("_segs"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, segs) =>
        val out = Seq.newBuilder[(Long, Int, String, Long, Int)]
        var chunkIdx = 0
        val cur = scala.collection.mutable.ArrayBuffer.empty[String]
        var curTok = 0L
        def tokenCount(s: String): Long =
          s.split(" ").count(_.nonEmpty).toLong
        def flush(): Unit = if (cur.nonEmpty) {
          out += ((id, chunkIdx, cur.mkString(" "), curTok, cur.length))
          chunkIdx += 1
          cur.clear()
          curTok = 0L
        }
        segs.filter(_.nonEmpty).foreach { seg =>
          val t = tokenCount(seg)
          if (cur.nonEmpty && curTok + t > budgetTokens) flush()
          cur += seg
          curTok += t
        }
        flush()
        out.result()
      }
      .toDF("doc_id", "chunk_idx", "chunk_text", "n_tokens", "n_segs")
  }
}
