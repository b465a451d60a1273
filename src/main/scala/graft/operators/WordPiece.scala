package graft.operators

import graft.functions.Fingerprints
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer,
  * per the public HuggingFace `tokenizers` algorithm) — the third
  * tokenizer family next to [[Bpe]] (frequency-merge) and
  * [[UnigramLm]] (likelihood-prune). WordPiece differs from BPE in
  * BOTH phases:
  *
  *  - TRAINING merges the adjacent pair maximizing
  *    score = count(ab) / (count(a) · count(b)) — pointwise mutual
  *    information rather than raw frequency, so rare-but-exclusive
  *    pairs win over frequent-but-promiscuous ones;
  *  - ENCODING is greedy longest-match-first against the final vocab
  *    (not a replay of the merge history): the longest vocab piece
  *    matching at the cursor is taken, word-internal pieces carry the
  *    `##` continuation prefix, and a word with NO match at some
  *    cursor becomes a single `[UNK]`.
  *
  * Scale shape — the [[Bpe.train]] discipline: the only corpus-sized
  * job is the word-frequency table; each training round shuffles
  * (symbol-pair, count) rows, drives ONE argmax row to the driver, and
  * localCheckpoints the symbolized table to truncate lineage. Encoding
  * broadcasts the vocab as a closure literal (piece strings — bytes,
  * not data) and runs per-word in a map, no shuffle.
  *
  * Determinism: the argmax score is compared as a DECIMAL(38) division
  * of exact BIGINT counts (same value every run/partitioning), ties
  * broken (sym_l, sym_r) lexicographically; encoding is a pure
  * function of (word, vocab). */
object WordPiece {

  val Unk = "[UNK]"

  private def strip(sym: String): String =
    if (sym.startsWith("##")) sym.substring(2) else sym

  /** Initial symbolization: first code point plain, rest `##`-prefixed
    * ([[Bpe.toSymbols]]'s codepoint discipline). */
  private[operators] def toSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    cps.zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }
  }

  private[operators] def mergeOnce(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + strip(r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy longest-match-first encode of one word against a vocab.
    * Pieces after the first match carry `##`; no match → `[UNK]` for
    * the whole word (BERT semantics). Pure function — the oracle
    * replays it with a recursive longest-prefix CTE. */
  def encodeWord(word: String, vocab: Set[String]): Array[String] = {
    if (word.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var end = word.length
      var hit: String = null
      while (end > pos && hit == null) {
        val cand = (if (pos > 0) "##" else "") + word.substring(pos, end)
        if (vocab.contains(cand)) hit = cand
        else end -= 1
      }
      if (hit == null) return Array(Unk)
      out += hit
      pos = end
    }
    out.toArray
  }

  private def symbolized(docs: DataFrame, textCol: String)
      : Dataset[(Array[String], Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(Fingerprints.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (toSymbols(w), c) }
  }

  /** Train `rounds` WordPiece merges; returns the vocabulary: every
    * initial symbol seen plus one new piece per completed merge. */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = symbolized(docs, textCol).localCheckpoint()
    val alphabet = words.flatMap(_._1).distinct().collect().sorted
    val learned = scala.collection.mutable.ArrayBuffer.empty[String]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val symCnt = words.flatMap { case (syms, c) => syms.map((_, c)) }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (s, c) => (s, c) }.toDF("sym", "sym_cnt")
      val pairCnt = words.mapPartitions(_.flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator.map(i =>
            ((syms(i), syms(i + 1)), c))
        })
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((l, r), c) => (l, r, c) }
        .toDF("sym_l", "sym_r", "cnt")
      // k=1 driver traffic: the argmax (score, l, r) row only. The
      // score divides exact BIGINT counts in DECIMAL(38) — identical
      // every run; equal-to-precision scores tie-break lexically.
      val top = pairCnt
        .join(symCnt.select(col("sym").as("sym_l"),
          col("sym_cnt").as("cnt_l")), "sym_l")
        .join(symCnt.select(col("sym").as("sym_r"),
          col("sym_cnt").as("cnt_r")), "sym_r")
        // marginals multiply as DECIMALs: a BIGINT cnt_l*cnt_r product
        // overflows once symbol counts pass ~3e9 (a 100 TB corpus is
        // far beyond), and the overflow would silently corrupt the
        // argmax rather than fail
        .withColumn("score", col("cnt").cast("decimal(19,0)") /
          (col("cnt_l").cast("decimal(19,0)") *
            col("cnt_r").cast("decimal(19,0)")))
        .select("sym_l", "sym_r", "score")
        .orderBy(desc("score"), asc("sym_l"), asc("sym_r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        learned += l + strip(r)
        val next = words.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
          .localCheckpoint()
        words.unpersist()
        words = next
      }
      round += 1
    }
    words.unpersist()
    (alphabet ++ learned).toSeq
  }

  /** Encode the corpus's distinct words with a vocab: one row per
    * distinct word — (word, pieces space-joined, n_pieces). The vocab
    * broadcasts as a closure literal; per-word map, no shuffle beyond
    * the distinct. */
  def encodeWords(docs: DataFrame, textCol: String,
      vocab: Set[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(Fingerprints.tokens(col(textCol))).as("word"))
      .distinct().as[String]
      .map { w =>
        val ps = encodeWord(w, vocab)
        (w, ps.mkString(" "), ps.length)
      }
      .toDF("word", "pieces", "n_pieces")
  }
}
