package graft.operators

import graft.functions.Fingerprints
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) tokenizer training — the standard
  * subword-vocabulary construction (Sennrich et al. 2016, public
  * algorithm) over a Spark corpus.
  *
  * Scale shape: BPE iterates on the WORD-FREQUENCY table, not the corpus —
  * the one corpus-sized pass is the initial `groupBy(word).count()`
  * (map-side combinable; distinct-words cardinality, not corpus
  * cardinality, leaves each task). Every merge round is then (1) one
  * flatMap + aggregation over the word table counting adjacent symbol
  * pairs weighted by word frequency, and (2) one kernel map applying the
  * winning merge — with `localCheckpoint` truncating lineage per round so
  * round N's plan does not re-embed rounds 1..N-1. The driver sees ONE row
  * per round (the argmax pair); symbol arrays never leave the executors.
  *
  * Determinism: the merge picked each round is (max count, then
  * lexicographically smallest left, then right) — no hash or partition
  * order in the tiebreak, so any engine reproduces the same merge list.
  */
object Bpe {

  /** Greedy left-to-right application of one merge to a symbol sequence
    * (standard BPE semantics: non-overlapping, leftmost-first). */
  private[graft] def mergeOnce(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Initial symbolization: one symbol per CODE POINT. `word.map(_.toString)`
    * would split supplementary-plane chars (emoji, CJK extensions) into
    * lone UTF-16 surrogate halves — invalid strings that poison merges
    * and diverge from any codepoint-indexed oracle. */
  private[graft] def toSymbols(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Apply a merge list in training order to one word (chars → symbols). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = toSymbols(word)
    merges.foreach { case (l, r) => syms = mergeOnce(syms, l, r) }
    syms
  }

  /** The corpus word-frequency table: one row per distinct whitespace
    * token with its total occurrence count (the only corpus-sized job). */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Fingerprints.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent-symbol pair counts over a symbolized word table, weighted by
    * word frequency (the quantity BPE maximizes each round). */
  private def pairCounts(words: Dataset[(Array[String], Long)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.mapPartitions(_.flatMap { case (syms, cnt) =>
        (0 until syms.length - 1).iterator.map(i =>
          ((syms(i), syms(i + 1)), cnt))
      })
      .groupByKey(_._1)
      .mapValues(_._2).reduceGroups(_ + _)
      .map { case ((l, r), c) => (l, r, c) }
      .toDF("sym_l", "sym_r", "cnt")
  }

  /** Round-0 pair statistics: adjacent CHARACTER pair counts over all word
    * occurrences — what the first BPE merge maximizes, and an
    * oracle-checkable corpus statistic on its own. */
  def pairFrequencies(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    pairCounts(wordFreq(docs, textCol).as[(String, Long)]
      .map { case (w, c) => (toSymbols(w), c) })
  }

  /** Train `rounds` BPE merges. Returns the merge list in training order.
    * Words whose symbol count reaches 1 stop contributing pairs but stay
    * in the table (a later round cannot re-split them). */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordFreq(docs, textCol)
      .as[(String, Long)]
      .map { case (w, c) => (toSymbols(w), c) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      // k=1 driver traffic: the argmax pair only
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("sym_l"), asc("sym_r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        val next = words.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
          .localCheckpoint()
        words.unpersist()
        words = next
      }
      round += 1
    }
    words.unpersist()
    merges.toSeq
  }

  /** Encode every word occurrence of every document with a trained merge
    * list: (doc_id, word_pos, sym_pos, symbol). The merge list broadcasts
    * as a closure literal (it is `rounds` pairs — bytes, not data). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.toIndexedSeq
    Dedup.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        // tokensOf is Locale.ROOT-lowercased + \s+ split — the kernel
        // twin of wordFreq's Fingerprints.tokens (Spark lower()), so the
        // encoder sees the same words the trainer saw; the roundtrip
        // audit joins words from the COLUMN tokenizer against symbols
        // from this one, so any drift between the two surfaces there
        TextAnalysis.tokensOf(t).iterator.zipWithIndex
          .flatMap { case (w, wi) =>
            encodeWord(w, ms).iterator.zipWithIndex.map {
              case (s, si) => (id, wi, si, s)
            }
          }
      })
      .toDF("doc_id", "word_pos", "sym_pos", "symbol")
  }
}
