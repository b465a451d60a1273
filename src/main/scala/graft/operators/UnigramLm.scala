package graft.operators

import graft.functions.Fingerprints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer (Kudo 2018 — the SentencePiece
  * family), the second tokenizer family next to [[Bpe]]: a piece
  * vocabulary with log-probabilities, Viterbi segmentation of each word
  * into the max-likelihood piece sequence, and fixed-round EM
  * re-estimation. Where BPE greedily merges, unigram-LM SELECTS from a
  * candidate pool — segmentation adapts to piece probabilities, which
  * is why it handles morphology-rich text better.
  *
  * Determinism: candidate selection orders by (freq desc, piece);
  * Viterbi breaks score ties by FEWER pieces, then lexicographic
  * backpointer; EM runs a FIXED number of rounds. Every stage is a
  * deterministic function of the corpus, so the vocab and segmentations
  * are stable contract values (pinned in UnigramLmSpec / goldens);
  * the reassembly invariant is oracle-gated 0-row
  * (`vocab_unigram_roundtrip` — the [[Bpe]] roundtrip pattern).
  *
  * Scale shape: the corpus-sized jobs are one word-frequency
  * aggregation and one substring-candidate aggregation over DISTINCT
  * words (explode bounded by |word|·maxPieceLen); EM's E-step
  * re-segments the distinct-word table (vocab broadcast in the
  * closure) and aggregates usage map-side. The vocabulary itself is a
  * driver sidecar (vocabSize entries). */
object UnigramLm {

  final case class Vocab(logp: Map[String, Double], floorLogp: Double)
      extends Serializable

  /** Viterbi segmentation of one word against the vocab: max total
    * logp; ties → fewer pieces, then lexicographically smallest piece
    * at the latest decision point. Unknown single chars take the floor
    * score, so segmentation never fails. */
  def segmentWord(word: String, vocab: Vocab, maxLen: Int = 6): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    // dp(i): best (score, pieces) for prefix [0, i)
    val score = new Array[Double](n + 1)
    val pieces = new Array[Int](n + 1)
    val back = new Array[Int](n + 1) // start index of last piece
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (score(j) > Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val lp = vocab.logp.get(piece) match {
            case Some(v) => v
            case None =>
              if (i - j == 1) vocab.floorLogp else Double.NegativeInfinity
          }
          if (lp > Double.NegativeInfinity) {
            val s = score(j) + lp
            val np = pieces(j) + 1
            // deterministic: higher score > fewer pieces > longer last
            // piece (smaller j — seen first since j ascends)
            val take =
              if (score(i) == Double.NegativeInfinity) true
              else if (s != score(i)) s > score(i)
              else if (np != pieces(i)) np < pieces(i)
              else j < back(i)
            if (take) {
              score(i) = s
              pieces(i) = np
              back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    // walk back
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = n
    while (p > 0) { out += word.substring(back(p), p); p = back(p) }
    out.reverseIterator.toArray
  }

  /** Candidate pool: every substring (length ≤ maxLen) of every distinct
    * word, weighted by word frequency, top `poolSize` by (freq desc,
    * piece) PLUS every single character (coverage guarantee). Returns
    * (piece, freq) rows. */
  def candidates(docs: DataFrame, textCol: String, poolSize: Int,
      maxLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Bpe.wordFreq(docs, textCol).as[(String, Long)]
    val subs = words.flatMap { case (w, cnt) =>
      val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxLen && i + l <= w.length) {
          out += ((w.substring(i, i + l), cnt))
          l += 1
        }
        i += 1
      }
      out
    }.toDF("piece", "f").groupBy("piece").agg(sum(col("f")).as("freq"))
    val chars = subs.filter(length(col("piece")) === 1)
    val top = subs
      .orderBy(desc("freq"), col("piece")).limit(poolSize)
    top.unionByName(chars).groupBy("piece").agg(max(col("freq")).as("freq"))
  }

  /** Train: frequency-seeded probabilities over the candidate pool, then
    * `emRounds` fixed EM rounds (E: Viterbi-segment the distinct-word
    * table under the current vocab, usage-weighted by word count;
    * M: re-normalize). Pieces that fall to zero usage keep a floor so
    * the vocab size is stable. Returns the fitted Vocab sidecar. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxLen: Int = 6, emRounds: Int = 2): Vocab = {
    require(vocabSize >= 1 && emRounds >= 0, "bad vocabSize/emRounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val cand = candidates(docs, textCol, vocabSize, maxLen)
      .as[(String, Long)].collect() // poolSize + alphabet — a sidecar
    val total0 = cand.map(_._2).sum.toDouble
    var vocab = Vocab(
      cand.map { case (p, f) => p -> math.log(f / total0) }.toMap,
      floorLogp = math.log(0.5 / total0))
    val words = Bpe.wordFreq(docs, textCol).as[(String, Long)]
    for (_ <- 1 to emRounds) {
      val v = vocab
      val ml = maxLen
      val usage = words.flatMap { case (w, cnt) =>
          segmentWord(w, v, ml).iterator.map(p => (p, cnt))
        }.toDF("piece", "u").groupBy("piece").agg(sum(col("u")).as("usage"))
        .as[(String, Long)].collect().toMap
      val totalU = math.max(usage.values.sum.toDouble, 1.0)
      vocab = Vocab(
        vocab.logp.map { case (p, _) =>
          p -> math.log(math.max(usage.getOrElse(p, 0L).toDouble, 0.5)
            / totalU)
        },
        floorLogp = math.log(0.5 / totalU))
    }
    vocab
  }

  /** Segment every document: (doc_id, word_pos, piece_pos, piece) —
    * the vocab rides the closure; one corpus pass. */
  def segment(docs: DataFrame, idCol: String, textCol: String,
      vocab: Vocab, maxLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val words = (if (t == null) "" else t)
          .toLowerCase(java.util.Locale.ROOT).split("\\s+")
          .filter(_.nonEmpty)
        words.iterator.zipWithIndex.flatMap { case (w, wi) =>
          segmentWord(w, vocab, maxLen).iterator.zipWithIndex.map {
            case (p, pi) => (id, wi, pi, p)
          }
        }
      })
      .toDF("doc_id", "word_pos", "piece_pos", "piece")
  }
}
