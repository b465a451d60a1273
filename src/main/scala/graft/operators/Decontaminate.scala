package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data op that removes documents
  * sharing n-gram evidence with an evaluation set (the standard
  * "contamination check" every pretraining pipeline runs before training).
  *
  * Shape mirrors `Dedup.ngramJaccardPairs` but asymmetric: the corpus is
  * huge, the benchmark side is small — so the benchmark's distinct
  * shingles broadcast, and the corpus streams through ONE narrow
  * filter/join stage without shuffling its text anywhere. Overlap counts
  * shuffle (doc_id, 1) pairs only.
  */
object Decontaminate {

  private def shingleStream(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(graft.functions.Fingerprints.shingles(
        graft.functions.Fingerprints.tokens(col(textCol)), n)).as("sg"))

  /** (doc_id, n_overlap): corpus docs sharing at least `minOverlap`
    * DISTINCT n-grams with the benchmark set (any benchmark doc — the
    * union of benchmark shingles is the contamination vocabulary).
    *
    * The corpus side is NOT pre-deduplicated: a distinct before the join
    * would shuffle every corpus shingle; instead the broadcast join filters
    * first (only contamination-vocabulary hits survive — typically a tiny
    * fraction) and `countDistinct` dedups what remains. The only corpus
    * shuffle carries matched (id, shingle) pairs. */
  def overlaps(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3, minOverlap: Int = 5): DataFrame = {
    val corpusSh = shingleStream(corpus, idCol, textCol, n)
    // benchmark vocabulary: distinct shingles only — the small broadcast side.
    val benchSh = shingleStream(benchmark, benchIdCol, benchTextCol, n)
      .select(col("sg")).distinct()
    corpusSh.join(broadcast(benchSh), Seq("sg"))
      .groupBy(col("id").as(idCol))
      .agg(countDistinct(col("sg")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** The corpus minus contaminated documents (anti-join on the flagged
    * ids — ids only on the shuffle). */
  def removeContaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3, minOverlap: Int = 5): DataFrame =
    corpus.join(
      overlaps(corpus, idCol, textCol, benchmark, benchIdCol, benchTextCol,
        n, minOverlap).select(col(idCol)),
      Seq(idCol), "left_anti")
}
