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

  /** (id, sg) rows, one per DISTINCT shingle per document — a typed
    * mapPartitions kernel (PLANS.md lesson 7: corpus-pass analytics through
    * interpreted higher-order expressions degrade in a saturated JVM; the
    * kernel is scalac-compiled once). Per-doc distinct happens in-memory
    * here, shrinking the join input before anything moves. Tokenization
    * matches `Fingerprints.tokens`/`shingles` exactly (lowercase,
    * whitespace split, space-joined n-grams). */
  private def shingleStream(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Dedup.spread(df)
      .select(col(idCol).cast("long").as("id"),
        // named raise instead of a bare kernel NPE — a decontamination
        // DECISION over NULL text is undefined (the Dedup guard contract)
        Dedup.textOrRaise(col(textCol), "Decontaminate shingles").as("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (toks.length < n) Iterator.empty
        else toks.sliding(n).map(_.mkString(" ")).toSet.iterator
          .map((sg: String) => (id, sg))
      })
      .toDF("id", "sg")
  }

  /** (doc_id, n_overlap): corpus docs sharing at least `minOverlap`
    * DISTINCT n-grams with the benchmark set (any benchmark doc — the
    * union of benchmark shingles is the contamination vocabulary).
    *
    * The corpus side is never globally deduplicated — that distinct would
    * shuffle every corpus shingle. Per-DOC dedup happens in-memory inside
    * the shingle kernel (free), the broadcast join filters to
    * contamination-vocabulary hits (typically a tiny fraction), and the
    * only corpus shuffle carries matched (id, shingle) pairs into a
    * map-side-combinable count. */
  def overlaps(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 3, minOverlap: Int = 5): DataFrame = {
    val corpusSh = shingleStream(corpus, idCol, textCol, n)
    // benchmark vocabulary: distinct shingles only — the small broadcast side.
    val benchSh = shingleStream(benchmark, benchIdCol, benchTextCol, n)
      .select(col("sg")).distinct()
    corpusSh.join(broadcast(benchSh), Seq("sg"))
      // (id, sg) is unique by the kernel's per-doc distinct, so the
      // distinct-overlap count is a plain map-side-combinable count.
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_overlap"))
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

  /** SEMANTIC contamination: corpus vectors whose max cosine against ANY
    * benchmark vector reaches the threshold — catches paraphrased
    * benchmark leakage the n-gram form can't see. Returns
    * (idCol, max_cos) for flagged rows only.
    *
    * Scale shape: benchmark suites are small by nature, so their vectors
    * ride into the plan as literals and the max is a `greatest` chain of
    * codegen'd cosine expressions inside ONE narrow projection — no join,
    * no groupBy, no shuffle; the filter pushes into the scan stage. For
    * benchmark sets beyond the literal budget, route through the IVF
    * index instead. A corpus vector that scores null against every
    * benchmark vector (zero norm, dimension drift) FAILS the query
    * loudly — a malformed embedding must not pass a contamination gate
    * undecided. */
  def semanticOverlaps(corpus: DataFrame, idCol: String, vecCol: String,
      benchmark: DataFrame, benchVecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val benchVecs = benchmark
      .select(VectorFunctions.asDouble(col(benchVecCol)))
      .collect().map(_.getSeq[Double](0))
    require(benchVecs.nonEmpty, "benchmark set is empty")
    require(benchVecs.length <= 256,
      s"${benchVecs.length} benchmark vectors exceed the literal-expression " +
        "budget (256) — use the IVF index path for large benchmark sets")
    val cv = VectorFunctions.asDouble(col(vecCol))
    val scores = benchVecs.map(v =>
      VectorFunctions.cosineSimilarity(cv, typedLit(v)))
    val maxCos = scores.reduce((a, b) => greatest(a, b))
    corpus.select(col(idCol),
        coalesce(maxCos, raise_error(concat(
          lit("semanticOverlaps: vector scored null against every " +
            "benchmark vector (zero norm or dimension drift) for id "),
          coalesce(col(idCol).cast("string"), lit("NULL"))))).as("max_cos"))
      .filter(col("max_cos") >= threshold)
  }
}
