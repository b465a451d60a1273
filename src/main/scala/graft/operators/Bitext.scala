package graft.operators

import graft.functions.VectorFunctions.cosineSimilarity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019, the
  * LASER/CCMatrix parallel-corpus construction recipe): a source/target
  * embedding pair is a translation candidate when its cosine stands out
  * against BOTH sides' typical neighborhoods —
  * margin(x, y) = cos(x, y) / ((avgₖNN(x) + avgₖNN(y)) / 2) —
  * which suppresses hubs that score high against everything. The
  * training-data op that mines aligned pairs out of two monolingual
  * corpora.
  *
  * Exactness discipline: cosines quantize to integer micro-units
  * in-plan (ONE round per pair); per-side k-NN sums are exact BIGINTs;
  * the margin is a single division of two exact integers —
  * 2k·cosµ(x,y) / (Σₖxµ + Σₖyµ) — so the emitted double and the
  * threshold comparison are identical on any engine replaying the same
  * integers.
  *
  * Scale shape: this is the exact all-pairs form (candidate generation
  * at 100 TB goes through the IVF/LSH candidate paths —
  * [[IvfIndex]]/[[Dedup]] — exactly like the other similarity
  * operators; the margin formula is unchanged, only the candidate set
  * shrinks). The two k-NN sums are per-side window ranks over the pair
  * table; every stage is keyed by src or tgt id, ids+integers only in
  * the shuffles. */
object Bitext {

  /** The full margin table: (sid, tid, cos_micro, margin) for every
    * cross pair — shared by the threshold and mutual-argmax miners. */
  private def marginTable(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val s = src.select(col(idCol).cast("long").as("sid"),
      col(vecCol).as("sv"))
    val t = tgt.select(col(idCol).cast("long").as("tid"),
      col(vecCol).as("tv"))
    val pairs = s.crossJoin(t)
      .select(col("sid"), col("tid"),
        round(cosineSimilarity(col("sv"), col("tv")) * 1000000)
          .cast("long").as("cos_micro"))
    val wx = Window.partitionBy(col("sid"))
      .orderBy(desc("cos_micro"), col("tid"))
    val wy = Window.partitionBy(col("tid"))
      .orderBy(desc("cos_micro"), col("sid"))
    val kx = pairs.withColumn("rk", row_number().over(wx))
      .filter(col("rk") <= k)
      .groupBy(col("sid")).agg(sum(col("cos_micro")).as("sx"))
    val ky = pairs.withColumn("rk", row_number().over(wy))
      .filter(col("rk") <= k)
      .groupBy(col("tid")).agg(sum(col("cos_micro")).as("sy"))
    pairs
      .join(kx, "sid").join(ky, "tid")
      .withColumn("margin",
        (col("cos_micro") * (2L * k)).cast("double") /
          (col("sx") + col("sy")))
  }

  /** All (src, tgt) pairs with margin > `minMargin`, with the
    * micro-unit cosine and the exact-integer-derived margin.
    * Output: (src_id, tgt_id, cos_micro, margin). */
  def marginPairs(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.2): DataFrame =
    marginTable(src, tgt, idCol, vecCol, k)
      .filter(col("margin") > minMargin)
      .select(col("sid").as("src_id"), col("tid").as("tgt_id"),
        col("cos_micro"), col("margin"))

  /** Mutual-argmax mining (the CCMatrix selection rule): keep (x, y)
    * iff y is x's best margin AND x is y's best margin — the
    * high-precision form, one candidate per aligned sentence instead
    * of a threshold cloud. Argmax ordering is (margin DESC, id):
    * margins are identical doubles on any engine replaying the same
    * integers (single-division argument above), so the argmax — and
    * therefore the mined set — is engine-independent even at fp
    * near-ties; exactly-equal margins break by id. */
  /** The SCALE form: candidates restricted to (src, tgt) pairs sharing
    * an IVF cell — centroids fit on the UNION of both corpora so the
    * cell structure is shared, the cross join is per-cell (Σ cellₛ·cellₜ
    * instead of |S|·|T|), and margins compute over CANDIDATE
    * neighborhoods. The bias is one-directional IN THE MINING REGIME
    * (cos > 0 and positive neighborhood sums — every margin above any
    * threshold ≥ 1 lives there): candidate k-NN sums are subsets of the
    * exact sums (a full-set top-k maximizes the sum over any superset),
    * so the denominator only shrinks and a candidate margin is ≥ its
    * exact margin — an exact-mined pair whose cell co-locates it is
    * candidate-mined, never silently lost. (For NEGATIVE cosines the
    * direction inverts — irrelevant to mining, but the
    * `emb_bitext_cells_audit` scopes its invariants to the positive
    * regime for exactly this reason.) Same output contract as
    * [[marginPairs]]. */
  def marginPairsCells(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.2,
      ncells: Int = 16, seed: Long = 42L): DataFrame = {
    val union = src.select(col(idCol), col(vecCol))
      .unionByName(tgt.select(col(idCol), col(vecCol)))
    val centroids = SimilaritySearch.computeCentroids(union, vecCol,
      ncells, seed)
    val s = SimilaritySearch.assignCells(src, idCol, vecCol, centroids)
      .select(col(idCol).cast("long").as("sid"), col("v").as("sv"),
        col("cell"))
    val t = SimilaritySearch.assignCells(tgt, idCol, vecCol, centroids)
      .select(col(idCol).cast("long").as("tid"), col("v").as("tv"),
        col("cell"))
    val pairs = s.join(t, "cell")
      .select(col("sid"), col("tid"),
        round(cosineSimilarity(col("sv"), col("tv")) * 1000000)
          .cast("long").as("cos_micro"))
    val wx = Window.partitionBy(col("sid"))
      .orderBy(desc("cos_micro"), col("tid"))
    val wy = Window.partitionBy(col("tid"))
      .orderBy(desc("cos_micro"), col("sid"))
    val kx = pairs.withColumn("rk", row_number().over(wx))
      .filter(col("rk") <= k)
      .groupBy(col("sid")).agg(sum(col("cos_micro")).as("sx"))
    val ky = pairs.withColumn("rk", row_number().over(wy))
      .filter(col("rk") <= k)
      .groupBy(col("tid")).agg(sum(col("cos_micro")).as("sy"))
    pairs
      .join(kx, "sid").join(ky, "tid")
      .withColumn("margin",
        (col("cos_micro") * (2L * k)).cast("double") /
          (col("sx") + col("sy")))
      .filter(col("margin") > minMargin)
      .select(col("sid").as("src_id"), col("tid").as("tgt_id"),
        col("cos_micro"), col("margin"))
  }

  def mutualTopPairs(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4): DataFrame = {
    val m = marginTable(src, tgt, idCol, vecCol, k)
    val bestT = m.withColumn("rk", row_number().over(
        Window.partitionBy(col("sid"))
          .orderBy(desc("margin"), col("tid"))))
      .filter(col("rk") === 1).select(col("sid"), col("tid"))
    val bestS = m.withColumn("rk", row_number().over(
        Window.partitionBy(col("tid"))
          .orderBy(desc("margin"), col("sid"))))
      .filter(col("rk") === 1).select(col("sid"), col("tid"))
    m.join(bestT, Seq("sid", "tid"))
      .join(bestS, Seq("sid", "tid"))
      .select(col("sid").as("src_id"), col("tid").as("tgt_id"),
        col("cos_micro"), col("margin"))
  }
}
