package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension standardization (z-scoring) of an embedding corpus —
  * the feature-normalization step before distance-based work when
  * dimensions carry different scales (whitening's cheap diagonal
  * cousin; also the input conditioning k-means and logistic layers
  * prefer).
  *
  * Determinism at scale, without ordered folds: every corpus-sized SUM
  * here is an INTEGER sum. Values are quantized to micro units
  * (round(x·10⁶) as long — Spark's HALF_UP and an oracle's
  * half-away-from-zero agree on doubles), then per-dimension Σx and
  * Σx² accumulate as long / decimal(38,0): associative, commutative,
  * overflow-proof (Σx² at 10¹¹ rows × 10¹² per element ≈ 10²³ ≪ 10³⁸),
  * so shuffle order, partitioning, and retries can never change a bit —
  * the [[Drift]]/[[Dsir]] integer-statistics pattern. Floating point
  * re-enters only in the final per-element formula, a fixed expression
  * tree over exact integers that every engine evaluates identically.
  *
  * Scale: one narrow posexplode pass → a dim-sized map-side-combinable
  * aggregation → broadcast of the dim-row stats table back onto a
  * second narrow pass. No corpus-sized shuffle, no per-key lists. */
object Standardize {

  private val Micro = 1000000L

  /** Per-dimension exact integer statistics: (pos, n, sum_micro,
    * sumsq_micro2). `sumsq_micro2` is in micro² units as decimal(38,0). */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .select(col("pos"),
        round(col("x") * lit(Micro), 0).cast("long").as("xm"))
      .select(col("pos"), col("xm"), (col("xm") * col("xm")).as("xm2"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(col("xm")).as("sum_micro"),
        sum(col("xm2").cast("decimal(38,0)")).as("sumsq_micro2"))

  /** Z-score every element against its dimension's corpus statistics:
    * z = (xₘ − μₘ) / σₘ with μ, σ (population) in micro units derived
    * from the exact integer sums. Dimensions with zero variance yield
    * z = 0 (a constant dimension carries no signal — emitting 0 beats
    * NaN-poisoning downstream dot products). Output: (idCol, pos, z)
    * rounded to `decimals`. */
  def zScores(df: DataFrame, idCol: String, vecCol: String,
      decimals: Int = 4): DataFrame = {
    val stats = dimStats(df, vecCol)
      .select(col("pos"),
        (col("sum_micro").cast("double") / col("n")).as("mu_m"),
        (col("sumsq_micro2").cast("double") / col("n")).as("ex2_m"),
        col("n"))
      .withColumn("var_m", col("ex2_m") - col("mu_m") * col("mu_m"))
      .select(col("pos"), col("mu_m"),
        when(col("var_m") > 0, sqrt(col("var_m"))).otherwise(lit(0.0))
          .as("sd_m"))
    val exploded = df
      .select(col(idCol), posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .select(col(idCol), col("pos"),
        round(col("x") * lit(Micro), 0).cast("long").as("xm"))
    exploded.join(broadcast(stats), Seq("pos"))
      .select(col(idCol), col("pos"),
        round(when(col("sd_m") > 0,
          (col("xm").cast("double") - col("mu_m")) / col("sd_m"))
          .otherwise(lit(0.0)), decimals).as("z"))
  }
}
