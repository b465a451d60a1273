package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact isotonic regression (pool-adjacent-violators; Barlow et al.
  * 1972) — the calibration step a production quality classifier needs
  * between "score" and "probability": the monotone step function
  * minimizing squared error to the empirical labels. The standard
  * calibration choice when score→label reliability is non-linear
  * (Zadrozny & Elkan 2002), complementing [[Classifier]] (which
  * produces the scores) and the threshold gates that consume them.
  *
  * Scale shape: the only corpus-sized job is ONE map-side-combinable
  * aggregation to the per-distinct-score (n, n_pos) table; PAV runs
  * driver-side on that table, which is BOUNDED by the score grid, not
  * the corpus — callers quantize the score (the [[Quantiles]]
  * cutpoint discipline), and `fit` fails loudly past 100k distinct
  * scores rather than silently collecting data. Applying the fitted
  * step function broadcasts the (score, fitted) table as a closure
  * array + per-row binary search — no shuffle.
  *
  * Exactness: labels are {0,1} and pooling decisions compare block
  * means p₁/q₁ vs p₂/q₂ by BigInt cross-multiplication — no fp in any
  * DECISION, at any corpus size. Each emitted `fitted` value is one
  * IEEE division of the pooled (n_pos, n) integers, so the DuckDB
  * oracle replaying the closed-form minimax characterization
  * fitted(i) = max_{j≤i} min_{k≥i} mean(y[j..k]) computes the SAME
  * double: distinct rationals with denominators ≤ ~6×10⁷ are separated
  * by ≥ 1/q² ≫ double ulp, so correctly-rounded doubles preserve the
  * rational order and the minimax selects the same pooled block. */
object Isotonic {

  /** One PAV block: [lo, hi] group-index range, pooled label sum and
    * count. Mean comparisons are exact (BigInt cross-mult). */
  private final case class Block(lo: Int, hi: Int, pos: Long, n: Long) {
    def meanGreaterOrEqual(that: Block): Boolean =
      BigInt(pos) * that.n >= BigInt(that.pos) * n
  }

  /** Driver-side PAV over (n, n_pos) groups in ascending-score order:
    * returns the fitted mean per group. Pooling on ≥ (merging
    * equal-mean neighbors is value-neutral; strict violations must
    * merge for monotonicity). */
  private[graft] def pav(groups: Array[(Long, Long)]): Array[Double] = {
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    var i = 0
    while (i < groups.length) {
      val (n, pos) = groups(i)
      var cur = Block(i, i, pos, n)
      while (stack.nonEmpty && stack.last.meanGreaterOrEqual(cur)) {
        val prev = stack.remove(stack.length - 1)
        cur = Block(prev.lo, cur.hi, prev.pos + cur.pos, prev.n + cur.n)
      }
      stack += cur
      i += 1
    }
    val out = new Array[Double](groups.length)
    stack.foreach { b =>
      val m = b.pos.toDouble / b.n.toDouble
      var j = b.lo
      while (j <= b.hi) { out(j) = m; j += 1 }
    }
    out
  }

  /** Fit the isotonic step function: (score, n, n_pos, fitted), one
    * row per distinct score, `fitted` monotone non-decreasing in
    * score. Labels must be 0/1 (fails loudly otherwise — a label that
    * failed to compute must not silently skew the calibration). */
  def fit(df: DataFrame, scoreCol: Column, labelCol: Column,
      maxGroups: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val checked = when(labelCol.isin(0, 1), labelCol.cast("long"))
      .otherwise(raise_error(concat(lit("Isotonic.fit: label must be " +
        "0 or 1, got "), coalesce(labelCol.cast("string"), lit("NULL")))))
    // a null score would silently decode to 0.0 in the typed collect,
    // and NaN would form its own group that sorts after every real
    // score — fail loudly on both (same discipline as the label check)
    val castScore = scoreCol.cast("double")
    val checkedScore = when(castScore.isNotNull && !isnan(castScore),
        castScore)
      .otherwise(raise_error(
        lit("Isotonic.fit: score must not be NULL or NaN")))
    // limit(maxGroups + 1): the cardinality guard must fire BEFORE the
    // collect moves rows — an over-limit fit pulls maxGroups+1 rows to
    // the driver and fails, never the full distinct-score set
    val grouped = df
      .select(checkedScore.as("score"), checked.as("y"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .orderBy(col("score"))
      .limit(maxGroups + 1)
      .as[(Double, Long, Long)]
      .collect()
    require(grouped.length <= maxGroups,
      s"Isotonic.fit: more than $maxGroups distinct scores — " +
        "quantize the score column first")
    val fitted = pav(grouped.map { case (_, n, pos) => (n, pos) })
    spark.createDataFrame(
      grouped.zip(fitted).map { case ((s0, n, pos), f) => (s0, n, pos, f) }
        .toIndexedSeq)
      .toDF("score", "n", "n_pos", "fitted")
  }

  /** Apply a fitted step function: each row gets the fitted value of
    * the GREATEST fit score ≤ its score (scores below the fit range
    * clamp to the first block — the standard step-function extension).
    * The fit table broadcasts as a closure array (score-grid sized);
    * per-row binary search, no shuffle. Null AND NaN scores → null —
    * inference-side inputs may be dirty, but a NaN must not silently
    * take the first block's value (every comparison against NaN is
    * false, which would otherwise route it there). */
  def calibrate(df: DataFrame, fit: DataFrame, scoreCol: Column,
      outCol: String = "calibrated"): DataFrame = {
    val table = fit.select(col("score").cast("double"),
        col("fitted").cast("double"))
      .orderBy(col("score"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    require(table.nonEmpty, "Isotonic.calibrate: empty fit table")
    val scores = table.map(_._1)
    val fits = table.map(_._2)
    val lookup = udf((s: java.lang.Double) =>
      if (s == null || s.isNaN) null
      else {
        var lo = 0
        var hi = scores.length - 1
        if (s < scores(0)) java.lang.Double.valueOf(fits(0))
        else {
          while (lo < hi) {
            val mid = (lo + hi + 1) >>> 1
            if (scores(mid) <= s) lo = mid else hi = mid - 1
          }
          java.lang.Double.valueOf(fits(lo))
        }
      })
    df.withColumn(outCol, lookup(scoreCol.cast("double")))
  }
}
