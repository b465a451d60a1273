package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile-bucket scoring WITHOUT a global sort — the 100 TB form of
  * `ntile(k)` (the gate-form `a_rfm` query documents this as its
  * production path).
  *
  * `ntile(k)` moves every row through one partition. Here the data never
  * globally sorts: the ceil(p·n)-th order statistics (p = 1/k … (k−1)/k)
  * come from the DISTINCT-VALUE histogram — one map-side-combinable
  * groupBy, a cumulative window over the distinct-value frame (bounded by
  * the value domain, not the row count), and a k−1-element cutpoint array
  * broadcast back to score each row by comparison. Scores are
  * retry-deterministic and tie-stable: equal values ALWAYS land in the
  * same bucket (ntile splits boundary ties by sort position), which is
  * the property a reproducible curation pipeline actually wants.
  *
  * Exact, not approximate: the cutpoints are true order statistics. An
  * `approxQuantile`-based variant would trade the distinct-value shuffle
  * for a sketch; this form is preferred while the histogram is far
  * smaller than the data (integer-ish domains — days, counts, cents). */
object Quantiles {

  /** One scoring dimension: bucket by `valueCol` into `k` buckets,
    * emitting `scoreCol`; `ascending` = false gives bucket 1 to the
    * LARGEST values (the "top quartile first" RFM convention). */
  case class Dim(valueCol: String, k: Int, scoreCol: String,
      ascending: Boolean = true)

  /** Adds one score column ∈ [1, k] per dimension in a SINGLE pass over
    * `df`: score = 1 + |{cutpoints c : v > c}| with v the (possibly
    * negated) value. All dimensions' cutpoint rows broadcast-join at
    * once, so `df` is consumed dims+1 times total — NOT re-embedded per
    * dimension, which would double the upstream plan at every level
    * (chaining three single-dim calls put 13 copies of the base
    * aggregation in one plan; this form keeps it at 4). */
  def cutpointScoresMulti(df: DataFrame, dims: Seq[Dim]): DataFrame = {
    require(dims.nonEmpty, "at least one dimension")
    require(dims.map(_.scoreCol).distinct.size == dims.size,
      "score column names must be distinct")
    def v(d: Dim): Column = {
      // a NULL value would silently score bucket 1 AND shift every
      // cutpoint (the null group counts into the cumulative histogram,
      // ordered first) — corrupted order statistics with no error
      val base = col(d.valueCol).cast("double")
      val chk = when(base.isNotNull, base).otherwise(raise_error(
        lit(s"cutpointScores: NULL or non-numeric ${d.valueCol}")))
      if (d.ascending) chk else -chk
    }
    val cutRows = dims.map { d =>
      require(d.k >= 2, s"k must be >= 2, got ${d.k} for ${d.scoreCol}")
      val hist = df.select(v(d).as("_v")).groupBy(col("_v"))
        .agg(count(lit(1)).as("_c"))
      // cumulative counts over the DISTINCT-VALUE frame — global window
      // by construction (it computes global order statistics), bounded
      // by the value domain; allowlisted in GlobalWindowSpec.
      // The grand total rides a SECOND frame over the same ordered
      // histogram (r16; the classifier_conformal_audit cum+total
      // pattern) instead of a separate `hist.agg(sum)` branch — the
      // aggregate branch re-evaluated the ENTIRE upstream `df` plan a
      // second time per dimension (Catalyst recomputes shared subtrees
      // per consumer), which for callers whose input is an expensive
      // chain (docs_ccnet_buckets: the full stupid-backoff scorer)
      // doubled the dominant cost. Both frames are histogram-bounded.
      val w = Window.orderBy(col("_v"))
      val cum = hist
        .withColumn("_cum", sum(col("_c")).over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
        .withColumn("_n", sum(col("_c")).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      cum
        .select(explode(array((1 until d.k).map(lit): _*)).as("_p"),
          col("_v"), col("_cum"), col("_n"))
        .filter(col("_cum") >= ceil(col("_p") * col("_n") / lit(d.k)))
        .groupBy(col("_p")).agg(min(col("_v")).as("_cut"))
        // cut_p is nondecreasing in p, so sorting by VALUE recovers the
        // p-order without shipping p
        .agg(array_sort(collect_list(col("_cut")))
          .as(s"_cuts_${d.scoreCol}"))
    }
    val joined = cutRows.foldLeft(df)((acc, cr) => acc.crossJoin(broadcast(cr)))
    val scored = dims.foldLeft(joined) { (acc, d) =>
      acc.withColumn(d.scoreCol,
        (lit(1) + size(filter(col(s"_cuts_${d.scoreCol}"),
          c => v(d) > c))).cast("int"))
    }
    dims.foldLeft(scored)((acc, d) => acc.drop(s"_cuts_${d.scoreCol}"))
  }

  /** Single-dimension convenience form of [[cutpointScoresMulti]]. */
  def cutpointScores(df: DataFrame, valueCol: String, k: Int,
      scoreCol: String, ascending: Boolean = true): DataFrame =
    cutpointScoresMulti(df, Seq(Dim(valueCol, k, scoreCol, ascending)))
}
