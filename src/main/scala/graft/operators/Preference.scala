package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-data construction — the RLHF/DPO curation step that turns
  * scored candidates into training pairs, and the annotator-aggregation
  * step that turns redundant labels into one consensus label. Both are
  * single keyed-window / keyed-aggregation shapes: group cardinality
  * bounds every intermediate, nothing converges on the driver.
  */
object Preference {

  /** DPO-style preference pairs: within each group (prompt), pair the
    * rank-i best candidate with the rank-i worst (i = 1..maxPairs) —
    * the max-margin pairing a preference-tuning curriculum wants first.
    * Candidates order by (score desc, id) / (score asc, id); a pair is
    * emitted only while chosen.score > rejected.score AND the two ends
    * are distinct rows — equal-score pairs carry no preference signal
    * and the middle element of an odd group would otherwise pair with
    * itself.
    *
    * Scale shape: two rank windows over the SAME group partitioning
    * (one exchange, two sorts) + one group-and-rank equi-join between
    * frames already pruned to rank ≤ maxPairs by WindowGroupLimit.
    * Output: (group, pair_rank, chosen_id, rejected_id, margin). */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, maxPairs: Int = 3, decimals: Int = 4): DataFrame = {
    require(maxPairs >= 1, "maxPairs must be >= 1")
    val s = col(scoreCol).cast("double")
    val wBest = Window.partitionBy(col(groupCol))
      .orderBy(col("_s").desc, col(idCol))
    val wWorst = Window.partitionBy(col(groupCol))
      .orderBy(col("_s").asc, col(idCol))
    val best = df.select(col(groupCol), col(idCol), s.as("_s"))
      .withColumn("_rk", row_number().over(wBest))
      .filter(col("_rk") <= maxPairs)
      .select(col(groupCol), col("_rk").as("pair_rank"),
        col(idCol).as("chosen_id"), col("_s").as("_cs"))
    val worst = df.select(col(groupCol), col(idCol), s.as("_s"))
      .withColumn("_rk", row_number().over(wWorst))
      .filter(col("_rk") <= maxPairs)
      .select(col(groupCol), col("_rk").as("pair_rank"),
        col(idCol).as("rejected_id"), col("_s").as("_rs"))
    best.join(worst, Seq(groupCol, "pair_rank"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("_cs") > col("_rs"))
      .select(col(groupCol), col("pair_rank"), col("chosen_id"),
        col("rejected_id"), round(col("_cs") - col("_rs"), decimals)
          .as("margin"))
  }

  /** Majority-vote label aggregation with agreement: per item, the most
    * frequent label (ties → lexicographically smallest label, so
    * consensus is deterministic), its vote count, the total votes, and
    * agreement = votes/total — the inter-annotator-consensus step of
    * any labeling pipeline, and the quality gate (low agreement = route
    * back to annotators).
    *
    * Scale shape: one map-side-combinable (item, label) count, one
    * item-keyed rank window over label-cardinality rows. Output:
    * (item, label, votes, total, agreement). */
  def majorityVote(votes: DataFrame, itemCol: String, labelCol: String,
      decimals: Int = 4): DataFrame = {
    val counts = votes.groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col(itemCol))
      .orderBy(col("votes").desc, col(labelCol))
    val wt = Window.partitionBy(col(itemCol))
    counts
      .withColumn("total", sum(col("votes")).over(wt))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col(itemCol), col(labelCol), col("votes"), col("total"),
        round(col("votes").cast("double") / col("total"), decimals)
          .as("agreement"))
  }

  /** Cohen's kappa between two raters — the inter-annotator-agreement
    * gate a labeling pipeline runs before trusting consensus labels:
    * κ = (p_o − p_e)/(1 − p_e), observed vs chance agreement. Per
    * (item, rater) the label is the majority vote (ties →
    * lexicographically smallest — [[majorityVote]]'s rule); only items
    * BOTH raters labeled count.
    *
    * Numerics: p_o and p_e derive from exact integer counts — p_e's
    * cross-marginal sum runs over Σ cA(l)·cB(l) in INTEGERS with one
    * final division, so no fp accumulation order exists anywhere; the
    * output is one fixed expression tree (oracle-exact). Degenerate
    * p_e = 1 (both raters constant and equal) → κ = 0 by convention.
    *
    * Scale: two keyed aggregations (map-side combinable) + a label-
    * cardinality marginal join — the corpus shuffles once by item. */
  def cohenKappa(votes: DataFrame, itemCol: String, raterCol: Column,
      labelCol: String, decimals: Int = 6): DataFrame = {
    val counts = votes
      .select(col(itemCol).as("item"), raterCol.as("rater"),
        col(labelCol).as("label"))
      .groupBy(col("item"), col("rater"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("item"), col("rater"))
      .orderBy(col("votes").desc, col("label"))
    val perRater = counts.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).select(col("item"), col("rater"),
        col("label"))
    val paired = perRater.groupBy(col("item"))
      .agg(count(lit(1)).as("nr"),
        min(when(col("rater"), col("label"))).as("la"),
        min(when(!col("rater"), col("label"))).as("lb"))
      .filter(col("nr") === 2)
    val agg = paired.agg(
      count(lit(1)).as("n_items"),
      sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_agree"))
    val marginals = paired.select(col("la").as("l")).groupBy("l")
      .agg(count(lit(1)).as("ca"))
      .join(paired.select(col("lb").as("l")).groupBy("l")
        .agg(count(lit(1)).as("cb")), Seq("l"), "full_outer")
      .agg(sum(coalesce(col("ca"), lit(0L)) *
        coalesce(col("cb"), lit(0L))).as("cross"))
    // empty-overlap convention (ADVICE r7 #5): with no item labeled by
    // BOTH raters, n_items = 0 and every ratio divides by zero — emit
    // the explicit degenerate row (n_items=0, po/pe/kappa = 0.0) instead
    // of nulls from a 0/0.
    agg.crossJoin(marginals)
      .select(col("n_items"), col("n_agree"),
        round(when(col("n_items") > 0,
          col("n_agree").cast("double") / col("n_items"))
          .otherwise(lit(0.0)), decimals).as("po"),
        round(when(col("n_items") > 0,
          col("cross").cast("double") /
            (col("n_items") * col("n_items")))
          .otherwise(lit(0.0)), decimals).as("pe"),
        (round(when(col("n_items") === 0, lit(0.0))
          .when(
            col("cross") === col("n_items") * col("n_items"), lit(0.0))
          .otherwise(
            (col("n_agree").cast("double") / col("n_items") -
              col("cross").cast("double") /
                (col("n_items") * col("n_items"))) /
            (lit(1.0) - col("cross").cast("double") /
              (col("n_items") * col("n_items")))), decimals) + lit(0.0))
          .as("kappa"))
  }
}
