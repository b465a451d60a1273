package graft.operators

import org.apache.spark.sql.DataFrame
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
}
