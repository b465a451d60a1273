package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap joins via temporal binning — the scale-safe form of a
  * range theta-join. A naive `a.start <= b.end AND b.start <= a.end` join
  * has no equi-key, so Spark plans a broadcast-nested-loop (cartesian at
  * corpus scale). Binning gives it one: each interval replicates to the
  * fixed-width bins it touches, candidates join on (key, bin), and each
  * overlapping pair is attributed to exactly ONE bin — the bin of the
  * later start — so no dedup shuffle is needed afterwards.
  *
  * Cost model: replication factor = interval_length / binWidth + 1; pick
  * binWidth near the typical interval length so candidates stay local and
  * replication stays O(1) per row. Within a (key, bin) cell the candidate
  * check is exact, so the result equals the theta-join's. */
object Intervals {

  /** Overlapping pairs WITHIN each `keyCol` group of one interval table:
    * (key, id_a, id_b) for every a < b whose [start, end] intervals
    * intersect (closed ends). `startCol`/`endCol` must be numeric (cast
    * dates to epoch days first); `binWidth` is in those units.
    *
    * Malformed rows FAIL the query instead of corrupting it: an inverted
    * interval (start > end) or one spanning more than `maxBinsPerRow`
    * bins (a sentinel end date, a binWidth far below the data's
    * granularity) raises with the offending id — a 420k-element bin
    * array per row is a job-killer the theta-join semantics never
    * implied. */
  def overlapSelfJoin(df: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String, binWidth: Long,
      maxBinsPerRow: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerRow > 0, "maxBinsPerRow must be positive")
    val binOf = (c: Column) => floor(c / binWidth).cast("long")
    val wellFormed = col("s") <= col("e") &&
      binOf(col("e")) - binOf(col("s")) < lit(maxBinsPerRow.toLong)
    val b = df.select(col(keyCol).as("k"), col(idCol).as("id"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .withColumn("bin",
        // wellFormed is NULL (not false) for null bounds — the otherwise
        // branch catches that too, and the message says so; coalesce keeps
        // the diagnostic when the id itself is null.
        explode(when(wellFormed, sequence(binOf(col("s")), binOf(col("e"))))
          .otherwise(raise_error(concat(
            lit("overlapSelfJoin: null bounds, inverted interval, or > " +
              s"$maxBinsPerRow bins for id "),
            coalesce(col("id").cast("string"), lit("NULL")))))))
    b.as("a").join(b.as("b"),
        col("a.k") === col("b.k") && col("a.bin") === col("b.bin") &&
        col("a.id") < col("b.id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e") &&
        // exactly-once attribution: only the bin containing the later
        // start emits the pair (both rows replicate into it by overlap)
        col("a.bin") === binOf(greatest(col("a.s"), col("b.s"))))
      .select(col("a.k").as(keyCol), col("a.id").as("id_a"),
        col("b.id").as("id_b"))
  }
}
