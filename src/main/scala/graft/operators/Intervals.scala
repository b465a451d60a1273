package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  /** One shared bin function for the replication AND the attribution
    * predicates — they must stay bit-identical or the exactly-once
    * invariant silently breaks. */
  private def binOf(c: Column, binWidth: Long): Column =
    floor(c / binWidth).cast("long")

  /** Replicate each interval row to the bins it touches:
    * (k, id, s, e, bin). Malformed rows (null bounds, inverted interval,
    * or one spanning more than `maxBinsPerRow` bins — a sentinel end
    * date, a binWidth far below the data's granularity) raise with the
    * offending id: a 420k-element bin array per row is a job-killer the
    * theta-join semantics never implied. */
  private def binned(df: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String, binWidth: Long,
      maxBinsPerRow: Int, what: String): DataFrame = {
    val wellFormed = col("s") <= col("e") &&
      binOf(col("e"), binWidth) - binOf(col("s"), binWidth) <
        lit(maxBinsPerRow.toLong)
    df.select(col(keyCol).as("k"), col(idCol).as("id"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .withColumn("bin",
        // wellFormed is NULL (not false) for null bounds — the otherwise
        // branch catches that too, and the message says so; coalesce keeps
        // the diagnostic when the id itself is null.
        explode(when(wellFormed,
            sequence(binOf(col("s"), binWidth), binOf(col("e"), binWidth)))
          .otherwise(raise_error(concat(
            lit(s"$what: null bounds, inverted interval, or > " +
              s"$maxBinsPerRow bins for id "),
            coalesce(col("id").cast("string"), lit("NULL")))))))
  }

  /** Overlapping pairs WITHIN each `keyCol` group of one interval table:
    * (key, id_a, id_b) for every a < b whose [start, end] intervals
    * intersect (closed ends). `startCol`/`endCol` must be numeric (cast
    * dates to epoch days first); `binWidth` is in those units. Malformed
    * rows fail loudly (see `binned`). */
  def overlapSelfJoin(df: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String, binWidth: Long,
      maxBinsPerRow: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerRow > 0, "maxBinsPerRow must be positive")
    val b = binned(df, keyCol, idCol, startCol, endCol, binWidth,
      maxBinsPerRow, "overlapSelfJoin")
    b.as("a").join(b.as("b"),
        col("a.k") === col("b.k") && col("a.bin") === col("b.bin") &&
        col("a.id") < col("b.id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e") &&
        // exactly-once attribution: only the bin containing the later
        // start emits the pair (both rows replicate into it by overlap)
        col("a.bin") === binOf(greatest(col("a.s"), col("b.s")), binWidth))
      .select(col("a.k").as(keyCol), col("a.id").as("id_a"),
        col("b.id").as("id_b"))
  }

  /** Two-table form: overlapping (left_id, right_id) pairs within each
    * key — the stream-vs-stream / bookings-vs-outages shape. Same
    * binning, same exactly-once later-start attribution (it never
    * depended on both rows coming from one table), no id ordering
    * constraint because the sides are distinct. */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftId: String, rightId: String, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerRow: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerRow > 0, "maxBinsPerRow must be positive")
    val a = binned(left, keyCol, leftId, startCol, endCol, binWidth,
      maxBinsPerRow, "overlapJoin")
    val b = binned(right, keyCol, rightId, startCol, endCol, binWidth,
      maxBinsPerRow, "overlapJoin")
    a.as("a").join(b.as("b"),
        col("a.k") === col("b.k") && col("a.bin") === col("b.bin") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e") &&
        col("a.bin") === binOf(greatest(col("a.s"), col("b.s")), binWidth))
      .select(col("a.k").as(keyCol), col("a.id").as("left_id"),
        col("b.id").as("right_id"))
  }

  /** Gaps-and-islands merge: collapse each key's overlapping-or-touching
    * CLOSED intervals [start,end] into maximal disjoint islands. A row
    * starts a new island iff its start exceeds the running max end of all
    * earlier rows (ordered by start, then end) — so [1,5],[5,9] join
    * (touching endpoints) and [1,5],[6,9] stay apart. ONE exchange + sort
    * per key serves the break detection, the island numbering, and the
    * downstream rollup; no self-join, no binning — the canonical Spark
    * shape for per-key sequential state, linear in each key's row count.
    *
    * Columns must be integral (epoch seconds/micros — exact arithmetic);
    * a null-bounded or inverted (end < start) row fails the job loudly
    * with its key in the message — a silent merge over garbage intervals
    * would corrupt every downstream island. Output: keyCol +
    * `island_id` (1-based per key, in start order) + `island_start` +
    * `island_end` + `n_rows`. */
  def mergeIslands(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    // the guard rides the USED column (a dropped sentinel column would be
    // dead-code-eliminated with the raise_error inside it); wellFormed is
    // NULL (not false) for null bounds — the otherwise branch catches that
    val wellFormed = col(startCol).isNotNull && col(endCol).isNotNull &&
      col(startCol) <= col(endCol)
    val breaks = when(wellFormed,
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .otherwise(raise_error(concat(
        lit("mergeIslands: null bounds or inverted interval for key "),
        coalesce(col(keyCol).cast("string"), lit("NULL")))))
    df.withColumn("_brk", breaks)
      .withColumn("island_id", sum(col("_brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island_id"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-key union-coverage rollup over [[mergeIslands]]: how much of the
    * timeline each key's intervals actually cover once overlaps collapse
    * — n_islands, covered = Σ(island_end − island_start), and the longest
    * island. The dedup-aware complement of a naive Σ(end−start). */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame =
    mergeIslands(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered"),
        max(col("island_end") - col("island_start")).as("max_island"))
}
