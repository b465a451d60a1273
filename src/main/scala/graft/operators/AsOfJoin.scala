package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, attach the latest right row with
  * right.ts <= left.ts (backward: the trades/quotes shape, "most recent
  * prior click for each purchase") or the earliest right row with
  * right.ts >= left.ts (forward: "next shipment after each order").
  *
  * Composed as union + keyed window rather than a non-equi join: rows from
  * both sides interleave in ONE shuffle partitioned by key and sorted by
  * (ts, side) — ascending for backward, descending for forward — and
  * `last(payload, ignoreNulls)` over the incremental unbounded-preceding
  * frame carries the matching right payload into each left row. No
  * BroadcastNestedLoopJoin, no per-row range probe — the plan is a single
  * exchange + window sort regardless of either side's size, which is the
  * only shape that survives both sides being large.
  *
  * Ties: a right row at exactly left.ts matches (inclusive, both
  * directions); callers must pre-deduplicate the right side to one row
  * per (key, ts) for deterministic output (as any as-of engine requires).
  */
object AsOfJoin {

  /** left: any columns incl. `keyCol`, `tsCol`; right: `keyCol`, `tsCol`,
    * `payloadCols`. Returns left columns + `{prefix}ts` + prefixed
    * payloads (null when no right row precedes). */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    asOf(left, right, keyCol, tsCol, payloadCols, prefix, forward = false)

  /** Forward variant: earliest right row with right.ts >= left.ts
    * (null when no right row follows). */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    asOf(left, right, keyCol, tsCol, payloadCols, prefix, forward = true)

  private def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], prefix: String,
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith(prefix)),
      s"left side already has $prefix-prefixed columns")
    // _ts/_side/_r_* are internal working names in the union frame; an
    // input column with one of those names would silently shadow them.
    val reserved = (c: String) => c == "_ts" || c == "_side" || c.startsWith("_r_")
    require(!leftCols.exists(reserved) && !right.columns.exists(reserved),
      "input columns may not be named _ts/_side or start with _r_ " +
        "(internal as-of working columns)")

    // Both directions use the SAME incremental preceding frame: forward
    // just traverses time DESCENDING, so "the latest previously-seen
    // right row" becomes "the earliest following right row". This
    // matters for performance, not just symmetry — Spark executes a
    // currentRow..unboundedFollowing aggregate frame by recomputing the
    // aggregate from scratch per output row (O(n²) per key), while the
    // unboundedPreceding..currentRow frame is incremental (O(n)).
    // Inclusive equal-ts match holds in both traversals because right
    // rows (side 0) sort before left rows (side 1).
    val (rightSide, leftSide) = (0, 1)
    val taggedRight = right.select(
      (Seq(col(keyCol), col(tsCol).as("_ts"), lit(rightSide).as("_side"),
        col(tsCol).as(s"_r_ts")) ++
        payloadCols.map(c => col(c).as(s"_r_$c")) ++
        leftCols.filterNot(c => c == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(keyCol), col(tsCol).as("_ts"), lit(leftSide).as("_side"),
        lit(null).cast(right.schema(tsCol).dataType).as(s"_r_ts")) ++
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"_r_$c")) ++
        leftCols.filterNot(c => c == keyCol).map(col)): _*)

    // desc_nulls_first: Spark's desc default is nulls LAST, which would
    // sort a null-ts left row after every right row and hand it the
    // globally earliest right payload; nulls-first matches the backward
    // direction (asc, nulls first), where a null-ts left row sees no
    // right rows and carries null.
    val order =
      if (forward) Seq(col("_ts").desc_nulls_first, col("_side"))
      else Seq(col("_ts"), col("_side"))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carry(c: org.apache.spark.sql.Column) =
      last(c, ignoreNulls = true).over(w)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn(s"${prefix}ts", carry(col("_r_ts")))
    val withPayloads = payloadCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"$prefix$c", carry(col(s"_r_$c")))
    }
    withPayloads.filter(col("_side") === lit(leftSide))
      .select((leftCols.map(col) :+ col(s"${prefix}ts")) ++
        payloadCols.map(c => col(s"$prefix$c")): _*)
  }

  /** Tolerance-bounded backward as-of (the pandas `merge_asof(...,
    * tolerance=)` shape): the latest right row with
    * left.ts − tolerance <= right.ts <= left.ts. A match older than the
    * tolerance is nulled out — "the most recent prior quote, but only if
    * it is fresh enough". Same single-exchange union-window plan as
    * [[asOfBackward]]; the staleness bound is one post-window projection,
    * so the cost is identical to the unbounded form. */
  def asOfTolerance(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], toleranceSeconds: Long,
      prefix: String = "asof_"): DataFrame = {
    require(toleranceSeconds >= 0, "tolerance must be non-negative")
    val leftCols = left.columns.toSeq
    val joined =
      asOfBackward(left, right, keyCol, tsCol, payloadCols, prefix)
    // exact integer MICROseconds, not double seconds: at current epochs a
    // double carries ~2^-22 s rounding, enough to misclassify a match whose
    // age is exactly the (inclusive) tolerance when timestamps have
    // sub-second parts
    val fresh = col(s"${prefix}ts").isNotNull &&
      unix_micros(col(tsCol)) - unix_micros(col(s"${prefix}ts")) <=
        lit(toleranceSeconds * 1000000L)
    joined.select(leftCols.map(col) ++
      (s"${prefix}ts" +: payloadCols.map(c => s"$prefix$c")).map(c =>
        when(fresh, col(c)).otherwise(lit(null)).as(c)): _*)
  }

  /** Nearest-neighbor-in-time join: for each left row, the right row
    * minimizing |right.ts − left.ts| in either direction — the sensor/
    * log-alignment shape ("the reading closest to each observation").
    * Equidistant candidates resolve to the EARLIER right row (the
    * backward match), so output is deterministic given the base as-of
    * precondition (right pre-deduplicated to one row per (key, ts)).
    *
    * Composed as one backward + one forward pass over the same union-
    * window shape, stitched on `leftIdCol` (must uniquely identify left
    * rows): three key-partitioned exchanges total, no range probe, no
    * nested-loop — each pass is the O(left+right) as-of merge, and the
    * stitch is an equi-join both of whose sides are left-row-sized.
    * Timestamps compare via their double epoch (exact for the ±2^52 µs
    * domain of real event data). Output: left columns + `{prefix}ts` +
    * `{prefix}dir` ('b'/'f', null when no match) + prefixed payloads. */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, leftIdCol: String, payloadCols: Seq[String],
      prefix: String = "near_"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith(prefix)),
      s"left side already has $prefix-prefixed columns")
    val b = asOfBackward(left, right, keyCol, tsCol, payloadCols, "_zb_")
    val f = asOfForward(left, right, keyCol, tsCol, payloadCols, "_zf_")
      .select((Seq(col(leftIdCol), col("_zf_ts")) ++
        payloadCols.map(c => col(s"_zf_$c"))): _*)
    val j = b.join(f, Seq(leftIdCol))
    val lts = col(tsCol).cast("double")
    val pickB = col("_zb_ts").isNotNull && (col("_zf_ts").isNull ||
      lts - col("_zb_ts").cast("double") <=
        col("_zf_ts").cast("double") - lts)
    def choose(bc: String, fc: String) =
      when(pickB, col(bc)).otherwise(col(fc))
    j.select((leftCols.map(col) :+
      choose("_zb_ts", "_zf_ts").as(s"${prefix}ts") :+
      when(pickB, lit("b")).otherwise(when(col("_zf_ts").isNotNull,
        lit("f"))).as(s"${prefix}dir")) ++
      payloadCols.map(c => choose(s"_zb_$c", s"_zf_$c").as(s"$prefix$c")): _*)
  }
}
