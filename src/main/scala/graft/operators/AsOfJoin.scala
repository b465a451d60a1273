package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, attach the latest right row
  * with right.ts <= left.ts within the same key (the trades/quotes shape;
  * for us: "most recent prior click for each purchase").
  *
  * Composed as union + keyed window rather than a non-equi join: rows from
  * both sides interleave in ONE shuffle partitioned by key and sorted by
  * (ts, side), and `last(payload, ignoreNulls)` over the unbounded-
  * preceding frame carries the latest right payload forward into each left
  * row. No BroadcastNestedLoopJoin, no per-row range probe — the plan is a
  * single exchange + window sort regardless of either side's size, which
  * is the only shape that survives both sides being large.
  *
  * Ties: a right row at exactly left.ts matches (inclusive); callers must
  * pre-deduplicate the right side to one row per (key, ts) for
  * deterministic output (as any as-of engine requires).
  */
object AsOfJoin {

  /** left: any columns incl. `keyCol`, `tsCol`; right: `keyCol`, `tsCol`,
    * `payloadCols`. Returns left columns + `{prefix}ts` + prefixed
    * payloads (null when no right row precedes). */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith(prefix)),
      s"left side already has $prefix-prefixed columns")
    // _ts/_side/_r_* are internal working names in the union frame; an
    // input column with one of those names would silently shadow them.
    val reserved = (c: String) => c == "_ts" || c == "_side" || c.startsWith("_r_")
    require(!leftCols.exists(reserved) && !right.columns.exists(reserved),
      "input columns may not be named _ts/_side or start with _r_ " +
        "(internal as-of working columns)")

    val taggedRight = right.select(
      (Seq(col(keyCol), col(tsCol).as("_ts"), lit(0).as("_side"),
        col(tsCol).as(s"_r_ts")) ++
        payloadCols.map(c => col(c).as(s"_r_$c")) ++
        leftCols.filterNot(c => c == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(keyCol), col(tsCol).as("_ts"), lit(1).as("_side"),
        lit(null).cast(right.schema(tsCol).dataType).as(s"_r_ts")) ++
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"_r_$c")) ++
        leftCols.filterNot(c => c == keyCol).map(col)): _*)

    // right rows sort before left rows at equal ts → inclusive match.
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn(s"${prefix}ts", last(col("_r_ts"), ignoreNulls = true).over(w))
    val withPayloads = payloadCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"$prefix$c",
        last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    withPayloads.filter(col("_side") === 1)
      .select((leftCols.map(col) :+ col(s"${prefix}ts")) ++
        payloadCols.map(c => col(s"$prefix$c")): _*)
  }
}
