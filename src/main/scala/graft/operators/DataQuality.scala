package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test / Deequ shape):
  * a check list compiles to ONE aggregation pass per distinct check
  * family over the audited table, emitting a uniform violation report —
  * the admission gate a training-data pipeline runs before a snapshot
  * is allowed into the mix.
  *
  * Scale shape: `NotNull` / `InRange` / `Matches` checks fold into a
  * SINGLE map-side-combinable aggregation over one scan (conditional
  * counts, no shuffle of data rows); each `Unique` adds one keyed
  * aggregation; each `ForeignKey` adds one left-anti join against its
  * dimension (broadcast when small). Violation counts are exact
  * integers — the report is engine-reproducible by construction.
  */
object DataQuality {

  sealed trait Check { def name: String }
  /** Column must be non-null. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null:$col"
  }
  /** Column must fall in [lo, hi] (nulls are violations — a range
    * expectation implies presence). */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range:$col"
  }
  /** String column must match the regex (nulls are violations). */
  final case class Matches(col: String, regex: String) extends Check {
    val name = s"matches:$col"
  }
  /** Key column set must be unique; violations = rows in excess of one
    * per key. */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique:${cols.mkString(",")}"
  }
  /** Every non-null value must exist in `dim.dimCol`; violations =
    * referencing rows with no match. */
  final case class ForeignKey(col: String, dim: DataFrame, dimCol: String)
      extends Check {
    val name = s"foreign_key:$col"
  }

  /** One report row per check: (check, violations, total, pass),
    * ordered by check name. `total` is the audited row count (for
    * Unique: the duplicated-key surplus base is still the row count). */
  def checkReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "checkReport needs at least one check")
    val rowChecks: Seq[(String, Column)] = checks.collect {
      case NotNull(c) => (s"not_null:$c",
        sum(when(col(c).isNull, 1L).otherwise(0L)))
      case InRange(c, lo, hi) => (s"in_range:$c",
        sum(when(col(c).isNull ||
          col(c).cast("double") < lo || col(c).cast("double") > hi,
          1L).otherwise(0L)))
      case Matches(c, re) => (s"matches:$c",
        sum(when(col(c).isNull || !col(c).rlike(re), 1L).otherwise(0L)))
    }
    val spark = df.sparkSession
    import spark.implicits._
    // all row-local checks ride ONE aggregation over one scan
    val rowReport: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        val aggs = rowChecks.map { case (n, c) => c.as(n) } :+
          count(lit(1)).as("_total")
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(array(rowChecks.map { case (n, _) =>
            struct(lit(n).as("check"), col(n).as("violations"))
          }: _*).as("cs"), col("_total"))
          .select(explode(col("cs")).as("c"), col("_total"))
          .select(col("c.check").as("check"),
            col("c.violations").as("violations"),
            col("_total").as("total")))
      }
    val uniqueReports: Seq[DataFrame] = checks.collect {
      case u @ Unique(cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_n"))
          .agg(coalesce(sum(col("_n") - 1), lit(0L)).as("violations"),
            coalesce(sum(col("_n")), lit(0L)).as("total"))
          .select(lit(u.name).as("check"), col("violations"), col("total"))
    }
    val fkReports: Seq[DataFrame] = checks.collect {
      case f @ ForeignKey(c, dim, dc) =>
        val viol = df.filter(col(c).isNotNull)
          .join(dim.select(col(dc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
        val tot = df.agg(count(lit(1)).as("total"))
        viol.crossJoin(tot)
          .select(lit(f.name).as("check"), col("violations"), col("total"))
    }
    (rowReport.toSeq ++ uniqueReports ++ fkReports)
      .reduce(_ unionByName _)
      .select(col("check"), col("violations"), col("total"),
        (col("violations") === 0L).as("pass"))
      .orderBy(col("check"))
  }
}
