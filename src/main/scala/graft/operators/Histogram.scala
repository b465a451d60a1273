package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-width histogram over a numeric column — the profiling primitive
  * behind length/score distribution dashboards and bin-bucketed sampling.
  *
  * Two aggregations: a 1-row (min, max) frame that rides in as a broadcast
  * crossJoin (no driver collect — the plan stays a plan), then one
  * map-side-combinable groupBy on the bin id. The maximum value clamps
  * into the last bin (standard closed-last-bin convention); only non-empty
  * bins are emitted. Bin edges are derived with the same double
  * arithmetic an external SQL engine would use, so results are
  * value-comparable across engines (oracle: `a_histogram`). */
object Histogram {

  def equiWidth(df: DataFrame, value: Column, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val x = value.cast("double")
    val bounds = df.agg(min(x).as("lo"), max(x).as("hi"))
    val w = (col("hi") - col("lo")) / nBins
    // degenerate lo == hi collapses to bin 0 (w = 0 would divide by zero)
    val bin = when(col("hi") === col("lo"), lit(0))
      .otherwise(least(floor((x - col("lo")) / w), lit(nBins - 1)))
      .cast("int")
    df.crossJoin(broadcast(bounds))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("cnt"),
        round(first(col("lo") + bin * w), 6).as("lo_edge"),
        round(first(when(bin === nBins - 1, col("hi"))
          .otherwise(col("lo") + (bin + 1) * w)), 6).as("hi_edge"))
  }
}
