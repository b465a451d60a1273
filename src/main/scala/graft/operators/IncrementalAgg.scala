package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates — the materialized-
  * view refresh primitive: a stored (key, count, sum) state absorbs a
  * delta batch WITHOUT rescanning the base data, because count/sum/avg
  * decompose into a commutative monoid (exactly the property Spark's own
  * partial aggregation exploits inside one query; this operator exploits
  * it ACROSS queries/runs).
  *
  * Cost is |state| + |delta| — at 100 TB the base is never touched, the
  * delta aggregates map-side, and the merge shuffles key-cardinality
  * rows. Sums use DECIMAL so the refreshed state is bit-identical to a
  * from-scratch recompute on any engine (the gate's contract). Derived
  * measures (avg) are computed FROM the state, never maintained
  * directly (avg is not a monoid). */
object IncrementalAgg {

  /** Aggregate a batch to (keys..., n, sv) state rows. */
  def countSumState(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sv"))

  /** Merge a delta batch into an existing state: union + re-aggregate
    * (both inputs are state-shaped, so the merge is one key-cardinality
    * shuffle). The result equals `countSumState` over base ∪ delta. */
  def mergeCountSum(baseState: DataFrame, delta: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame =
    baseState.unionByName(countSumState(delta, keys, valueCol))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
}
