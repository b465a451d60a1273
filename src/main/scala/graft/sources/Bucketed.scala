package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins (SURVEY.md §7.1-8 scale
  * posture: "co-locate joins via bucketing or pre-partitioning").
  *
  * Writing both sides of a recurring join bucketed by the join key (same
  * bucket count) lets Spark plan a SortMergeJoin with NO shuffle exchange
  * on either side — at 100 TB the difference between re-shuffling the
  * fact table on every query and reading it join-ready. Verified at the
  * plan level in BucketedSpec (no ShuffleExchange below the join).
  */
object Bucketed {

  /** Write `df` as a bucketed managed table (overwriting any previous). */
  def write(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket column — planned
    * shuffle-free when bucket counts match. */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
