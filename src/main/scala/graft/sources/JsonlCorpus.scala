package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus export/import — the interchange format training-data
  * loaders actually consume (one JSON object per line, directory of
  * shard files). Spark's native JSON source IS line-delimited JSON, so
  * both directions stay on the built-in (codegen'd, predicate-pushdown-
  * capable) reader/writer; this object adds the two things a pipeline
  * needs on top: deterministic token-budget sharding and schema-pinned
  * reads.
  *
  * Sharding is CONTENT-keyed, not row-count-keyed: shard =
  * pmod(xxhash64(key), nShards), with nShards sized so the EXPECTED
  * shard payload hits `targetTokens`. Re-runs, retries, and upstream
  * repartitions land every document in the same shard (append-safety
  * and resumability), and no global sort or running-total window
  * appears anywhere — the assignment is one narrow projection. The
  * trade: shards are balanced in expectation (hash-uniform), not
  * exactly — the same trade [[graft.operators.Packing]] documents for
  * its offset sidecars.
  *
  * Reads REQUIRE an explicit schema: schema inference is a full extra
  * pass over 100 TB and type-drifts on sparse fields; a pinned schema
  * is both the fast path and the contract. */
object JsonlCorpus {

  /** Plan the shard count for a token budget: ceil(Σ tokens / target),
    * floor 1. One map-side-combinable aggregation. */
  def shardCountForBudget(df: DataFrame, tokensCol: Column,
      targetTokens: Long): Int = {
    require(targetTokens >= 1, "targetTokens must be >= 1")
    val total = df.agg(coalesce(sum(tokensCol), lit(0L))).first().getLong(0)
    math.max(1, math.ceil(total.toDouble / targetTokens).toInt)
  }

  /** Append a deterministic `shard` column: pmod(xxhash64(key), n). */
  def withShard(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    require(!df.columns.contains("shard"),
      "withShard: input already has a 'shard' column")
    df.withColumn("shard", pmod(xxhash64(key), lit(nShards.toLong)))
  }

  /** Write the frame as JSONL shard directories `shard=K/part-*.json`,
    * one file per shard (each shard's rows coalesce through the
    * shard-keyed shuffle — files sized by the token budget, the unit a
    * data loader streams). Returns the shard count. */
  def writeShards(df: DataFrame, key: Column, tokensCol: Column,
      targetTokens: Long, path: String): Int = {
    val n = shardCountForBudget(df, tokensCol, targetTokens)
    withShard(df, key, n)
      .repartition(n, col("shard"))
      .write.mode("overwrite").partitionBy("shard").json(path)
    n
  }

  /** Schema-pinned JSONL read of a shard directory (or any JSONL
    * tree). `columns` of the written `shard=K/` layout come back as a
    * `shard` partition column automatically. */
  def readShards(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
