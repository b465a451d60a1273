package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for heavy-key workloads (100 TB posture:
  * SURVEY.md §7.1-8 scale design — "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join split (on by default in Spark 4) handles sort-merge-join
  * partition skew at runtime; what it can NOT fix is (a) a single hot GROUP
  * BY key funneling into one reducer before AQE can split it, and (b) a
  * broadcast-impossible join against a hot-keyed build side. These
  * operators implement the classic salting patterns, output-identical to
  * their unsalted forms (oracle-checkable).
  */
object Skew {

  /** Per-row salt in [0, salts). Default: hash of the row's CONTENT only —
    * a task retry re-hashes every row to the same salt regardless of row
    * order, so speculative execution / fetch-failure replays can never
    * double-count a row into two salt groups (the property plain salting
    * by position forfeits: after a shuffle, replayed partitions may
    * iterate in a different order). Tradeoff: a hot key consisting of
    * exact-DUPLICATE rows lands on one salt group — for that shape, pass
    * `positional = true` to mix `monotonically_increasing_id()` (partition
    * × row position) into the hash. Positional salting is only retry-safe
    * when the input's per-partition row order is itself deterministic
    * (file scans, sorted shuffles) — the caller asserts that by opting
    * in. */
  private def saltOf(df: DataFrame, salts: Int,
      positional: Boolean): Column = {
    val parts: Seq[Column] =
      if (positional) df.columns.toSeq.map(col) :+ monotonically_increasing_id()
      else df.columns.toSeq.map(col)
    pmod(xxhash64(parts: _*), lit(salts))
  }

  /** Two-level aggregation for skewed groupBy keys: partial-aggregate on
    * (key, salt) then final-aggregate on key. Hot keys spread over `salts`
    * reducers in stage 1; stage 2 combines `salts` rows per key — bounded,
    * tiny. Supports algebraic aggregates (sum/count/min/max — pass the
    * merge expressions). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16, positional: Boolean = false): DataFrame = {
    require(!df.columns.contains("_salt"),
      "saltedSumCount writes working column '_salt' — input already has one")
    val salted = df.withColumn("_salt", saltOf(df, salts, positional))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as("sum_" + valueCol),
        sum(col("_pcnt")).as("cnt"))
  }

  /** Salted inner equi-join for a skewed LEFT side against a small-but-not-
    * broadcastable RIGHT side: left rows get a random salt in [0, salts),
    * the right side is replicated `salts` times, and the join key becomes
    * (key, salt) — a hot left key now lands on `salts` different reducers.
    * Output equals the plain inner join (row multiset). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8, positional: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    require(!left.columns.contains("_salt") &&
      !right.columns.contains("_salt"),
      "saltedJoin writes working column '_salt' — an input already has one")
    val saltedLeft = left.withColumn("_salt",
      saltOf(left, salts, positional).cast("int"))
    val saltsDf = (0 until salts).toDF("_salt")
    val replicatedRight = right.crossJoin(saltsDf)
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew diagnosis: per-key row counts with share-of-total — run on a
    * sample before choosing a mitigation. */
  def keyHistogram(df: DataFrame, key: Column, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n"))).first().getLong(0).toDouble
    counts.withColumn("share", round(col("n") / total, 6))
      .orderBy(desc("n"), col("key")).limit(topK)
  }
}
