package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replica reconciliation (anti-entropy) between two copies of a keyed
  * table — the Merkle-tree comparison every replicated store runs,
  * expressed relationally: summarize each side into `nBuckets` content
  * checksums, compare the summaries, and only the DIFFERING buckets need
  * a row-level diff.
  *
  * Scale shape: each side is ONE map-side-combinable aggregation down to
  * nBuckets rows (count + order-independent XOR of row checksums), so
  * comparing two 100 TB replicas shuffles 2×nBuckets rows — the row-level
  * re-sync then touches only mismatched buckets (buckets/total of the
  * data, the Merkle payoff). Checksums are md5-derived (content-keyed,
  * engine-reproducible — the DuckDB oracle recomputes them), and XOR
  * aggregation is order- and partition-independent, so any engine, any
  * layout, any retry produces identical summaries. */
object Sync {

  /** 48-bit content checksum of (key, payload) — exact in a BIGINT on any
    * engine (no unsigned-overflow or HUGEINT divergence, unlike sum).
    * Key and payload hash SEPARATELY before combining: a joint
    * delimiter-concat would make (key="a|b", payload="c") and (key="a",
    * payload="b|c") checksum identically, hiding boundary-shifted drift.
    * Callers with nullable payloads should `coalesce` them first (null
    * md5 propagates to a null row check, which XOR then skips). */
  private def rowCheck(key: Column, payload: Column): Column =
    conv(substring(md5(concat(md5(key), md5(payload))), 1, 12), 16, 10)
      .cast("long")

  private def summarize(df: DataFrame, key: Column, payload: Column,
      nBuckets: Int, side: String): DataFrame =
    df.select(
        pmod(conv(substring(md5(key), 1, 12), 16, 10).cast("long"),
          lit(nBuckets.toLong)).cast("int").as("bucket"),
        rowCheck(key, payload).as("_rc"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(s"${side}_cnt"),
        expr("bit_xor(_rc)").as(s"${side}_check"))

  /** Buckets where the two replicas disagree (missing/extra/modified rows
    * land in their key's bucket). Empty result = replicas identical.
    * Output: (bucket, left_cnt, right_cnt, left_check, right_check) with
    * nulls where a side has no rows in that bucket. */
  def bucketDiff(left: DataFrame, right: DataFrame, key: Column,
      payload: Column, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val l = summarize(left, key, payload, nBuckets, "left")
    val r = summarize(right, key, payload, nBuckets, "right")
    // null-SAFE comparisons: a bucket whose checksum is NULL on one side
    // (all-null payloads XOR to nothing) must still diff against a
    // non-null checksum — `=!=` would evaluate to NULL and filter the
    // drift away silently
    l.join(r, Seq("bucket"), "full_outer")
      .filter(!(col("left_cnt") <=> col("right_cnt")) ||
        !(col("left_check") <=> col("right_check")))
      .select(col("bucket"), col("left_cnt"), col("right_cnt"),
        col("left_check"), col("right_check"))
  }

  /** Row-level snapshot diff — the audit report [[bucketDiff]]'s dirty
    * buckets drill into: full-outer join two snapshots on the key and
    * classify every key as added / removed / changed (any compared
    * column differs, null-safely) — unchanged keys are DROPPED, so the
    * output is diff-sized, not snapshot-sized. Precondition: key is
    * unique per snapshot (the latestPerKey compaction shape).
    * Output: (key cols..., status, changed_cols ARRAY<STRING> — empty
    * for added/removed). */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    (keyCols ++ compareCols).foreach(c =>
      require(!Set("_in_a", "_in_b", "status", "changed_cols")
          .contains(c) && !c.startsWith("_a_"),
        s"snapshotDiff reserves working/output name '$c'"))
    val b = before.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_in_b", lit(true))
    val a = after.select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"_a_$c")): _*)
      .withColumn("_in_a", lit(true))
    val j = b.join(a, keyCols, "full_outer")
    val changed = array(compareCols.map(c =>
      when(!(col(c) <=> col(s"_a_$c")), lit(c))): _*)
    j.select(keyCols.map(col) :+
        when(col("_in_b").isNull, lit("added"))
          .when(col("_in_a").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status") :+
        when(col("_in_b").isNotNull && col("_in_a").isNotNull,
          filter(changed, x => x.isNotNull))
          .otherwise(array().cast("array<string>")).as("changed_cols"): _*)
      .filter(col("status") =!= "changed" || size(col("changed_cols")) > 0)
  }
}
