package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi join — the explicit form of the runtime
  * row-group filter a 100 TB star join lives on: when the probe side is
  * huge and the build side is selective-but-not-tiny, shuffling every
  * probe row to discover most match nothing is the dominant cost. A
  * broadcast Bloom filter drops non-matching probe rows BEFORE the
  * shuffle; the exact join afterwards removes the filter's false
  * positives, so the OUTPUT is exactly the plain semi join (oracle-
  * checkable) while the shuffle carries ~|matches| + fpp·|probe| rows
  * instead of |probe|. (Spark's AQE injects similar runtime filters for
  * some shapes; this operator makes the technique explicit, tunable, and
  * available to any plan.)
  */
object BloomJoin {

  /** `large` with the Bloom pre-filter applied (approximate: keeps all
    * matches plus ~fpp false positives). Integral key columns only — a
    * string column would be silently cast to bigint by the long-typed
    * UDF, null out, and drop every row, so non-integral keys fail fast
    * here instead. */
  private def prefiltered(large: DataFrame, small: DataFrame, key: String,
      expectedKeys: Long, fpp: Double): DataFrame = {
    val kt = large.schema(key).dataType
    require(Seq("long", "integer", "short", "byte").contains(kt.typeName),
      s"BloomJoin supports integral keys, got $key: ${kt.typeName}")
    val bf = small.stat.bloomFilter(key, expectedKeys, fpp)
    val bcast = large.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcast.value.mightContainLong(k))
    large.filter(col(key).isNotNull && mightContain(col(key)))
  }

  /** Exact semi join of `large` against `small`'s `key`s with a Bloom
    * pre-filter on the shuffle. `expectedKeys`/`fpp` size the filter
    * (bits ≈ -n·ln(fpp)/ln²2 — 1M keys at 1% ≈ 1.2 MB broadcast). */
  def semiJoin(large: DataFrame, small: DataFrame, key: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    prefiltered(large, small, key, expectedKeys, fpp)
      .join(small.select(col(key)), Seq(key), "left_semi")

  /** The pre-filter's survivor count vs the large side's row count — the
    * shuffle-reduction evidence (spec + plan audits use it). */
  def prefilterSurvivors(large: DataFrame, small: DataFrame, key: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): (Long, Long) =
    (prefiltered(large, small, key, expectedKeys, fpp).count(),
      large.count())
}
