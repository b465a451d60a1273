package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-gate digests for DETERMINISTIC engine-defined outputs (VERDICT
  * r9 task 5): queries whose values DuckDB cannot replay (JVM Deflater
  * byte counts, engine hash families, EM fits) but that are pure
  * functions of (testdata bytes, engine constants, fixed seeds). The
  * gate entry emits ONE canonical digest row over the full output —
  * order-free sum of per-row xxhash64 computed in exact DECIMAL(38,0)
  * (500 rows × 2⁶³ ≈ 4.6e21 ≪ 1e38: no overflow; a SUM, not an XOR, so
  * duplicate rows cannot cancel), CARRIED AS A CANONICAL STRING — plus
  * the row count — and the oracle is the constant that digest takes on
  * the gate's sf0.01 testdata, pinned the same way GoldenValuesSpec pins
  * the underlying full outputs at sf0.001. This turns "no_oracle"
  * spec-only pins into driver-visible full-strength rows: ANY
  * value/row/order-insensitive change in the engine output flips the
  * digest.
  *
  * Carrier type (VERDICT r10 #1): the digest column is STRING, not
  * DECIMAL(38,0). The r10 driver gate byte-hashed Spark's DECIMAL dump
  * differently from DuckDB's DECIMAL oracle even when values and
  * declared types agreed (same trap class as the r8 HUGEINT incident);
  * VARCHAR and BIGINT are the two carriers with ten rounds of proven
  * hash agreement, and the digest magnitude exceeds INT64, so STRING it
  * is. Spark's Decimal.toString on scale-0 values is plain signed
  * digits (no exponent, no trailing ".0") — byte-identical to the
  * pinned literal.
  *
  * Scale note: the digest aggregation is map-side combinable (partial
  * sums per partition) — gate plumbing, not a data movement. */
object DigestGate {

  /** (digest STRING — canonical signed decimal digits of the exact
    * DECIMAL(38,0) sum — , n_rows BIGINT) over every column of `df`. */
  def digestRow(df: DataFrame): DataFrame = {
    val h = xxhash64(df.columns.map(col).toSeq: _*)
    df.agg(
      coalesce(sum(h.cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).cast("string").as("digest"),
      count(lit(1)).as("n_rows"))
  }

  /** Constant-comparison oracle for [[digestRow]], value captured at
    * sf0.01 (the driver gate's scale). The digest constant is a plain
    * VARCHAR literal — no DECIMAL round-trip on either side. */
  def oracle(digest: String, nRows: Long): String =
    s"SELECT '$digest' AS digest, " +
      s"CAST($nRows AS BIGINT) AS n_rows"

  /** Per-SF form of [[oracle]] (VERDICT r14 → r15 #3): `(digest,
    * n_rows)` pins keyed by the LINEITEM row count — the scale-factor
    * fingerprint the testdata generator preserves (6000 / 60000 /
    * 600000 at sf0.001 / 0.01 / 0.1; `documents` cannot discriminate —
    * it ships 500 rows at BOTH sf0.001 and sf0.01 with different
    * text). One SQL string thus serves every scale factor, so the
    * three-SF replay reads 311/311 everywhere instead of
    * 304/311-with-a-known-delta-list — a real regression can no longer
    * hide inside "expected" deltas. An UNPINNED scale factor falls off
    * the CASE and yields NULL digest → loud mismatch, the same fail
    *-shut contract as a wrong constant. Every pin is captured by the
    * standing protocol: two runs at different partitionings (4- and
    * 32-way) must agree before the constant lands. */
  def oracleBySf(pins: Map[Long, (String, Long)]): String = {
    require(pins.nonEmpty, "oracleBySf: at least one pinned SF")
    val sorted = pins.toSeq.sortBy(_._1)
    val digests = sorted.map { case (n, (d, _)) => s"WHEN $n THEN '$d'" }
      .mkString(" ")
    val rows = sorted.map { case (n, (_, r)) =>
      s"WHEN $n THEN CAST($r AS BIGINT)" }.mkString(" ")
    "SELECT CASE (SELECT count(*) FROM lineitem) " + digests +
      " END AS digest, CASE (SELECT count(*) FROM lineitem) " + rows +
      " END AS n_rows"
  }
}
