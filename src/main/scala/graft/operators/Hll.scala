package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketches (Flajolet et al. 2007) — the
  * mergeable cardinality primitive a 100 TB lakehouse runs on: build a
  * fixed-size register array per partition/day/segment ONCE, persist it,
  * and answer any union's distinct count later by register-wise max —
  * no rescan of history, unlike `approx_count_distinct`, whose sketch
  * Spark keeps internal to a single aggregation.
  *
  * Parameters: p register-index bits → m = 2^p one-byte registers
  * (p = 11 → 2 kB per sketch, stderr ≈ 1.04/√m ≈ 2.3%). Hashing is the
  * engine's own 64-bit mixer ([[Hashing.hash64]]) — deterministic
  * across runs and partitionings (register-wise max is commutative),
  * so estimates are stable contract values, not run artifacts.
  *
  * Estimator: standard HLL with the small-range linear-counting
  * correction (E ≤ 2.5m with empty registers → m·ln(m/V)); the HLL++
  * bias tables are omitted — the raw estimator's bias in the mid range
  * is well inside the audited 5% gate at p = 11. */
object Hll {

  /** Register array aggregator: one byte per register, merge = max. */
  final class SketchAgg(p: Int) extends Aggregator[String, Array[Byte], Array[Byte]] {
    private val m = 1 << p
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(regs: Array[Byte], v: String): Array[Byte] = {
      val h = Hashing.hash64(if (v == null) "" else v, 0x48_4c_4cL)
      val idx = (h >>> (64 - p)).toInt
      // rank = leading zeros of the remaining 64-p bits, + 1
      val rest = h << p
      val rank = (if (rest == 0L) 64 - p
                  else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > regs(idx)) regs(idx) = rank.toByte
      regs
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(regs: Array[Byte]): Array[Byte] = regs
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge aggregator over ALREADY-BUILT sketches (binary column) —
    * register-wise max. The incremental-maintenance primitive: persisted
    * per-segment sketches union with a new batch's without touching raw
    * history. */
  final class MergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.empty[Byte]
    override def reduce(acc: Array[Byte], v: Array[Byte]): Array[Byte] =
      merge(acc, v)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        // the [[union]] guard: merging sketches built at different p
        // would otherwise silently drop the longer array's tail
        // registers whenever the accumulator is the shorter one
        require(a.length == b.length,
          s"Hll.MergeAgg: sketch size mismatch (${a.length} vs " +
            s"${b.length} registers — sketches built at different p?)")
        var i = 0
        while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
        a
      }
    override def finish(regs: Array[Byte]): Array[Byte] = regs
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Estimate the cardinality a register array represents. Driver/executor
    * pure function — sketches are sidecar-sized (m bytes), never data. */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Merge two register arrays (register-wise max) without mutating
    * either — the union law: estimate(merge(a,b)) estimates |A ∪ B|. */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "sketch size mismatch")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** Per-group sketches: (groupCols…, hll BINARY). The aggregation is
    * map-side combinable — each task reduces its rows into one m-byte
    * buffer before the exchange, so the shuffle carries
    * O(groups × tasks × m) bytes however large the corpus is. */
  def groupSketches(df: DataFrame, valueCol: Column,
      groupCols: Seq[String], p: Int = 11): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in 4..16")
    val agg = udaf(new SketchAgg(p))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(valueCol.cast("string")).as("hll"))
  }

  /** Per-group estimate next to the exact distinct count and a
    * tolerance flag — the audit shape (vocab_cms_audit pattern): the
    * sketch is useful only if this gate holds corpus-wide. */
  def auditedEstimates(df: DataFrame, valueCol: Column,
      groupCols: Seq[String], p: Int = 11, tol: Double = 0.05): DataFrame = {
    val estimateUdf = udf((regs: Array[Byte]) =>
      math.round(estimate(regs)))
    val sketches = groupSketches(df, valueCol, groupCols, p)
      .withColumn("hll_est", estimateUdf(col("hll"))).drop("hll")
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(valueCol).as("exact_distinct"))
    sketches.join(exact, groupCols)
      .withColumn("within_tol",
        abs(col("hll_est") - col("exact_distinct")).cast("double") <=
          greatest(col("exact_distinct") * tol, lit(1.0)))
  }
}
