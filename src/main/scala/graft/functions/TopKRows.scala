package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Generic per-group top-k ROWS with a bounded buffer — the
  * window-free form of `row_number() OVER (PARTITION BY g ORDER BY
  * score DESC, id) <= k`. The window form shuffles and SORTS every row
  * of every group; this aggregator keeps k (score, id) slots per group,
  * so partial aggregation bounds both memory and shuffle at k rows per
  * group per task — the shape that survives a group with 10⁹ rows.
  * Unlike [[TopKSum]] the retained IDS are part of the output, so ties
  * matter: ordering is (score DESC, id ASC), total and
  * partition-invariant — including on the two doubles a naive `<`
  * mishandles: NaN orders ABOVE +∞ and −0.0 ties with 0.0, exactly
  * Spark's SQL sort semantics, so the output stays equal to the window
  * form (and partition-order-independent) even on NaN-bearing score
  * columns where `<`-based comparison would drop or keep NaN rows
  * depending on arrival order. */
class TopKRows(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)],
      Array[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // buffer: WORST-first sorted array (slot 0 evicts first) of ≤ k
  // (score, id), "better" = higher score, then lower id. Score compare
  // is java.lang.Double.compare (total order: NaN greatest, matching
  // Spark/DuckDB DESC sorts) on +0.0-normalized values (x + 0.0 maps
  // −0.0 → 0.0, because Double.compare alone would order −0.0 < 0.0
  // where SQL sorts treat them equal and fall through to the id).
  private def worse(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1 + 0.0, b._1 + 0.0)
    c < 0 || (c == 0 && a._2 > b._2)
  }

  def zero: Array[(Double, Long)] = Array.empty

  def reduce(b: Array[(Double, Long)],
      v: (Double, Long)): Array[(Double, Long)] =
    if (b.length < k) {
      val out = new Array[(Double, Long)](b.length + 1)
      var i = 0
      while (i < b.length && worse(b(i), v)) { out(i) = b(i); i += 1 }
      out(i) = v
      while (i < b.length) { out(i + 1) = b(i); i += 1 }
      out
    } else if (!worse(b(0), v)) b
    else {
      val out = b.clone()
      var i = 1
      while (i < k && worse(out(i), v)) { out(i - 1) = out(i); i += 1 }
      out(i - 1) = v
      out
    }

  def merge(a: Array[(Double, Long)],
      b: Array[(Double, Long)]): Array[(Double, Long)] = {
    var acc = a
    var i = 0
    while (i < b.length) { acc = reduce(acc, b(i)); i += 1 }
    acc
  }

  /** BEST-first (rank order) on output. */
  def finish(b: Array[(Double, Long)]): Array[(Double, Long)] = b.reverse

  def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}

object TopKRows {
  /** Column form: array<struct<_1: score, _2: id>> of the k best rows
    * per group, best first. Inputs must be non-null. */
  def topKRows(score: Column, id: Column, k: Int): Column =
    udaf(new TopKRows(k),
      ExpressionEncoder[(Double, Long)]()).apply(score, id)
}
