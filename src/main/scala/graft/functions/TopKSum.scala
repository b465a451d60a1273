package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Sum of the k LARGEST values of a LONG column — the map-side-combinable
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k` → `sum(v)` idiom. The window form shuffles and sorts the
  * ENTIRE input keyed by g (for Bitext's margin table that is the full
  * |S|·|T| pair table, twice); this aggregator keeps a k-slot buffer per
  * group, so partial aggregation collapses each map partition to one
  * k-array per group and only (group, k·8 bytes) skeletons cross the
  * wire. The result is identical: the sum of the top-k MULTISET is
  * unique regardless of how ties among equal values break, which is
  * exactly why the window's tid tie-break never mattered to the sum. */
class TopKSum(k: Int) extends Aggregator[Long, Array[Long], Long] {
  require(k >= 1, s"k must be >= 1, got $k")

  /** buffer: ascending-sorted array of the largest ≤ k values so far
    * (slot 0 = current minimum = first evicted). */
  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], v: Long): Array[Long] =
    if (b.length < k) {
      val out = new Array[Long](b.length + 1)
      var i = 0
      while (i < b.length && b(i) < v) { out(i) = b(i); i += 1 }
      out(i) = v
      while (i < b.length) { out(i + 1) = b(i); i += 1 }
      out
    } else if (v <= b(0)) b
    else {
      val out = b.clone()
      var i = 1
      while (i < k && out(i) < v) { out(i - 1) = out(i); i += 1 }
      out(i - 1) = v
      out
    }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var acc = a
    var i = 0
    while (i < b.length) { acc = reduce(acc, b(i)); i += 1 }
    acc
  }

  def finish(b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < b.length) { s += b(i); i += 1 }
    s
  }

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object TopKSum {
  /** Column form: sum of the k largest values of `v` per group. */
  def topKSum(v: Column, k: Int): Column =
    udaf(new TopKSum(k), Encoders.scalaLong).apply(v)
}
