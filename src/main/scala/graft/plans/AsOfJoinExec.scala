package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, Descending, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: one forward merge per co-partitioned, sorted
  * partition pair — O(|left| + |right|) per partition with O(1) state
  * (the current key's best-so-far right row), against the composed
  * form's union of both sides through a single window sort.
  *
  * EnsureRequirements supplies the infrastructure: the two
  * [[ClusteredDistribution]]s make the children co-partitioned on the
  * key, the required orderings make each child arrive sorted by
  * (key, ts) — ts ASCENDING for backward, DESCENDING (nulls last) for
  * forward, which reduces both directions to the same merge: scan the
  * right side in traversal order, remember the last right row whose ts
  * does not pass the left row's, emit on key match. "Does not pass" is
  * ts <= for the ascending traversal and ts >= for the descending one —
  * both inclusive, so equal timestamps match (the as-of convention).
  *
  * Null semantics (composition-identical, spec-asserted): null keys
  * match null keys; a null LEFT ts matches nothing; a null RIGHT ts is
  * consumed without recording (it can never qualify, and it must not
  * block the cursor from usable rows behind it). Column references are
  * child-output ordinals (see [[AsOfJoinNode]]). */
case class AsOfJoinExec(
    leftKeyIdx: Int,
    leftTsIdx: Int,
    rightKeyIdx: Int,
    rightTsIdx: Int,
    payloadIdx: Seq[Int],
    outAttrs: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  private def leftKey: Attribute = left.output(leftKeyIdx)
  private def leftTs: Attribute = left.output(leftTsIdx)
  private def rightKey: Attribute = right.output(rightKeyIdx)
  private def rightTs: Attribute = right.output(rightTsIdx)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  private def dir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, dir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, dir)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, dir))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val fwd = forward
    val lKeyIdx = leftKeyIdx
    val lTsIdx = leftTsIdx
    val rKeyIdx = rightKeyIdx
    val rTsIdx = rightTsIdx
    val rPayloadIdx = payloadIdx.toArray
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val payloadTypes = rPayloadIdx.map(right.output(_).dataType)
    val numLeft = left.output.length
    val numOut = output.length
    val outTypes = output.map(_.dataType).toArray

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // UnsafeRow output projection, built per partition (not serialized)
      val proj = GenerateUnsafeProjection.generate(
        outTypes.zipWithIndex.map { case (t, i) =>
          BoundReference(i, t, nullable = true)
        }.toIndexedSeq)
      val joined = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(numOut)

      // right-side cursor: rows are copied on read because the child's
      // sort iterator reuses its row object across next() calls
      var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var bestHasKey = false
      var bestKey: Any = null
      var bestTs: Any = null
      var bestPayload: Array[Any] = null

      def keyCmp(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else keyOrd.compare(a, b)

      // right ts "does not pass" left ts in traversal order
      def qualifies(rTs: Any, lTs: Any): Boolean =
        rTs != null && lTs != null && {
          val c = tsOrd.compare(rTs, lTs)
          if (fwd) c >= 0 else c <= 0
        }

      lIter.map { lRow =>
        val lKey = if (lRow.isNullAt(lKeyIdx)) null else lRow.get(lKeyIdx, keyType)
        val lTs = if (lRow.isNullAt(lTsIdx)) null else lRow.get(lTsIdx, tsType)
        var advancing = true
        while (advancing && rRow != null) {
          val rKey = if (rRow.isNullAt(rKeyIdx)) null else rRow.get(rKeyIdx, keyType)
          val kc = keyCmp(rKey, lKey)
          val rTs = if (rRow.isNullAt(rTsIdx)) null else rRow.get(rTsIdx, tsType)
          if (kc < 0 || (kc == 0 && rTs == null)) {
            // behind-key rows and unusable null-ts rows: consume, no record
            rRow = if (rIter.hasNext) rIter.next().copy() else null
          } else if (kc == 0 && qualifies(rTs, lTs)) {
            // newest-in-traversal qualifying right row for this key
            bestHasKey = true
            bestKey = rKey
            bestTs = rTs
            bestPayload = Array.tabulate(rPayloadIdx.length) { p =>
              val i = rPayloadIdx(p)
              if (rRow.isNullAt(i)) null
              else InternalRow.copyValue(rRow.get(i, payloadTypes(p)))
            }
            rRow = if (rIter.hasNext) rIter.next().copy() else null
          } else advancing = false
        }
        // a null left ts admits nothing, even with best state for its key
        val matched = lTs != null && bestHasKey && keyCmp(bestKey, lKey) == 0
        var i = 0
        while (i < numLeft) {
          joined.update(i,
            if (lRow.isNullAt(i)) null else lRow.get(i, outTypes(i)))
          i += 1
        }
        joined.update(numLeft, if (matched) bestTs else null)
        var p = 0
        while (p < rPayloadIdx.length) {
          joined.update(numLeft + 1 + p, if (matched) bestPayload(p) else null)
          p += 1
        }
        proj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
