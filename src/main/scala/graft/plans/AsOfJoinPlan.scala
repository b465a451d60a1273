package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Native as-of join as a first-class Catalyst operator — the
  * whole-operator tier of the extension ladder (scalar expressions →
  * [[graft.GraftExtensions]] SQL functions → THIS: logical node +
  * planner strategy + physical exec). The composed form
  * ([[graft.operators.AsOfJoin]], union + keyed window) stays as the
  * built-in-only path and the equivalence baseline; this node exists
  * because as-of deserves a real physical operator: a single forward
  * merge per partition instead of interleaving both sides through one
  * window sort — no union row inflation, no carry columns, and the
  * right side's payload never participates in the sort.
  *
  * Semantics (identical to the composition, spec-asserted): for each
  * left row, backward attaches the LATEST right row with right.ts <=
  * left.ts for the same key, forward the EARLIEST with right.ts >=
  * left.ts; equal timestamps match in both directions; left rows with
  * no qualifying right row carry nulls; null keys match null keys (the
  * window-partition convention); null right timestamps never match;
  * null left timestamps match nothing. Right side must be
  * pre-deduplicated to one row per (key, ts) — same contract as any
  * as-of engine.
  *
  * Column references are ORDINALS into the children's output, not
  * attributes: when both sides derive from the same scan they share
  * expr-ids, and DeduplicateRelations cannot rewrite a parent that
  * holds the ambiguous id in two roles — ordinals sidestep the whole
  * identity problem (the strategy re-derives fresh attributes from the
  * children at planning time). The node is built from ANALYZED child
  * plans, so it is born resolved. */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeyIdx: Int,
    leftTsIdx: Int,
    rightKeyIdx: Int,
    rightTsIdx: Int,
    payloadIdx: Seq[Int],
    outAttrs: Seq[Attribute],
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  // the attached-side columns are BORN here (fresh expr-ids) — without
  // this, CheckAnalysis flags them as missing from the children's input
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  // ordinal references are invisible to the optimizer, so claim every
  // child column: with an empty reference set ColumnPruning prunes the
  // right child to NOTHING, and a narrower claim would let it insert a
  // Project that re-orders the ordinals out from under the exec. The
  // cost — no pruning through this node — matches the composed
  // operator's behavior (callers pre-select the right side).
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** Backward as-of join (latest right at-or-before). Same signature
    * and output schema as `AsOfJoin.asOfBackward`. */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    asOf(left, right, keyCol, tsCol, payloadCols, prefix, forward = false)

  /** Forward variant: earliest right row with right.ts >= left.ts. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    asOf(left, right, keyCol, tsCol, payloadCols, prefix, forward = true)

  private def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], prefix: String,
      forward: Boolean): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    require(!left.columns.exists(_.startsWith(prefix)),
      s"left side already has $prefix-prefixed columns")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    // resolve with the session's resolver (case-insensitive under the
    // default spark.sql.caseSensitive=false) — the composed AsOfJoin
    // goes through col() and resolves that way, and the two forms
    // promise the same signature
    val resolver = left.sparkSession.sessionState.analyzer.resolver
    def idx(plan: LogicalPlan, name: String, side: String): Int = {
      val i = plan.output.indexWhere(a => resolver(a.name, name))
      require(i >= 0, s"$side side has no column '$name' " +
        s"(has: ${plan.output.map(_.name).mkString(", ")})")
      i
    }
    val payloadIdx = payloadCols.map(idx(rPlan, _, "right"))
    val rTsIdx = idx(rPlan, tsCol, "right")
    val lKeyIdx = idx(lPlan, keyCol, "left")
    val lTsIdx = idx(lPlan, tsCol, "left")
    val rKeyIdx = idx(rPlan, keyCol, "right")
    // analysis-time type agreement: the exec builds its key/ts
    // orderings from the LEFT attribute types and compares right-side
    // values with them — a mismatch (ts INT vs BIGINT) would otherwise
    // surface as an executor-side ClassCastException, and a key-type
    // mismatch would hash-partition the two sides inconsistently
    def sameType(li: Int, ri: Int, what: String): Unit = {
      val (lt, rt) = (lPlan.output(li).dataType, rPlan.output(ri).dataType)
      require(lt == rt,
        s"as-of $what type mismatch: left ${lt.sql} vs right ${rt.sql} " +
          "— cast the sides to one type first")
    }
    sameType(lKeyIdx, rKeyIdx, s"key '$keyCol'")
    sameType(lTsIdx, rTsIdx, s"ts '$tsCol'")
    // output columns for the attached side: fresh expr-ids, nullable
    // (left-outer), names prefixed exactly like the composed operator
    val outAttrs =
      AttributeReference(s"${prefix}ts",
        rPlan.output(rTsIdx).dataType, nullable = true)() +:
        payloadIdx.map { i =>
          val p = rPlan.output(i)
          AttributeReference(s"$prefix${p.name}", p.dataType,
            nullable = true)()
        }
    val node = AsOfJoinNode(lPlan, rPlan,
      lKeyIdx, lTsIdx, rKeyIdx, rTsIdx, payloadIdx, outAttrs, forward)
    GraftColumnBridge.ofRows(left.sparkSession, node)
  }
}
