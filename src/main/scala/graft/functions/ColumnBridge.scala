// The Column <-> catalyst Expression bridge classes are private[sql] since
// the Spark Connect refactor, so this shim lives in org.apache.spark.sql —
// the same technique Spark's own extensions (and e.g. spark-hadoopcryptoledger,
// sedona, etc.) use to expose Expression-backed Columns.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

object GraftColumnBridge {
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over a custom LogicalPlan (private[sql] since the Connect
    * refactor) — the entry point a custom plan node (graft.plans) needs. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
