package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy lowering [[AsOfJoinNode]] to [[AsOfJoinExec]].
  * Injected via `graft.GraftExtensions` (config path) or picked up from
  * `spark.experimental.extraStrategies` (the
  * `GraftExtensions.register` live-session path). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeyIdx, n.leftTsIdx, n.rightKeyIdx, n.rightTsIdx,
        n.payloadIdx, n.outAttrs, n.forward,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}
