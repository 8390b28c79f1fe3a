package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Sweeping scale audit over EVERY production plan: the properties that
  * killed round-1 plans (root-level global sorts) and the ones that kill
  * plans at 100 TB (accidental cartesian products) must hold for every
  * catalog entry, not just the hand-picked PlanSpec queries. */
class PlanAuditSpec extends SparkSpecBase {

  private def root(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  test("no production plan is a global sort at the root") {
    for ((name, fn) <- Queries.production) {
      val p = root(fn(spark, sf001).queryExecution.executedPlan)
      assert(!p.isInstanceOf[SortExec],
        s"$name emits through a global sort — ordering belongs to the verify wrapper")
    }
  }

  test("no production plan contains an unhinted cartesian product") {
    for ((name, fn) <- Queries.production) {
      val bad = fn(spark, sf001).queryExecution.executedPlan.collect {
        case c: CartesianProductExec => c
      }
      assert(bad.isEmpty, s"$name contains CartesianProduct")
    }
  }
}
