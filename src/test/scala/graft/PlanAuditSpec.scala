package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Sweeping scale audit over EVERY production plan: the properties that
  * killed round-1 plans (root-level global sorts) and the ones that kill
  * plans at 100 TB (accidental cartesian products, all-pairs nested-loop
  * joins) must hold for every catalog entry, not just the hand-picked
  * PlanSpec queries. */
class PlanAuditSpec extends SparkSpecBase {

  private def root(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Full operator list, descending THROUGH the AQE wrapper — an
    * AdaptiveSparkPlanExec is a leaf node, so a bare `plan.collect` over
    * a shuffling query inspects nothing but the wrapper itself. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def operators(name: String): Seq[SparkPlan] =
    flatten(Queries.production(name)(spark, sf001).queryExecution.executedPlan)

  test("no production plan is a global sort at the root") {
    for ((name, fn) <- Queries.production) {
      val p = root(fn(spark, sf001).queryExecution.executedPlan)
      assert(!p.isInstanceOf[SortExec],
        s"$name emits through a global sort — ordering belongs to the verify wrapper")
    }
  }

  test("no production plan contains an unhinted cartesian product") {
    for ((name, _) <- Queries.production) {
      assert(!operators(name).exists(_.isInstanceOf[CartesianProductExec]),
        s"$name contains CartesianProduct")
    }
  }

  test("no production plan nested-loop-joins two unbounded sides") {
    // Deliberate broadcast-SMALL-side exceptions: e01 broadcasts its tiny
    // query set and streams the corpus once (exact brute kNN — linear in
    // corpus); e03 broadcasts its <=16-row centroid table for probe
    // assignment. Everything else — in particular the d05 near-dup pairs,
    // formerly an all-pairs BNLJ over the whole table — must be
    // nested-loop-free.
    // e04/e05/e06 join the allowlist for the same reason as e03: their
    // nested-loop sides are the 16-row codebook/centroid tables and the
    // n/100 query set (e06 is e05's machinery over an appended index;
    // e07 profiles cells under the same <=16-row broadcast quantizer).
    val broadcastSmallByDesign =
      Set("e01_knn_brute", "e03_ivf_ann", "e04_pq_ann", "e05_ivfpq",
        "e06_index_append", "e07_cluster_stats")
    for ((name, _) <- Queries.production if !broadcastSmallByDesign(name)) {
      assert(!operators(name).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        s"$name contains BroadcastNestedLoopJoin")
    }
  }
}
