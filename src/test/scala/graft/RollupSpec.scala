package graft

import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

/** q24 rollup: subtotal algebra must be internally consistent, and the
  * plan must compute all three grouping levels from ONE scan via Expand
  * (not three unioned aggregates). */
class RollupSpec extends SparkSpecBase {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("q24 grouping levels are mutually consistent") {
    val rows = operators.EtlCore.q24Rollup(spark, sf001).collect()
    val cells  = rows.filter(_.getLong(0) == 0L)
    val subs   = rows.filter(_.getLong(0) == 1L)
    val grand  = rows.filter(_.getLong(0) == 3L)
    assert(grand.length == 1, "exactly one grand-total row")
    assert(subs.nonEmpty && cells.nonEmpty)
    // n_items is additive: cells → per-flag subtotal → grand total.
    val nOf = (r: org.apache.spark.sql.Row) => r.getLong(6)
    assert(cells.map(nOf).sum == nOf(grand.head))
    for (s <- subs) {
      val flag = s.getString(1)
      assert(cells.filter(_.getString(1) == flag).map(nOf).sum == nOf(s),
        s"subtotal mismatch for returnflag=$flag")
    }
    // Exact-decimal sums are additive too (no float drift between levels).
    val qtyOf = (r: org.apache.spark.sql.Row) => BigDecimal(r.getDouble(3))
    assert(cells.map(qtyOf).sum == qtyOf(grand.head))
  }

  test("q24 plans as a single Expand + aggregate, not a union of scans") {
    val plan = operators.EtlCore.q24Rollup(spark, sf001).queryExecution.executedPlan
    val ops = flatten(plan)
    assert(ops.count(_.isInstanceOf[ExpandExec]) == 1,
      "rollup should lower to exactly one Expand")
    val scans = ops.count(_.nodeName.toLowerCase.contains("scan"))
    assert(scans == 1, s"rollup should read lineitem once, saw $scans scans")
  }
}
