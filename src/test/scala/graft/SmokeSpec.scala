package graft

/** Driver-contract smoke: the flagship entry yields rows on sf0.001. */
class SmokeSpec extends SparkSpecBase {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries key has either an oracle or a documented rows-only check") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without a query: ${o -- q}")
    // rows-only (no oracle) keys must be the approximate ops only
    assert((q -- o) == Set("e02_ann_lsh"))
  }
}
