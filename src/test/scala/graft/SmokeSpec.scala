package graft

/** Driver-contract smoke: the flagship entry yields rows on sf0.001. */
class SmokeSpec extends SparkSpecBase {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries key has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without a query: ${o -- q}")
    // Even the approximate LSH ops are hash-gated: their deterministic
    // band assignments are mirrored in the oracle SQL (Oracles.rhpBandsSql).
    assert((q -- o).isEmpty, s"query keys without an oracle: ${q -- o}")
  }
}
