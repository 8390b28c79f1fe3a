package graft

import graft.operators.Dedup

/** d15 fixtures: the planted hub dominates (direction), the damping
  * floor holds, and the rank mass stays in the expected band — the
  * structural properties the hash gate alone doesn't narrate. */
class DomainRankSpec extends SparkSpecBase {

  private lazy val rows = Queries.production("d15_domain_rank")(spark, sf001)
    .collect()
    .map(r => (r.getAs[Long]("dom"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("w_out"), r.getAs[Long]("rank_micros")))

  test("one row per domain; every domain has docs and outlinks") {
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(r => r._2 > 0 && r._3 > 0))
    // w_out counts every emitted link: 2 per doc by the grammar.
    assert(rows.map(_._3).sum == rows.map(_._2).sum * Dedup.RankLinksPerDoc)
  }

  test("the planted hub (domain 0) outranks every other domain") {
    val byDom = rows.map(r => r._1 -> r._4).toMap
    val hub = byDom(0L)
    for ((dom, r) <- byDom if dom != 0L)
      assert(hub > r, s"hub $hub not above dom $dom at $r")
    // ~10% of all links reroute to the hub; with damping 0.85 its
    // stationary share is several times the uniform 1/nDom share.
    val total = rows.map(_._4).sum
    assert(hub.toDouble / total > 2.0 / rows.length)
  }

  test("damping floor and mass band hold") {
    assert(rows.forall(_._4 >= 150000L))
    // Total mass stays near nDom x 10^6: base injects 0.15 per node and
    // recirculation 0.85 of the previous mass (minus integer-floor
    // dust), so after 8 iterations the band is tight.
    val total = rows.map(_._4).sum.toDouble
    val n = rows.length
    assert(total > 0.9e6 * n && total < 1.1e6 * n)
  }
}
