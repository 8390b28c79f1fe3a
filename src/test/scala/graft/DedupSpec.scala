package graft

import org.apache.spark.sql.functions._

/** Dedup operator semantics beyond the oracle gate. */
class DedupSpec extends SparkSpecBase {

  test("d01: every content group collapses to one kept id (the minimum)") {
    val out = Queries.production("d01_dedup_exact")(spark, sf001)
    val n = Tables.documents(spark, sf001).count()
    assert(out.count() == n) // doubled input -> one group per original doc
    assert(out.filter(col("n_copies") =!= 2).count() == 0)
    assert(out.filter(col("keep_id") >= 1000000L).count() == 0,
      "kept id must be the original, not the shifted copy")
  }

  test("d03 LSH finds the full exact >=0.5 Jaccard pair set here") {
    def pairSet(name: String): Set[(Long, Long)] =
      Queries.production(name)(spark, sf001).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet("d02_ngram_jaccard")
    val lsh = pairSet("d03_minhash_lsh")
    assert(lsh.subsetOf(exact), "LSH-verified pairs must be true pairs")
    assert(lsh == exact, s"missed: ${exact -- lsh}")
  }
}
