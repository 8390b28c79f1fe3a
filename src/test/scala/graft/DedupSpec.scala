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

  test("d05 bucketed pairs are a subset of exact pairs with high recall") {
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet(operators.Dedup.d05ExactPairs(spark, sf001))
    val bucketed = pairSet(Queries.production("d05_embedding_dedup")(spark, sf001))
    assert(bucketed.subsetOf(exact),
      "band candidates are exact-verified, so no false pairs can appear")
    if (exact.nonEmpty) {
      val recall = (exact & bucketed).size.toDouble / exact.size
      assert(recall >= 0.8, s"d05 recall = $recall (missed ${exact -- bucketed})")
    }
  }

  test("d02 capped index yields identical pairs to uncapped at this SF") {
    // max shingle df here is far below NgramMaxDf, so the cataloged
    // capped plan must be EXACTLY the uncapped exact result (the cap only
    // bites on stop-shingle corpora — SkewSpec covers that behavior).
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.functions.GraftShingles(spark, col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val uncapped = pairSet(operators.Dedup.ngramJaccardPairs(docs, 0.5, None))
    val capped = pairSet(Queries.production("d02_ngram_jaccard")(spark, sf001))
    assert(capped == uncapped)
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
