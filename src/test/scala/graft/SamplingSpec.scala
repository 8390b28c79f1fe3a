package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Curation operator invariants beyond the oracle gate (SURVEY §2.H). */
class SamplingSpec extends SparkSpecBase {

  test("x01: kept rows satisfy their stratum's rate; sample is a strict subset") {
    val total = Tables.documents(spark, sf001).count()
    val kept = Queries.production("x01_hash_sample")(spark, sf001)
    val n = kept.count()
    assert(n > 0 && n < total, s"sample $n of $total")
    // per-stratum membership rule holds row-by-row
    assert(kept.filter(col("lang") === "en" && col("bucket") >= 500).count() == 0)
    assert(kept.filter(col("lang") === "zh" && col("bucket") >= 800).count() == 0)
    assert(kept.filter(col("bucket") >= 1000).count() == 0)
    // non-downsampled strata are kept in full
    val fr = Tables.documents(spark, sf001).filter(col("lang") === "fr").count()
    assert(kept.filter(col("lang") === "fr").count() == fr)
  }

  test("x02: packs are contiguous per shard and overflow only by their last doc") {
    val packs = Queries.production("x02_seq_pack")(spark, sf001)
    // contiguous pack numbering from 0 within every shard
    val byShard = packs.groupBy("shard")
      .agg(min("pack_no").as("mn"), max("pack_no").as("mx"),
        count(lit(1)).as("n"))
      .collect()
    assert(byShard.nonEmpty)
    for (r <- byShard) {
      assert(r.getAs[Long]("mn") == 0L)
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n") - 1,
        s"pack numbers must be dense per shard: $r")
    }
    // a pack holds < budget tokens before its last (possibly straddling)
    // doc starts — so pack_tokens < PackTokens + max doc length
    val maxDoc = Tables.documents(spark, sf001)
      .select(max(size(graft.functions.Text.tokens(col("text")))))
      .collect()(0).getInt(0).toLong
    val worst = packs.agg(max("pack_tokens")).collect()(0).getLong(0)
    assert(worst < Sampling.PackTokens + maxDoc,
      s"pack of $worst tokens exceeds budget+straddle bound")
    // doc ranges are ordered with the pack order
    val disorder = packs.filter(col("first_doc") > col("last_doc")).count()
    assert(disorder == 0)
  }
}
