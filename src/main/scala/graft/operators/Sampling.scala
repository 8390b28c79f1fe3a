package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** Data-curation operators a training-data pipeline runs between dedup
  * and export (SURVEY §2.H): deterministic sampling and sequence
  * packing. Both are pure map/window/aggregate plans whose randomness is
  * md5-derived, so they are exactly reproducible across engines (oracle
  * hash-gated) and across partitionings — no `rand()`, whose draw order
  * depends on the physical split.
  */
object Sampling {

  /** Per-stratum sampling rates out of 1000, by document language —
    * downsample the dominant stratum, keep the scarce ones (the usual
    * language-rebalancing move). Shared with the oracle mirror and the
    * spec, so a rate change updates all three atomically. */
  val RateEn = 500
  val RateZh = 800
  val RateDefault = 1000
  val SampleSeed = 11
  val ShardSeed = 13

  private def rateOf: org.apache.spark.sql.Column =
    when(col("lang") === "en", RateEn)
      .when(col("lang") === "zh", RateZh)
      .otherwise(RateDefault)

  /** x01: deterministic stratified hash-sample — a document is kept iff
    * md5-bucket(doc_id) mod 1000 falls under its stratum's rate. Unlike
    * `df.sample`, membership is a pure function of the row (stable
    * across runs, partitionings, and engines — the SAME sample can be
    * reproduced anywhere), and the filter is map-side only: no shuffle,
    * fully pushdown-friendly at 100 TB. */
  def x01HashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        pmod(Text.hash60(col("doc_id").cast("string"), SampleSeed), lit(1000)).as("bucket"),
        rateOf.as("rate"))
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"), col("bucket"))

  /** Tokens per pack (context-window budget) and shard count for x02. */
  val PackTokens = 2048
  val PackShards = 8

  /** x02: sharded sequence packing — the concat-then-chunk token packing
    * a pretraining pipeline runs: documents are hashed into shards, laid
    * out in deterministic (doc_id) order within each shard, and a doc is
    * assigned to the pack its FIRST token lands in (cumulative token
    * offset DIV budget). The running sum is a per-SHARD window, so the
    * heavy window is bounded by a shard, never the corpus, and shard
    * count scales with the cluster. Output is one row per pack with its
    * doc range and token count (a pack may overflow the budget by at
    * most its last straddling doc — chunking semantics). */
  def x02SeqPack(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("bigint").as("n_tokens"),
        pmod(Text.hash60(col("doc_id").cast("string"), ShardSeed), lit(PackShards)).as("shard"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("pack_no", expr(s"(cum - n_tokens) DIV $PackTokens"))
      .groupBy("shard", "pack_no")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }
}
