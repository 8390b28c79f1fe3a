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

  /** KMV sketch size (k minimum values), hash seed, and the salt fan-out
    * of the two-level min-k (stage-1 windows run per (lang, salt), so no
    * single task ever sorts a whole language's vocabulary). */
  val KmvK = 256
  val KmvSeed = 17
  val KmvSalts = 64

  /** 2^60: the hash60 value space, exactly representable as a double
    * (power of two), so the KMV estimator divides identically in any
    * engine. */
  private val Hash60Space = math.pow(2, 60)

  /** x03: per-language distinct-token cardinality via a KMV (k-minimum-
    * values) sketch — the deterministic alternative to HLL: the sketch
    * state is the k smallest md5-derived hashes of the distinct tokens,
    * so the SAME estimate reproduces on any engine/partitioning and the
    * operator is hash-gated like everything else (HLL implementations
    * differ across engines and can't be mirrored). Estimator: with the
    * k-th smallest hash at fraction F = kth/2^60 of the space, distinct
    * ≈ (k-1)/F; when a stratum has fewer than k distinct tokens the
    * sketch IS the exact answer. The exact count is emitted alongside, so
    * the sketch error is visible in-row (spec bounds it). At scale the
    * sketch state is k values per stratum regardless of corpus size; the
    * per-stratum window runs over the DISTINCT-token set, which is
    * vocabulary-bounded, not corpus-bounded. */
  def x03KmvDistinct(s: SparkSession, d: String): DataFrame =
    kmvDistinct(Tables.documents(s, d).select(col("lang"), col("text")))

  /** KMV over any (lang, text) frame — split out so specs can feed a
    * synthetic corpus with a known cardinality. */
  def kmvDistinct(docs: DataFrame): DataFrame = {
    // dedup tokens BEFORE hashing: md5 runs once per vocabulary entry,
    // not once per occurrence (the result set is identical either way —
    // the second distinct only collapses rare hash collisions)
    val hashes = docs
      .select(col("lang"), explode(Text.tokens(col("text"))).as("tok"))
      .distinct()
      .select(col("lang"), Text.hash60(col("tok"), KmvSeed).as("h"))
      .distinct()
    // Two-level exact min-k: stage 1 keeps each (lang, salt) group's k
    // smallest hashes — every global minimum is among its salt group's
    // top-k (pigeonhole), so the union of <= salts·k candidates per
    // language provably contains the true k minima; stage 2 ranks that
    // BOUNDED candidate set. A language's whole vocabulary is never
    // sorted in one task, whatever the stratum skew. The per-group COUNT
    // rides the same stage-1 exchange (count-over-partition, no order),
    // so the exact cardinality costs no extra scan: n_exact = sum of the
    // group sizes carried by each group's rank-1 row.
    val w1p = Window.partitionBy(col("lang"), pmod(col("h"), lit(KmvSalts)))
    val s1 = hashes
      .withColumn("rn", row_number().over(w1p.orderBy("h")))
      .withColumn("cnt", count(lit(1)).over(w1p))
      .filter(col("rn") <= KmvK)
    val counts = s1.filter(col("rn") === 1)
      .groupBy("lang").agg(sum("cnt").as("n_exact"))
    val w2 = Window.partitionBy("lang").orderBy("h")
    val kth = s1.select(col("lang"), col("h"))
      .withColumn("rn", row_number().over(w2))
      .groupBy("lang")
      .agg(max(when(col("rn") === KmvK, col("h"))).as("kth"))
    counts.join(kth, Seq("lang"))
      .select(col("lang"), col("n_exact"),
        round(when(col("kth").isNull, col("n_exact").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(Hash60Space) / col("kth").cast("double")), 6)
          .as("kmv_estimate"))
  }

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
