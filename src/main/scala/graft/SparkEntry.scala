package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.EtlCore

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EtlCore.q19EtlPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — the verified
    * view (production plan + canonical order) of [[Queries]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.verified

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * BOUND: this no-arg form embeds the CATALOG-DEFAULT RHP band width
    * (Similarity.RhpBits = 4) in d05/e02's mirrors and the default ADC
    * shortlist (Similarity.PqShortlist) in e04/e05/e06/e13/e15's, while the
    * cataloged plans calibrate both from the corpus count. They agree
    * exactly while calibration floors at the defaults — i.e. embeddings
    * count n with floor(n / perBucket=50) <= 2^RhpBits = 16, so n <= 849
    * (sf0.001 = 50, sf0.01 = 500: both safely under; the shortlist
    * floor holds to n <= 6000). At larger corpora use the
    * SF-aware overload, as [[Verify]] (the only gate consumer) does;
    * OracleContractSpec asserts both facts. */
  def oracleSql: Map[String, String] = Oracles.all()

  /** SF-aware oracle: d05/e02 size their RHP band width and
    * e04/e05/e06/e13/e15 their ADC shortlist depth from the corpus count
    * (Queries catalog ↔
    * Similarity.calibratedRhpBits / calibratedPqShortlist), so the
    * mirror SQL must embed the hyperplanes and shortlist for the SAME
    * values. Verify dumps this form; the no-arg [[oracleSql]] keeps the
    * contract shape (and equals this one at the gate SFs, where both
    * calibrations floor at the catalog defaults). */
  def oracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    Oracles.all(operators.Similarity.calibratedRhpBits(spark, sfDir),
      operators.Similarity.calibratedPqShortlist(spark, sfDir))
}
