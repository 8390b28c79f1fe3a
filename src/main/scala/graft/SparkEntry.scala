package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.EtlCore

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EtlCore.q19EtlPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg"              -> EtlCore.q01Agg _,
    "q02_filter_project"   -> EtlCore.q02FilterProject _,
    "q03_join_agg"         -> EtlCore.q03JoinAgg _,
    "q04_broadcast_join"   -> EtlCore.q04BroadcastJoin _,
    "q05_dedup_key"        -> EtlCore.q05DedupKey _,
    "q06_regex_extract"    -> EtlCore.q06RegexExtract _,
    "q07_parse_dollars"    -> EtlCore.q07ParseDollars _,
    "q08_multi_date"       -> EtlCore.q08MultiDate _,
    "q09_null_prune"       -> EtlCore.q09NullPrune _,
    "q10_pivot"            -> EtlCore.q10Pivot _,
    "q11_coalesce_fill"    -> EtlCore.q11CoalesceFill _,
    "q12_window_topn"      -> EtlCore.q12WindowTopN _,
    "q13_conditional_agg"  -> EtlCore.q13ConditionalAgg _,
    "q14_semi_anti"        -> EtlCore.q14SemiAnti _,
    "q15_string_normalize" -> EtlCore.q15StringNormalize _,
    "q16_type_coercion"    -> EtlCore.q16TypeCoercion _,
    "q17_json_extract"     -> EtlCore.q17JsonExtract _,
    "q18_runtime_parse"    -> EtlCore.q18RuntimeParse _,
    "q19_etl_pipeline"     -> EtlCore.q19EtlPipeline _
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}
