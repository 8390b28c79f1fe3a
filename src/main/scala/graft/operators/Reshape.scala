package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import graft.Tables
import graft.functions.Parse

/** Record reshaping & multi-source merging (reference integration surface):
  * ragged-key consolidation into a map column (challenge.py:45-58) and the
  * pandas-style suffix join + redundant-column resolution
  * (challenge.py:235-271), Spark-shaped.
  */
object Reshape {

  /** Pandas merge(suffixes=...) analog: columns present on BOTH sides
    * (except the join key) get deterministic suffixes, then a plain
    * key join. Purely a plan-time rename — no extra pass over data. */
  def suffixJoin(left: DataFrame, right: DataFrame, key: String,
                 suffixL: String, suffixR: String,
                 how: String = "inner"): DataFrame = {
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    val l = overlap.foldLeft(left)((df, c) => df.withColumnRenamed(c, c + suffixL))
    val r = overlap.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + suffixR))
    l.join(r, Seq(key), how)
  }

  /** The reference's alternate-title key inventory (challenge.py:51-58):
    * every language/romanization key observed in the wiki-movies corpus,
    * plus the generic alt-title spellings q20's synthetic input uses. A
    * ragged record holds AT MOST a few of these; the fold collapses
    * whichever are present into one canonical value. */
  val AltTitleKeys: Seq[String] = Seq(
    "also_known_as", "alternate_title", "working_title",
    "Also known as", "Arabic", "Cantonese", "Chinese", "French", "Hangul",
    "Hebrew", "Hepburn", "Japanese", "Literally", "Mandarin",
    "McCune-Reischauer", "Original title", "Polish",
    "Revised Romanization", "Romanized", "Russian", "Simplified",
    "Traditional", "Yiddish")

  /** Ragged JSON record string → string map. The map type is the right
    * Spark shape for ragged keys at scale: schema inference over 100 TB
    * of JSON would union EVERY key ever seen into a wide sparse struct
    * (and demand a second pass to discover it); a map keeps the scan
    * single-pass, schema-free, and column-pruned down to the keys the
    * query actually extracts. */
  def raggedToMap(raw: Column): Column =
    from_json(raw, MapType(StringType, StringType))

  /** Alt-title fold over a consolidated map (challenge.py:45-58): first
    * present key in canonical order wins. Purely a coalesce chain —
    * codegen'd, no shuffle, no per-key pass. */
  def altTitle(m: Column, keys: Seq[String] = AltTitleKeys): Column =
    coalesce(keys.map(k => element_at(m, k)): _*)

  /** q20: consolidate ragged JSON keys into one map column, then extract
    * canonical fields (the reference's 20-alternate-title fold,
    * challenge.py:45-58). Input JSON is built deterministically since the
    * synthetic events table carries only flat props. */
  def q20MapConsolidate(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val ids = id.cast("string")
    val raw =
      when(id % 3 === 0, concat(lit("{\"title\": \"t"), ids,
        lit("\", \"also_known_as\": \"alt"), ids, lit("\"}")))
      .when(id % 3 === 1, concat(lit("{\"title\": \"t"), ids,
        lit("\", \"alternate_title\": \"alt"), ids, lit("\", \"year\": \"1999\"}")))
      .otherwise(concat(lit("{\"title\": \"t"), ids, lit("\"}")))
    Tables.documents(s, d).select(id, raw.as("raw"))
      .withColumn("m", raggedToMap(col("raw")))
      .select(id,
        size(col("m")).cast("bigint").as("n_keys"),
        element_at(col("m"), "title").as("title"),
        altTitle(col("m"),
          Seq("also_known_as", "alternate_title", "working_title")).as("alt_title"))
  }

  /** q21: suffix join of two sources describing the same entities +
    * redundant-column resolution (prefer the second source, zero counts
    * as missing — fill_missing_kaggle_data, challenge.py:256-262) +
    * canonical rename/reorder (challenge.py:264-283). */
  def q21SuffixMerge(s: SparkSession, d: String): DataFrame = {
    val wiki = Tables.customer(s, d).select(col("c_custkey").as("id"),
      col("c_name").as("name"), col("c_acctbal").as("value"))
    val kaggle = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("id"))
      .agg(Parse.dsum(col("o_totalprice")).as("value"),
        count(lit(1)).as("n_orders"))
      .withColumn("name", concat(lit("Customer#"), col("id").cast("string")))
    suffixJoin(wiki, kaggle, "id", "_wiki", "_kaggle", "left")
      .select(col("id"),
        coalesce(col("name_wiki"), col("name_kaggle")).as("name"),
        round(coalesce(nullif(col("value_kaggle"), lit(0.0)), col("value_wiki")), 2)
          .as("value"),
        col("value_wiki"), col("value_kaggle"), col("n_orders"))
  }
}
