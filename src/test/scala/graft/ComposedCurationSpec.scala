package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Incremental}
import graft.functions.Text

/** x19: the composed curation lifecycle. The oracle gate hash-proves
  * merge → delete → merge == from-scratch x08 on the composed survivors
  * every run; these fixtures pin the family's OWN interaction
  * invariants — the benchmark registry surviving a delete so a
  * re-ingested doc re-checks against the FULL grown gram set, and a
  * contaminated doc leaving every clean structure. */
class ComposedCurationSpec extends SparkSpecBase {
  import spark.implicits._

  private def isBench(id: Long): Boolean = {
    spark.range(id, id + 1).select(
      (pmod(Text.hash60(col("id").cast("string"), Dedup.DecontamSeed),
        lit(Dedup.DecontamBenchMod)) === 0).as("b"))
      .head().getBoolean(0)
  }

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.map { case (id, t) =>
      (id, t, "en", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "n_chars")

  private def stages(df: DataFrame): Map[Long, String] =
    df.select("doc_id", "stage").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("registry survives the delete: a re-ingested doc re-checks against the GROWN gram set") {
    // Deterministic cast: one bench id for B, non-bench ids for X/W
    // (asserted, not assumed — the rule is the md5 slice).
    val benchId = (1L to 400L).find(isBench).get
    val Seq(xId, wId) = (1L to 400L).filter(i => !isBench(i) && i != benchId)
      .take(2).toSeq
    val xText = (1 to 32).map(i => s"x$i").mkString(" ")
    val base = docsDf(
      xId -> xText,
      wId -> (1 to 32).map(i => s"w$i").mkString(" "))
    val st0 = Curation.cutState(
      Curation.curationState(spark, base))
    assert(stages(st0.decisions) == Map(xId -> "kept", wId -> "kept"))
    // batch1: a BENCHMARK doc sharing X's leading 8-gram — its grams
    // enter the immutable registry and contaminate X map-side.
    val bText = (1 to 8).map(i => s"x$i").mkString(" ") + " " +
      (1 to 24).map(i => s"b$i").mkString(" ")
    val st1 = Curation.cutState(
      Curation.mergeCurationState(spark, st0, docsDf(benchId -> bText)))
    assert(stages(st1.decisions) ==
      Map(xId -> "contaminated", wId -> "kept", benchId -> "benchmark"))
    // The contaminated doc leaves every clean structure.
    assert(st1.cleanGrams.filter(col("doc_id") === xId).count() == 0)
    assert(st1.bands.filter(col("doc_id") === xId).count() == 0)
    assert(st1.shingles.filter(col("doc_id") === xId).count() == 0)
    // delete X; the registry is UNTOUCHED by the delete.
    val st2 = Curation.cutState(
      Curation.deleteCurationState(spark, st1, Seq(xId).toDF("doc_id")))
    assert(stages(st2.decisions) == Map(wId -> "kept", benchId -> "benchmark"))
    assert(st2.benchGrams.count() == st1.benchGrams.count())
    // re-ingest X with the SAME text: it must come back CONTAMINATED —
    // only the grown, delete-surviving registry can know that.
    val st3 = Curation.mergeCurationState(spark, st2, docsDf(xId -> xText))
    assert(stages(st3.decisions) ==
      Map(xId -> "contaminated", wId -> "kept", benchId -> "benchmark"))
    // And the composed end state equals from-scratch on the three docs.
    val scratch = stages(Curation.curationDecideDocs(spark,
      base.unionByName(docsDf(benchId -> bText))))
    assert(stages(st3.decisions) == scratch)
  }

  test("x19 composed == from-scratch x08 on the composed survivors (real data)") {
    val d = sf001
    val survivors = Tables.documents(spark, d)
      .filter(!(col("doc_id") % Incremental.DeleteMod === Incremental.DeleteRes &&
        pmod(Text.hash60(col("doc_id").cast("string"), Dedup.DecontamSeed),
          lit(Dedup.DecontamBenchMod)) =!= 0 &&
        col("doc_id") % Incremental.ComposedReingestMod =!= 0))
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getBoolean(6))).toSet
    val composed = rows(Curation.x19CurationLifecycle(spark, d))
    val scratch = rows(Curation.curationDecideDocs(spark, survivors))
    assert(composed == scratch && composed.nonEmpty)
  }
}
