package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** The curation DECISION operator (SURVEY §2.H): the end-to-end
  * composition CurationPipelineSpec exercises, materialized as ONE
  * total decision frame — one row per document with the final verdict
  * and its provenance. This is the artifact a training-data run
  * actually consumes: an auditable keep/drop verdict with the reason, the
  * near-dup group resolution, and the split assignment for survivors.
  *
  * Stages (each an already-gated catalog operator, composed as plans —
  * no glue materialization):
  *   1. benchmark quarantine — the held-out eval slice (d07's
  *      deterministic 1-in-20 md5 rule) never trains;
  *   2. quality gate — t07's exact-integer keep rules;
  *   3. decontamination — d07's n-gram-overlap verdicts;
  *   4. near-dup groups over the CLEAN survivors — d03's verified
  *      MinHash-LSH pairs (restricted to clean docs on both sides),
  *      resolved by d06's connected components;
  *   5. keeper policy — KEEP-BEST-QUALITY: the group member with the
  *      highest t02 quality score (6-dp-rounded; ties to the lowest
  *      doc_id), the policy a real dedup runs instead of min-id;
  *   6. split — x05's stable hash split for kept docs.
  *
  * Output (total — every input doc_id appears exactly once, no nulls):
  * stage ∈ {benchmark, low_quality, contaminated, duplicate, kept}
  * with that precedence; group_id/group_size/keeper_id describe the
  * near-dup component for clean docs (-1/0/-1 sentinels otherwise);
  * keeper_id maps every duplicate to its surviving representative —
  * the redirect table a downstream join consumes; split is x05's
  * train/val/test for kept rows, 'none' otherwise; keep ⟺ stage='kept'.
  *
  * Scale shape: every stage keeps its parent operator's audited plan
  * (t07's single GramStats pass, d07's gram-hash join — a broadcast
  * against a real MB-scale benchmark, d03's banded LSH — never
  * all-pairs, CC over edge-incident vertices only), and the assembly
  * is doc_id/label equi-joins over corpus-sparse frames. The stage
  * verdicts are decomposable per-doc flags, so the union'd decision
  * frame partitions like the corpus. */
object Curation {

  def x08CurationDecide(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val marked = docs.select(col("doc_id"),
      (pmod(Text.hash60(col("doc_id").cast("string"), Dedup.DecontamSeed),
        lit(Dedup.DecontamBenchMod)) === 0).as("is_bench"))
    val q = TextAnalysis.t07QualityFilter(s, d)
      .select(col("doc_id"), col("keep").as("q_keep"))
    val contam = Dedup.d07Decontaminate(s, d)
      .select(col("doc_id"), col("contaminated"))
    // d07's frame covers only non-bench docs; bench rows take the
    // 'benchmark' branch first, so the left-join null never decides.
    val staged = marked.join(q, "doc_id").join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_bench"), "benchmark")
          .when(!col("q_keep"), "low_quality")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .otherwise("clean").as("stage0"))
    val clean = staged.filter(col("stage0") === "clean").select("doc_id")
    // d03's verified pairs, both endpoints restricted to clean docs.
    val pairs = Dedup.d03MinhashLsh(s, d).select(col("id_a"), col("id_b"))
      .join(clean.toDF("id_a"), "id_a")
      .join(clean.toDF("id_b"), "id_b")
    val labels = Dedup.connectedComponents(
      clean.select(col("doc_id").as("id")), pairs).toDF("doc_id", "lbl")
    val quality = TextAnalysis.t02QualityScore(s, d)
      .select(col("doc_id"), col("quality"))
    val m = labels.join(quality, "doc_id")
    val groups = m.groupBy("lbl")
      .agg(count(lit(1)).as("group_size"),
        max_by(col("doc_id"), struct(col("quality"), -col("doc_id")))
          .as("keeper_id"))
    val split = Sampling.x05StratSplit(s, d).select(col("doc_id"), col("split"))
    val cleanRows = m.select("doc_id", "lbl").join(groups, "lbl")
      .join(split, "doc_id")
      .select(col("doc_id"),
        when(col("doc_id") === col("keeper_id"), "kept")
          .otherwise("duplicate").as("stage"),
        col("lbl").as("group_id"), col("group_size"), col("keeper_id"),
        when(col("doc_id") === col("keeper_id"), col("split"))
          .otherwise("none").as("split"),
        (col("doc_id") === col("keeper_id")).as("keep"))
    val dropRows = staged.filter(col("stage0") =!= "clean")
      .select(col("doc_id"), col("stage0").as("stage"),
        lit(-1L).as("group_id"), lit(0L).as("group_size"),
        lit(-1L).as("keeper_id"), lit("none").as("split"),
        lit(false).as("keep"))
    cleanRows.unionByName(dropRows)
  }
}
