package graft

import org.apache.spark.sql.functions._

/** x08's decision-frame invariants — the contract a downstream training
  * run relies on, beyond the oracle's value equality: totality (every
  * corpus doc decided exactly once), exactly one survivor per near-dup
  * group, keeper_id closure (every duplicate's redirect target is a kept
  * row), and stage/flag consistency. */
class CurationDecideSpec extends SparkSpecBase {

  private lazy val out =
    Queries.production("x08_curation_decide")(spark, sf001).cache()

  test("total: one decision row per corpus document") {
    val docs = Tables.documents(spark, sf001)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
  }

  test("keep flag is exactly the 'kept' stage; each group has one keeper") {
    assert(out.filter(col("keep") =!= (col("stage") === "kept")).count() == 0)
    val perGroup = out.filter(col("group_id") >= 0)
      .groupBy("group_id")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        count(lit(1)).as("n"), max("group_size").as("sz"),
        min("group_size").as("sz2"))
    assert(perGroup.filter(col("n_kept") =!= 1L).count() == 0,
      "every near-dup group must keep exactly one member")
    assert(perGroup.filter(col("n") =!= col("sz") || col("sz") =!= col("sz2"))
      .count() == 0, "group_size must equal the group's actual row count")
  }

  test("duplicates redirect to a kept doc in the SAME group; drops carry sentinels") {
    val kept = out.filter(col("keep"))
      .select(col("doc_id").as("keeper_id"), col("group_id").as("kg"))
    val dups = out.filter(col("stage") === "duplicate")
    assert(dups.join(kept, "keeper_id")
      .filter(col("group_id") =!= col("kg")).count() == 0)
    assert(dups.join(kept, Seq("keeper_id"), "left_anti").count() == 0,
      "every duplicate's keeper_id must be a kept row")
    val drops = out.filter(col("stage").isin("benchmark", "low_quality", "contaminated"))
    assert(drops.filter(col("group_id") =!= -1L || col("group_size") =!= 0L ||
      col("keeper_id") =!= -1L || col("split") =!= "none" || col("keep")).count() == 0)
  }

  test("stage precedence matches the component verdicts") {
    import graft.operators.{Dedup, TextAnalysis}
    val bench = Tables.documents(spark, sf001).select(col("doc_id"),
      (pmod(graft.functions.Text.hash60(col("doc_id").cast("string"),
        Dedup.DecontamSeed), lit(Dedup.DecontamBenchMod)) === 0).as("is_bench"))
    // benchmark rows are exactly the md5-slice, regardless of quality
    assert(out.filter(col("stage") === "benchmark").count() ==
      bench.filter(col("is_bench")).count())
    // no low-quality doc survives to dedup
    val lowQ = TextAnalysis.t07QualityFilter(spark, sf001)
      .filter(!col("keep")).select("doc_id")
      .join(bench.filter(!col("is_bench")), "doc_id")
    assert(out.filter(col("stage") === "low_quality").count() == lowQ.count())
    // kept rows carry a real split
    assert(out.filter(col("keep") && !col("split").isin("train", "val", "test"))
      .count() == 0)
  }
}
