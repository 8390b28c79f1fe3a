package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Incremental}

/** Dev probe: per-step wall time of x19's composed chain (temporary
  * diagnostic main; keys the BENCH.md cost narrative). */
object X19Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(s"[x19probe] $tag ${(System.nanoTime() - t0) / 1e9}")
      a
    }
    val docs = Tables.documents(s, d)
    val b1 = pmod(col("doc_id"), lit(Incremental.IngestMod)) === 0
    val b2n = pmod(col("doc_id"), lit(Incremental.IngestMod)) ===
      Incremental.ComposedBatch2Res
    val base = docs.filter(!b1 && !b2n)
    val decisions0 = t("decisions0") {
      graft.Checkpoints.cut(Curation.curationDecideDocs(s, base))
    }
    val st0 = t("st0") {
      Curation.cutState(Curation.curationStateFrom(s, base, decisions0))
    }
    val st1 = t("merge1") { Curation.mergeCurationState(s, st0, docs.filter(b1)) }
    val st2 = t("delete") {
      Curation.deleteCurationState(s, st1, Curation.deleteSlice(docs))
    }
    val batch2 = docs.filter(b2n ||
      (col("doc_id") % Incremental.DeleteMod === Incremental.DeleteRes &&
        col("doc_id") % Incremental.ComposedReingestMod === 0))
    val p = t("merge2-parts") { Curation.mergeParts(s, st2, batch2) }
    t("merge2-stagedB-count") { p.stagedB.count() }
    t("merge2-removed-count") { p.removed.count() }
    t("merge2-newpairs-count") { p.newPairs.count() }
    t("merge2-relabel-count") { p.relabel.count() }
    val decPlan = Curation.mergedDecisionsFromForSpec(st2, p)
    val ex = decPlan.queryExecution.executedPlan.toString
    println(s"[x19probe] merge2-decisions plan nodes=${ex.linesIterator.size} " +
      s"bnlj=${ex.contains("BroadcastNestedLoopJoin")} " +
      s"cart=${ex.contains("CartesianProduct")} " +
      s"smj=${"SortMergeJoin".r.findAllIn(ex).size} " +
      s"gen=${"Generate".r.findAllIn(ex).size} " +
      s"scans=${"Scan ExistingRDD".r.findAllIn(ex).size} " +
      s"parquet=${"Scan parquet".r.findAllIn(ex).size}")
    t("m2-oldUntouched") { p.oldUntouched.count() }
    t("m2-untouchedFinal") {
      p.oldUntouched.join(p.relabel, Seq("lbl"), "left").count()
    }
    t("m2-survivorFinal") { p.survivorFinal.count() }
    t("m2-batchFinal") { p.batchFinal.count() }
    t("m2-qualityFull") {
      p.quality.write.format("noop").mode("overwrite").save()
    }
    t("m2-splitsFull") {
      p.splits.write.format("noop").mode("overwrite").save()
    }
    t("m2-labels-join-quality") {
      p.oldUntouched.join(p.relabel, Seq("lbl"), "left")
        .select(col("doc_id"), coalesce(col("nl"), col("lbl")).as("lbl"))
        .unionByName(p.survivorFinal).unionByName(p.batchFinal)
        .join(p.quality, "doc_id").write.format("noop").mode("overwrite").save()
    }
    val dec3 = t("merge2-decisions-cut") {
      graft.Checkpoints.cut(decPlan)
    }
    t("merge2-quality-count") { p.quality.count() }
    t("merge2-splits-count") { p.splits.count() }
    t("final-noop") {
      dec3.write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
