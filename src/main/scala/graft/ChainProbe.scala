package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-19 optimization probe: wall time of each STEP of the composed
  * lifecycle chains (x19 curation, d17 groups). Steps materialize
  * eagerly through their cuts, so timing the call prices the step's
  * own work (guide §1). Temporary diagnostic — deleted at round close. */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local()
    def t[A](tag: String)(f: => A): A = {
      s.sparkContext.setJobDescription(s"chain: $tag")
      val t0 = System.nanoTime()
      val r = f
      println(f"[chain] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      s.sparkContext.setJobDescription(null)
      r
    }
    def runX19(): Unit = {
      val docs = Tables.documents(s, d)
      val b1 = pmod(col("doc_id"), lit(Incremental.IngestMod)) === 0
      val b2n = pmod(col("doc_id"), lit(Incremental.IngestMod)) ===
        Incremental.ComposedBatch2Res
      val base = docs.filter(!b1 && !b2n)
      val isBench = pmod(graft.functions.Text.hash60(
        col("doc_id").cast("string"), Dedup.DecontamSeed),
        lit(Dedup.DecontamBenchMod)) === 0
      val st0 = t("x19 base(curationBase)") {
        Curation.cutState(Curation.curationBase(s, base))
      }
      val st1 = t("x19 merge1") {
        Curation.mergeCurationState(s, st0, docs.filter(b1))
      }
      val st2 = t("x19 delete") {
        Curation.deleteCurationState(s, st1, Curation.deleteSlice(docs))
      }
      val batch2 = docs.filter(b2n ||
        (col("doc_id") % Incremental.DeleteMod === Incremental.DeleteRes &&
          !isBench && col("doc_id") % Incremental.ComposedReingestMod === 0))
      val st3 = t("x19 merge2") {
        Curation.mergeCurationState(s, st2, batch2)
      }
      t("x19 final noop") {
        st3.decisions.write.format("noop").mode("overwrite").save()
      }
    }
    def runD17(): Unit = {
      val (base, (ids1, sh1), delIds, (ids2, sh2)) =
        Incremental.composedSliceInputs(s, d)
      def cutState(st: Incremental.GroupLifecycleState) =
        Incremental.GroupLifecycleState(graft.Checkpoints.cut(st.labels),
          st.pairs, st.bands, st.shingles)
      val st0 = t("d17 base(groupLifecycleOf)") {
        Incremental.groupLifecycleOf(s, base)
      }
      val st1 = t("d17 append1") {
        cutState(Incremental.appendGroupLifecycle(s, st0, ids1, sh1))
      }
      val st2 = t("d17 delete") {
        cutState(Incremental.deleteGroupLifecycle(s, st1, delIds))
      }
      val labels = t("d17 append2") {
        Incremental.appendGroupLifecycle(s, st2, ids2, sh2).labels
      }
      t("d17 resolve noop") {
        Incremental.resolveGroups(labels)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // warmup then timed (bench methodology)
    runX19(); println("[chain] ---- timed x19 ----"); runX19()
    runD17(); println("[chain] ---- timed d17 ----"); runD17()
    s.stop()
  }
}
