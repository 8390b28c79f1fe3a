package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Incremental}

/** Round-19 optimization probe: per-step wall time of x19's composed
  * chain PLUS the digit count of each carried frame's Catalyst
  * sizeInBytes estimate — the evidence for the checkpoint-stats
  * carry-over pathology (see GraftCheckpointStats). Temporary
  * diagnostic main, deleted with X19Probe once the fix is anchored. */
object X19StatsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[x19stats] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%9.2f s")
      a
    }
    def digits(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length
    def stateDigits(tag: String, st: Curation.CurationState): Unit =
      println(s"[x19stats] $tag stats-digits: " +
        s"decisions=${digits(st.decisions)} bands=${digits(st.bands)} " +
        s"shingles=${digits(st.shingles)} pairs=${digits(st.pairs)} " +
        s"quality=${digits(st.quality)} splits=${digits(st.splits)} " +
        s"benchGrams=${digits(st.benchGrams)} cleanGrams=${digits(st.cleanGrams)}")

    val docs = Tables.documents(s, d)
    val b1 = pmod(col("doc_id"), lit(Incremental.IngestMod)) === 0
    val b2n = pmod(col("doc_id"), lit(Incremental.IngestMod)) ===
      Incremental.ComposedBatch2Res
    val base = docs.filter(!b1 && !b2n)
    val total0 = System.nanoTime()
    val decisions0 = t("decisions0") {
      graft.Checkpoints.cut(Curation.curationDecideDocs(s, base))
    }
    val st0 = t("st0") {
      Curation.cutState(Curation.curationStateFrom(s, base, decisions0))
    }
    stateDigits("st0", st0)
    val st1 = t("merge1") { Curation.mergeCurationState(s, st0, docs.filter(b1)) }
    stateDigits("st1", st1)
    val st2 = t("delete") {
      Curation.deleteCurationState(s, st1, Curation.deleteSlice(docs))
    }
    stateDigits("st2", st2)
    val batch2 = docs.filter(b2n ||
      (col("doc_id") % Incremental.DeleteMod === Incremental.DeleteRes &&
        col("doc_id") % Incremental.ComposedReingestMod === 0))
    val st3 = t("merge2") { Curation.mergeCurationState(s, st2, batch2) }
    stateDigits("st3", st3)
    t("final-noop") {
      st3.decisions.write.format("noop").mode("overwrite").save()
    }
    println(f"[x19stats] TOTAL ${(System.nanoTime() - total0) / 1e9}%9.2f s")
    println("[x19stats] final decisions explain:")
    println(st3.decisions.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    s.stop()
  }
}
