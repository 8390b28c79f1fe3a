package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-19 optimization probe: noop-timed cost of each corpus pass the
  * curation family composes (guide §1.4), to size the shared-pass reuse
  * before changing anything. Bench methodology (warmup + min-of-2) so
  * numbers are comparable to BENCH_LOCAL. Temporary diagnostic main —
  * deleted at round close; the numbers land in OPTIMIZATION_r19.md. */
object CurationPieceProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local()
    def t(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      s.sparkContext.setJobDescription(s"piece: $tag")
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val v = math.min(once(), once())
      println(f"[piece] $tag%-28s $v%8.2f s")
      s.sparkContext.setJobDescription(null)
    }
    val docs = Tables.documents(s, d)
    val mod = Incremental.IngestMod
    val base = docs.filter(!(pmod(col("doc_id"), lit(mod)) === 0))
    val isBench = pmod(graft.functions.Text.hash60(
      col("doc_id").cast("string"), Dedup.DecontamSeed),
      lit(Dedup.DecontamBenchMod)) === 0
    def gramsOf(dd: org.apache.spark.sql.DataFrame) = dd
      .select(col("doc_id"),
        explode(graft.functions.GraftShingles(s, col("text"), Dedup.DecontamN)).as("g"))
      .select(col("doc_id"),
        graft.functions.Text.hash60(col("g"), Dedup.DecontamSeed).as("gh"))
      .distinct()

    t("shingledDocs(base)") { Dedup.shingledDocs(s, base) }
    t("minhashBands(sh)") { Dedup.minhashBands(Dedup.shingledDocs(s, base)) }
    t("lshPairs(sh)") { Dedup.minhashLshPairs(s, Dedup.shingledDocs(s, base)) }
    t("qualityFilter(t07)") {
      TextAnalysis.qualityFilter(s, base.select(col("doc_id"), col("text")))
    }
    t("qualityScore(t02)") { TextAnalysis.qualityScore(base) }
    t("stratSplit(x05)") { Sampling.stratSplit(base) }
    t("gramsOf(base)") { gramsOf(base) }
    t("contam leftsemi") {
      val g = gramsOf(base)
      val bg = g.join(base.filter(isBench).select("doc_id"), "doc_id")
        .select("gh").distinct()
      g.join(base.filter(!isBench).select("doc_id"), "doc_id")
        .join(bg, Seq("gh"), "leftsemi").select("doc_id").distinct()
    }
    t("decontaminate(d07)") {
      Dedup.decontaminate(s,
        base.select(col("doc_id"), col("text"), isBench.as("is_bench")))
    }
    t("x08 decide(base)") { Curation.curationDecideDocs(s, base) }
    s.stop()
  }
}
