package graft

/** Dev probe (test scope, not shipped): the e02 multi-probe DEPTH curve
  * at an arbitrary sf dir — recall@10 vs exact e01, candidate volume,
  * and wall seconds for probe radius 0 (base bucket only), 1 (the
  * catalog operating point: all single-bit flips), and 2 (all two-bit
  * flips), with e03/e05 recall+cost alongside as the frontier
  * comparison. `Test/runMain graft.ProbeCurveMain <sfDir>`; one JSON
  * line on stdout, recorded in BENCH.md.
  */
object ProbeCurveMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf10")
    val spark = Sessions.local()
    val bits = operators.Similarity.calibratedRhpBits(spark, d)
    val shortlist = operators.Similarity.calibratedPqShortlist(spark, d)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def timedPairs(df: => org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val p = pairs(df.select("q_id", "c_id"))
      (p, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, tExact) = timedPairs(operators.Similarity.e01KnnBrute(spark, d))
    def recall(p: Set[(Long, Long)]): Double =
      math.round((exact & p).size.toDouble / exact.size * 10000) / 10000.0
    val radii = Seq(0, 1, 2).map { r =>
      val nProbes = operators.Similarity.probeMasks(bits, r).size
      val (p, sec) = timedPairs(
        operators.Similarity.e02AnnLsh(spark, d, bits = bits, probeRadius = r))
      (r, nProbes, recall(p), sec)
    }
    val (p03, t03) = timedPairs(operators.Similarity.e03IvfAnn(spark, d))
    val (p05, t05) = timedPairs(operators.Similarity.e05IvfPq(spark, d, shortlist))
    val rj = radii.map { case (r, np, rec, sec) =>
      s"""{"radius":$r,"probes_per_table":$np,"recall":$rec,"sec":${math.round(sec * 10) / 10.0}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"e02_probe_curve","sf":"$d","bits":$bits,""" +
      s""""n_exact":${exact.size},"e01_sec":${math.round(tExact * 10) / 10.0},""" +
      s""""e02":$rj,""" +
      s""""e03":{"recall":${recall(p03)},"sec":${math.round(t03 * 10) / 10.0}},""" +
      s""""e05":{"recall":${recall(p05)},"sec":${math.round(t05 * 10) / 10.0}}}""")
    spark.stop()
  }
}
