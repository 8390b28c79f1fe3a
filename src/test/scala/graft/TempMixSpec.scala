package graft

import graft.operators.Sampling

/** x15 fixtures: temperature reweighting on a hand mixture — a rare
  * source upsampled to multiple epochs, the dominant source
  * downsampled, per-doc epochs contiguous from 0, and the gated key
  * exercising BOTH directions on the skewed gate corpus. */
class TempMixSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand mixture: rare source repeats, dominant source thins") {
    // A: 9 docs, B: 1 doc → wt 3/1, B(udget)=10, W=4.
    // rate_A = 10·3/(4·9) < 1 → ef 0, extra-rate 30/36;
    // rate_B = 10/4 = 2.5 → ef 2, extra-rate 0.5.
    val docs = ((1L to 9L).map(i => (i, "srcA")) :+ (100L, "srcB"))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureMix(spark, docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // B's doc gets 2 or 3 epochs (2 full + hash-decided extra).
    assert(byDoc(100L).length >= 2 && byDoc(100L).length <= 3)
    // A's docs each appear at most once (ef = 0).
    for (i <- 1L to 9L if byDoc.contains(i)) assert(byDoc(i) == Seq(0L))
    // Epochs are contiguous from 0 for every doc.
    for ((_, es) <- byDoc) assert(es == (0L until es.length).toSeq)
    // Expected output ≈ budget: exactly B in expectation; the hash
    // realization must keep A strictly below its natural 9.
    assert(out.count(_._2 == "srcA") < 9)
  }

  test("uniform mixture is an exact no-op (rate 1 everywhere)") {
    val docs = (0L until 40L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(spark, docs).collect()
    assert(out.length == 40)
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("gated key: skewed corpus produces both up- and downsampling") {
    val sf01 = "/root/testdata/sf0.01"
    val out = Queries.production("x15_temperature_mix")(spark, sf01)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ups = Queries.production("x15_temperature_mix")(spark, sf01)
      .filter($"epoch" >= 1L).count()
    assert(ups > 0L, "no source was upsampled")
    // The dominant (unskewed) source keeps fewer rows than its data.
    assert(out("src0") < 25L, s"src0 not downsampled: ${out("src0")}")
  }
}
