package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Curation operator invariants beyond the oracle gate (SURVEY §2.H). */
class SamplingSpec extends SparkSpecBase {

  test("x01: kept rows satisfy their stratum's rate; sample is a strict subset") {
    val total = Tables.documents(spark, sf001).count()
    val kept = Queries.production("x01_hash_sample")(spark, sf001)
    val n = kept.count()
    assert(n > 0 && n < total, s"sample $n of $total")
    // per-stratum membership rule holds row-by-row
    assert(kept.filter(col("lang") === "en" &&
      col("bucket") >= Sampling.RateEn).count() == 0)
    assert(kept.filter(col("lang") === "zh" &&
      col("bucket") >= Sampling.RateZh).count() == 0)
    assert(kept.filter(col("bucket") >= Sampling.RateDefault).count() == 0)
    // non-downsampled strata are kept in full
    val fr = Tables.documents(spark, sf001).filter(col("lang") === "fr").count()
    assert(kept.filter(col("lang") === "fr").count() == fr)
  }

  test("x03: KMV estimate is exact under k and within 20% on a 20k-token corpus") {
    import spark.implicits._
    // synthetic stratum with KNOWN cardinality far above k=256: 20k
    // distinct tokens spread over 200 docs -> estimator error ~1/sqrt(k)
    val docs = (0 until 200).map { d =>
      ("syn", (0 until 100).map(t => s"tok_${d}_$t").mkString(" "))
    }.toDF("lang", "text")
    val row = Sampling.kmvDistinct(docs).collect()(0)
    assert(row.getAs[Long]("n_exact") == 20000L)
    val est = row.getAs[Double]("kmv_estimate")
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"KMV estimate $est")
    // under k the sketch IS the exact answer
    val small = Sampling.kmvDistinct(Seq(("s", "a b c a")).toDF("lang", "text"))
      .collect()(0)
    assert(small.getAs[Long]("n_exact") == 3L)
    assert(small.getAs[Double]("kmv_estimate") == 3.0)
  }

  test("x02: packs cover every doc once, in order, overflowing only by a straddling doc") {
    val packs = Queries.production("x02_seq_pack")(spark, sf001)
    // complete coverage: every document lands in exactly one pack
    val total = Tables.documents(spark, sf001).count()
    assert(packs.agg(sum("n_docs")).collect()(0).getLong(0) == total)
    // within a shard: pack numbers start at 0 and strictly increase, and
    // doc ranges of consecutive packs are disjoint and ordered (dense
    // numbering is NOT asserted — a doc longer than the budget may
    // legitimately skip a pack number under chunking semantics)
    val byShard = packs.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pack_no"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
      .groupBy(_._1).values
    assert(byShard.nonEmpty)
    for (shard <- byShard) {
      val ordered = shard.sortBy(_._2)
      assert(ordered.head._2 == 0L, s"first pack of a shard must be 0: ${ordered.head}")
      for (pair <- ordered.sliding(2) if pair.length == 2) {
        val (a, b) = (pair(0), pair(1))
        assert(a._2 < b._2)
        assert(a._4 < b._3,
          s"doc ranges must be disjoint and ordered across packs: $a then $b")
      }
    }
    // a pack holds < budget tokens before its last (possibly straddling)
    // doc starts — so pack_tokens < PackTokens + max doc length
    val maxDoc = Tables.documents(spark, sf001)
      .select(max(size(graft.functions.Text.tokens(col("text")))))
      .collect()(0).getInt(0).toLong
    val worst = packs.agg(max("pack_tokens")).collect()(0).getLong(0)
    assert(worst < Sampling.PackTokens + maxDoc,
      s"pack of $worst tokens exceeds budget+straddle bound")
  }

  test("x04: quota binds per source, under-quota sources keep everything") {
    import spark.implicits._
    // source A: 10 docs with quota 4 -> exactly the 4 smallest hashes;
    // source B: 2 docs under quota -> all kept, ranks dense from 1.
    val docs = ((1L to 10L).map(i => (i, "A")) ++ Seq((100L, "B"), (101L, "B")))
      .toDF("doc_id", "source")
    val out = Sampling.quotaSample(spark, docs, quota = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val a = out.filter(_._1 == "A")
    val b = out.filter(_._1 == "B")
    assert(a.length == 4 && b.length == 2)
    assert(a.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(b.map(_._3).sorted.toSeq == Seq(1L, 2L))
    // picks are exactly the quota smallest (hash, id) — mirror the rule
    val hashes = docs.filter(col("source") === "A")
      .select(col("doc_id"),
        graft.functions.Text.hash60(col("doc_id").cast("string"),
          Sampling.QuotaSeed).as("h"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).sorted
    assert(a.sortBy(_._3).map(_._2).toSeq == hashes.take(4).map(_._2).toSeq,
      "pick set and rank order must follow ascending (hash, id)")
    // the cataloged key respects the production quota on real data
    val full = Queries.production("x04_quota_sample")(spark, sf001)
    val maxPer = full.groupBy("source").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPer <= Sampling.QuotaPerSource)
  }

  test("x05: every doc gets exactly one split, by its bucket, stable across runs") {
    val out = Queries.production("x05_strat_split")(spark, sf001)
    assert(out.count() == Tables.documents(spark, sf001).count(),
      "a split is a partition of the corpus: nothing dropped, nothing doubled")
    assert(out.select("doc_id").distinct().count() == out.count())
    // the split label is exactly the bucket rule
    assert(out.filter(
      (col("bucket") < Sampling.TrainPct && col("split") =!= "train") ||
      (col("bucket") >= Sampling.TrainPct &&
        col("bucket") < Sampling.TrainPct + Sampling.ValPct && col("split") =!= "val") ||
      (col("bucket") >= Sampling.TrainPct + Sampling.ValPct && col("split") =!= "test"))
      .count() == 0)
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
    // determinism: a second evaluation assigns identical splits
    val again = Queries.production("x05_strat_split")(spark, sf001)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("x06: mixture keeps the binding source whole and downsamples the rest toward target shares") {
    import spark.implicits._
    // src0 wt=1 n=100, src1 wt=2 n=10 (binding), src2 wt=3 n=50; W=6,
    // T = min(600, 30, 100) = 30 -> expected keeps ~ (5, 10, 15).
    val docs = ((0 until 100).map(i => (i.toLong, "src0")) ++
      (100 until 110).map(i => (i.toLong, "src1")) ++
      (110 until 160).map(i => (i.toLong, "src2"))).toDF("doc_id", "source")
    val kept = Sampling.sourceMix(spark, docs).collect()
    val bySrc = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // the binding source is never downsampled
    assert(bySrc.getOrElse("src1", 0) == 10, s"binding source: $bySrc")
    // hash-threshold keeps are binomial around the exact targets (5, 15):
    // allow a wide-but-meaningful band; determinism is what's exact.
    assert(bySrc.getOrElse("src0", 0) <= 15 && bySrc.getOrElse("src0", 0) >= 1, s"$bySrc")
    assert(bySrc.getOrElse("src2", 0) <= 28 && bySrc.getOrElse("src2", 0) >= 5, s"$bySrc")
    // a second evaluation keeps the identical set
    val again = Sampling.sourceMix(spark, docs).collect()
    assert(kept.map(_.getLong(0)).sorted.sameElements(again.map(_.getLong(0)).sorted))
    // on the real corpus: nonempty strict subset
    val full = Queries.production("x06_source_mix")(spark, sf001)
    val n = full.count()
    assert(n > 0 && n < Tables.documents(spark, sf001).count())
  }

  test("x12: keeper is the lexicographic-min (doc, chunk); unique chunks are not emitted") {
    import spark.implicits._
    val chunks = Seq(
      (5L, 0L, "aaa"), (5L, 2L, "aaa"), // same doc twice: keeper (5,0), n_docs 1
      (9L, 1L, "bbb"), (3L, 7L, "bbb"), (3L, 2L, "bbb"), // keeper (3,2): min doc THEN min chunk
      (1L, 0L, "unique")
    ).toDF("doc_id", "chunk_no", "chunk_md5")
    val out = Sampling.chunkDedup(chunks).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(("aaa", 5L, 0L, 2L, 1L), ("bbb", 3L, 2L, 3L, 2L)))
  }

  test("x12 production: every duplicated fingerprint spans the doubled corpus pair") {
    val out = Queries.production("x12_chunk_dedup")(spark, sf001)
    // the doubled corpus plants an exact +1000000 copy of every doc, so
    // every chunk fingerprint occurs >= 2 times and keepers are originals
    val x10 = Queries.production("x10_seq_chunk")(spark, sf001)
    assert(out.count() > 0)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_copies")).head().getLong(0)
      == 2 * x10.count(), "doubling must account for every chunk occurrence")
    assert(out.filter(col("keep_doc") >= 1000000L).count() == 0,
      "keeper must always be the original, not the planted copy")
  }

  test("x06: a source name with no trailing digits defaults to wt=1 instead of NPE") {
    import spark.implicits._
    // regexp_extract misses -> null int; the driver-side fold must see a
    // defined weight (coalesce to 0 -> wt 1), not throw on getLong.
    val docs = ((0 until 40).map(i => (i.toLong, "web")) ++
      (40 until 50).map(i => (i.toLong, "src1"))).toDF("doc_id", "source")
    val kept = Sampling.sourceMix(spark, docs).collect()
    assert(kept.nonEmpty)
    // wt("web") = 1, n=40; wt("src1") = 2, n=10 -> W=3, T=min(120,15)=15;
    // src1 binds and is kept whole.
    assert(kept.count(_.getString(1) == "src1") == 10)
  }
}
