package graft

/** ANN approximation quality: recall@10 vs the exact e01 ranking.
  * (e02 measured 0.88 on the near-orthogonal synthetic embeddings; floor
  * set with headroom against seed drift.) */
class LshRecallSpec extends SparkSpecBase {

  private def pairs(name: String): Set[(Long, Long)] =
    Queries.production(name)(spark, sf001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet

  test("e02 ANN recall@10 >= 0.8 vs e01 brute force") {
    val exact = pairs("e01_knn_brute")
    val ann = pairs("e02_ann_lsh")
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("scaled-bits d05 stays exact-precision (output is a subset of the all-pairs truth)") {
    // The scale calibration (Similarity.scaledRhpBits) changes CANDIDATE
    // generation only; the exact-cosine verify means any band config has
    // perfect precision — wider bands can only lose recall, never invent
    // pairs. bits=6 on the 5k-vector gate SF is the occupancy the
    // calibration would pick around 13k vectors.
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet(graft.operators.Dedup.d05ExactPairs(spark, sf001))
    val scaled = pairSet(graft.operators.Dedup.d05EmbeddingDedup(spark, sf001, bits = 6))
    assert(scaled.subsetOf(exact))
    assert(scaled.nonEmpty)
    assert(graft.operators.Similarity.scaledRhpBits(200000L) == 12)
    assert(graft.operators.Similarity.scaledRhpBits(200L) == 4) // floored at catalog default
  }

  test("scaled-config recall floor: multi-probe recovers what wider bands lose") {
    // The trade scaledRhpBits documents — per-table recall is p^bits, so
    // each extra bit multiplies it by p < 1. Two recovery levers,
    // asserted with measured numbers, not formula faith, at bits=6 (the
    // calibration's pick around 3k vectors):
    //  - raising L (the pre-r11 story): L=16 measured 0.60 base-bucket-
    //    only here, L=48 measured 0.92;
    //  - MULTI-PROBE (the r11 production lever, on whenever the
    //    calibrated width exceeds the catalog RhpBits): probing the
    //    bits single-bit-flip neighbors lifts per-table recall to
    //    ~p^(b-1)(b−(b−1)p) at fixed L — measured 1.0 at bits=6/L=16 on
    //    this corpus, strictly above the base-only 0.60.
    val exact = pairs("e01_knn_brute")
    def recallAt(bits: Int, l: Int, probe: Boolean): Double = {
      val got = operators.Similarity
        .e02AnnLsh(spark, sf001, bits = bits, tables = l, multiProbe = probe)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val narrow = recallAt(6, 16, probe = false)
    val wide = recallAt(6, 48, probe = false)
    assert(wide >= 0.85, s"recall@10 = $wide at bits=6/L=48 — scaled config below floor")
    assert(wide > narrow,
      s"raising L must recover recall lost to wider bands ($narrow -> $wide)")
    val probed = recallAt(6, 16, probe = true)
    assert(probed > narrow,
      s"multi-probe must beat base-bucket-only at the same L ($narrow -> $probed)")
    assert(probed >= 0.85,
      s"recall@10 = $probed at bits=6/L=16 with multi-probe — below floor")
  }

  test("e03 IVF recall@10 vs e01 beats its scan fraction on learned cells") {
    // Probing 3 of 16 LEARNED cells on near-orthogonal synthetic vectors
    // is IVF's worst case (cell membership barely correlates with
    // similarity); the floor documents that even then, probing the
    // nearest cells beats the 3/16 ≈ 0.19 random-scan baseline. Real
    // clustered embeddings sit far higher.
    val exact = pairs("e01_knn_brute")
    val ivf = pairs("e03_ivf_ann")
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall@10 = $recall")
  }

  test("e08 filtered ANN: predicate honored, top-k is of the FILTERED set") {
    import org.apache.spark.sql.functions._
    // (1) Every returned candidate satisfies the predicate.
    val en = Tables.documents(spark, sf001).filter(col("lang") === "en")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(en.nonEmpty && en.size < 500, "fixture must make the filter selective")
    val got = Queries.production("e08_filtered_ann")(spark, sf001).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => en(r.getAs[Long]("c_id"))),
      "filtered ANN returned a candidate outside the predicate")
    // (2) Recall vs the EXACT filtered brute force (independent
    // derivation — documents x embeddings, no e08 code) clears e03's
    // worst-case probe floor: filtering must not silently truncate the
    // top-k below what cell probing alone loses.
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val cand = e.filter(col("vec_id").isInCollection(en))
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(desc("cosine"), col("c_id"))
    val exactFiltered = q.crossJoin(cand).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(graft.functions.CosineSimilarity(spark, col("qv"), col("cv")), 6)
          .as("cosine"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val gotPairs = got.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val recall = (exactFiltered & gotPairs).size.toDouble / exactFiltered.size
    assert(recall >= 0.25, s"filtered recall@10 = $recall")
  }

  test("e05 IVF×PQ recall and candidate containment vs its parts") {
    // The composition can only SHRINK e04's candidate set (same ADC
    // scores, restricted to probed cells) — so its shortlist, hence its
    // output, may lose only what cell pruning loses. Two properties:
    // (1) every e05 (q,c) pair lies in a probed cell AND survives exact
    // re-rank with the true cosine (checked against e01's map, as e04);
    // (2) recall floor = measured value with seed-drift headroom. On
    // near-orthogonal synthetics both prunings bite at once (worst
    // case); real clustered embeddings sit far higher.
    val exact = pairs("e01_knn_brute")
    val composed = pairs("e05_ivfpq")
    val recall = (exact & composed).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall@10 = $recall")
    val exactScores = Queries.production("e01_knn_brute")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Double]("cosine")).toMap
    for (r <- Queries.production("e05_ivfpq")(spark, sf001).collect()) {
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      exactScores.get(k).foreach { es =>
        assert(r.getAs[Double]("cosine") == es, s"re-ranked score differs for $k")
      }
    }
  }

  test("e04 PQ recall@10 vs e01: ADC shortlist + exact re-rank") {
    // 4×16-dim subspaces quantized to 16 centroids each is coarse on
    // near-orthogonal synthetic vectors (the hardest case for PQ — the
    // quantization error is as large as the signal), but the 3×-deep
    // exact re-rank keeps the true neighbors that ADC ranks loosely.
    // The floor documents measured behavior with headroom for seed
    // drift; real clustered embeddings sit far higher.
    val exact = pairs("e01_knn_brute")
    val pq = pairs("e04_pq_ann")
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 = $recall")
    // every returned pair must carry its EXACT cosine (re-rank contract):
    // e04 scores present in e01's map must match exactly
    val exactScores = Queries.production("e01_knn_brute")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) -> r.getAs[Double]("cosine")).toMap
    val pqRows = Queries.production("e04_pq_ann")(spark, sf001).collect()
    for (r <- pqRows) {
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      exactScores.get(k).foreach { es =>
        assert(r.getAs[Double]("cosine") == es, s"re-ranked score differs for $k")
      }
    }
  }
}
