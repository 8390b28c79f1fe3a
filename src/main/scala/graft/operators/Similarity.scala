package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{CosineSimilarity, RhpBucket, TopKByScore, Vec}

/** Similarity search over the embeddings table (SURVEY §2.C).
  *
  * The scoring hot path is the native codegen'd [[CosineSimilarity]]
  * expression (fused single-pass loop) — bit-identical to the portable
  * [[Vec.cosine]] form the oracle mirrors.
  *
  * Scale notes:
  *  - e01 broadcasts the (small) query set, so scoring is map-side only —
  *    the only shuffle is the per-query top-k window over the scored
  *    (n_queries × corpus) frame.
  *  - e02 buckets both sides with L=4 deterministic random-hyperplane
  *    tables (6 bits each) and scores only within-bucket candidates —
  *    the shuffle key is (table, bucket), never all-pairs. Recall vs e01
  *    is spec-tested (LshRecallSpec).
  */
object Similarity {

  private val K = 10

  private def rounded(s: SparkSession, a: Column, b: Column): Column =
    round(CosineSimilarity(s, a, b), 6)

  /** Per-query top-k via the bounded [[TopKByScore]] aggregate: map-side
    * partial top-k means at most k rows per (query, partition) reach the
    * shuffle — the row_number-window form would shuffle and sort EVERY
    * scored candidate. Output identical (score DESC, id ASC ranking). */
  private def topK(s: SparkSession, scored: DataFrame): DataFrame =
    scored.groupBy("q_id")
      .agg(TopKByScore(s, struct(col("cosine"), col("c_id")), K).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("c_id"), col("t.score").as("cosine"),
        (col("pos") + 1).cast("bigint").as("rnk"))

  /** e01: brute-force cosine top-k — every corpus vector scored against
    * every query (queries = vec_id % 100 == 0), exact ranking. */
  def e01KnnBrute(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") % 100 === 0).toDF("q_id", "qv")
    val c = e.toDF("c_id", "cv")
    topK(s, c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), rounded(s, col("qv"), col("cv")).as("cosine")))
  }

  /** e02: LSH-bucketed approximate top-k — candidates share a
    * random-hyperplane bucket in at least one of L tables. Approximate:
    * driver records a rows-only check; recall is spec-asserted vs e01.
    * (bits=4, L=16 measured recall@10 ≈ 0.88 on the synthetic embeddings,
    * which are near-orthogonal — real clustered embeddings need fewer
    * tables for the same recall.) */
  def e02AnnLsh(s: SparkSession, d: String): DataFrame = {
    val L = 16; val bits = 4; val dim = 64
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val bucketed = e.select(col("vec_id"), col("embedding"),
      explode(array((0 until L).map(t => struct(lit(t).as("tbl"),
        RhpBucket(s, col("embedding"), bits, dim, 1000 + t * bits)
          .as("bkt"))): _*)).as("x"))
      .select(col("vec_id"), col("embedding"),
        col("x.tbl").as("tbl"), col("x.bkt").as("bkt"))
    val q = bucketed.filter(col("vec_id") % 100 === 0)
      .toDF("q_id", "qv", "tbl", "bkt")
    val c = bucketed.toDF("c_id", "cv", "tbl2", "bkt2")
    val cand = broadcast(q)
      .join(c, col("tbl") === col("tbl2") && col("bkt") === col("bkt2") &&
        col("q_id") =!= col("c_id"))
      .select("q_id", "qv", "c_id", "cv").distinct()
    topK(s, cand
      .select(col("q_id"), col("c_id"), rounded(s, col("qv"), col("cv")).as("cosine")))
  }

  /** e03: IVF-style ANN — coarse cells (here: the label column; a
    * k-means quantizer slots in identically), exact per-cell centroids,
    * probe the top-3 nearest cells per query, scan only those cells.
    * At scale the corpus is partitioned by cell id, so a query touches
    * `probe/cells` of the data. Deterministic end-to-end (centroid means
    * use exact scaled-integer sums, order-independent), so unlike most
    * ANN this one is oracle-gated exactly.
    */
  def e03IvfAnn(s: SparkSession, d: String): DataFrame = {
    val Probe = 3
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"), col("label"))
    // Cell centroids: per (cell, position), an exact order-independent
    // mean — components quantized to 1e-6 via floor(v*1e6) so the bigint
    // sum is exact in any engine and any partitioning.
    val centroids = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("label"), col("i"),
        floor(col("v").cast("double") * lit(1000000.0)).cast("bigint").as("sv"))
      .groupBy("label", "i")
      .agg(sum("sv").as("ssum"), count(lit(1)).as("n"))
      .select(col("label"), col("i"),
        (col("ssum").cast("double") / (col("n").cast("double") * lit(1000000.0))).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        x => x.getField("c")).as("cv"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    // Probe assignment: top-Probe cells by centroid cosine (portable
    // cosine — the centroid table is tiny; ties broken by cell id).
    val probed = q.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("label"),
        round(Vec.cosine(col("qv"), col("cv")), 6).as("cscore"))
      .groupBy("q_id")
      .agg(TopKByScore(s, struct(col("cscore"), col("label").cast("bigint")), Probe)
        .as("cells"))
      .select(col("q_id"), explode(col("cells")).as("cell"))
      .select(col("q_id"), col("cell.id").cast("int").as("label"))
    // In-cell scan: score only vectors in probed cells, native cosine.
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv2"), col("label"))
    val scored = broadcast(probed.join(q, "q_id")).join(c, Seq("label"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), rounded(s, col("qv"), col("cv2")).as("cosine"))
    topK(s, scored)
  }
}
