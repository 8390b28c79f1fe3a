package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.Retrieval

/** e09 BM25 semantics on planted fixtures plus the one-corpus-exchange
  * plan claim. */
class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  // 30 docs, cap df <= 3: doc 0 is the query (0 % QueryEvery == 0);
  // docs 1/2 share its "alpha beta" bigram with tf 3 and 1; docs 3..29
  // all carry "hot hot" (df 28 > 3 -> stop term, dropped) which doc 0
  // also contains — without the cap they would all be hits.
  private def fixture = {
    val rows = Seq(
      (0L, "alpha beta gamma hot hot"),
      (1L, "alpha beta alpha beta alpha beta"),
      (2L, "alpha beta x0 x0")) ++
      (3L to 29L).map(i => (i, s"hot hot u$i v$i"))
    rows.toDF("doc_id", "text")
  }

  test("bm25: tf ranks, df cap drops hot terms, self excluded, ties impossible by id") {
    val out = Retrieval.bm25TopK(spark, fixture)
      .orderBy("q_id", "rnk").collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(0L), s"only doc 0 is a query, got ${byQ.keySet}")
    val hits = byQ(0L).map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id")))
    // only the "alpha beta" sharers match (the hot bigram is capped
    // away); tf=3/dl=5 beats tf=1/dl=3 under BM25's saturation
    assert(hits.toSeq == Seq((1L, 1L), (2L, 2L)),
      s"expected docs 1,2 in that order, got ${hits.toSeq}")
    val s1 = byQ(0L).find(_.getAs[Long]("rnk") == 1L).get.getAs[Double]("score")
    val s2 = byQ(0L).find(_.getAs[Long]("rnk") == 2L).get.getAs[Double]("score")
    assert(s1 > s2 && s2 > 0.0)
  }

  test("bm25 scores are exact-integer micros: partitioning cannot change them") {
    val a = Retrieval.bm25TopK(spark, fixture).collect().toSet
    val b = Retrieval.bm25TopK(spark, fixture.repartition(7)).collect().toSet
    assert(a == b, "scores/ranks must be partitioning-independent")
  }

  test("e09 production: ONE corpus-wide exchange, the rest candidate-bounded; no window") {
    val df = Queries.production("e09_bm25_topk")(spark, sf001)
    // Execute THIS QueryExecution (a write would plan a fresh one), so
    // AQE finalizes in place and runtime exchange reuse is visible.
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    // repartition(tok) + per-(q,doc) sum + per-q topk = 3 real
    // exchanges; the tf/df/query consumers must REUSE the tok exchange
    // (ReusedExchange), not replay the corpus scan.
    assert(shuffles.size <= 3,
      s"expected <= 3 exchanges (tok/agg/topk), got ${shuffles.size}")
    assert(nodes.exists(_.nodeName.toLowerCase.contains("reusedexchange")),
      "tf consumers must reuse the single tok exchange")
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("window")),
      "e09 must not plan a window")
  }
}
