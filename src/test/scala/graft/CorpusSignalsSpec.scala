package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Similarity, TextAnalysis}

/** Unit semantics of the round-8 corpus-level signals: t08 rare-token
  * scoring, d10 duplicated-span stats, e07 cluster purity, x07
  * datasheet cube. Engineered literal corpora pin the counting rules;
  * the oracle gate pins cross-engine exactness. */
class CorpusSignalsSpec extends SparkSpecBase {
  import spark.implicits._

  // --- t08 -----------------------------------------------------------

  test("t08: rarity is corpus-relative — tf<=2 rare, tf==1 hapax, hot tokens never counted") {
    // corpus tf: "the"=4 (hot), "cat"=2 (rare), "dog"=2 (rare),
    // "qwzx"=1 (hapax), "vbnm"=1 (hapax)
    val docs = Seq(
      (1L, "the cat the dog"),   // rare: cat,dog  hapax: none
      (2L, "the cat qwzx"),      // rare: cat,qwzx hapax: qwzx
      (3L, "the dog vbnm")       // rare: dog,vbnm hapax: vbnm
    ).toDF("doc_id", "text")
    val r = TextAnalysis.rareTokenScore(docs)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(4L, 3L, 3L))        // n_tokens
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 2L, 2L))        // n_rare
    assert(r.map(_.getLong(3)).toSeq == Seq(0L, 1L, 1L))        // n_hapax
    assert(r(0).getDouble(4) == 0.5)                            // 2/4
    assert(r(1).getDouble(4) == 0.666667)                       // round(2/3, 6)
  }

  // --- t10 -----------------------------------------------------------

  test("t10: junk scores high surprisal, common phrasing low; zero-bigram docs survive") {
    // corpus bigram counts (T2 = 12): "a b"=5, "b a"=3, uniques=1 each.
    // bits = len(bin(T2 div c12)) - 1: ab -> 12 div 5 = 2 -> 1 bit;
    // ba -> 4 -> 2 bits; uniques -> 12 -> 3 bits.
    val docs = Seq(
      (1L, "a b a b a b a b"),    // 7 bigrams: 4x ab(1) + 3x ba(2) = 10
      (2L, "a b q1 q2 q3 q4"),    // 5 bigrams: ab(1) + 4 uniques(3) = 13
      (3L, "solo")                // no bigram
    ).toDF("doc_id", "text")
    val r = TextAnalysis.ngramLmScore(spark, docs).orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("n_bigrams")).toSeq == Seq(7L, 5L, 0L))
    assert(r.map(_.getAs[Long]("sum_bits")).toSeq == Seq(10L, 13L, 0L))
    assert(r.map(_.getAs[Long]("max_bits")).toSeq == Seq(2L, 3L, 0L))
    assert(r.map(_.getAs[Long]("n_rare_bigrams")).toSeq == Seq(0L, 4L, 0L))
    assert(r(0).getAs[Double]("mean_bits") == 1.428571) // round(10/7, 6)
    assert(r(1).getAs[Double]("mean_bits") == 2.6)
    assert(r(2).getAs[Double]("mean_bits") == 0.0)
    // the quality DIRECTION: shuffled-junk doc > looping-phrase doc
    assert(r(1).getAs[Double]("mean_bits") > r(0).getAs[Double]("mean_bits"))
  }

  // --- t11 -----------------------------------------------------------

  test("t11: tf-idf keyword ranking — shared bigrams demoted, ties break term-ASC") {
    // N=3. df("a b")=2 -> idf 3/5 -> micros tf*600000; df=1 terms ->
    // idf 5/3 -> micros tf*5e6 DIV 3 = 1666666.
    val docs = Seq(
      (1L, "a b a b c d"), // tf: "a b"=2, "b a"=1, "b c"=1, "c d"=1
      (2L, "a b x y"),
      (3L, "p q")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfKeywords(spark, docs).orderBy("doc_id", "rnk").collect()
    val d1 = r.filter(_.getAs[Long]("doc_id") == 1L)
      .map(x => (x.getAs[Long]("rnk"), x.getAs[String]("term"),
        x.getAs[Double]("tfidf"))).toSeq
    assert(d1 == Seq((1L, "b a", 1.666666), (2L, "b c", 1.666666),
      (3L, "c d", 1.666666), (4L, "a b", 1.2)), s"got $d1")
    val d2 = r.filter(_.getAs[Long]("doc_id") == 2L)
      .map(x => (x.getAs[Long]("rnk"), x.getAs[String]("term"))).toSeq
    assert(d2 == Seq((1L, "b x"), (2L, "x y"), (3L, "a b")), s"got $d2")
    assert(r.count(_.getAs[Long]("doc_id") == 3L) == 1)
  }

  test("t11: per-doc keyword list cut to KeywordK by (score, term) order") {
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfKeywords(spark, docs).orderBy("rnk").collect()
    assert(r.length == TextAnalysis.KeywordK)
    assert(r.map(_.getAs[String]("term")).toSeq ==
      Seq("t1 t2", "t2 t3", "t3 t4", "t4 t5", "t5 t6"))
  }

  test("t08: all-hot corpus yields zero rare counts, not dropped rows") {
    val docs = Seq((1L, "a a a"), (2L, "a a"), (3L, "a")).toDF("doc_id", "text")
    val r = TextAnalysis.rareTokenScore(docs).orderBy("doc_id").collect()
    assert(r.length == 3)
    assert(r.forall(x => x.getLong(2) == 0L && x.getDouble(4) == 0.0))
  }

  // --- d10 -----------------------------------------------------------

  test("d10: shared 8-token span marks both docs dup; only the later one is masked") {
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (10L, span + " alpha"),      // 2 windows; only the pure span window
      (20L, span + " beta"),       //   is shared between docs 10 and 20
      (30L, "totally different words with no overlap at all")
    ).toDF("doc_id", "text")
    val r = Dedup.spanDupStats(spark, docs).orderBy("doc_id").collect()
    // doc 10: windows = [span, "two...alpha"] -> n_spans=2, shared=1, keeper
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 1L && r(0).getLong(3) == 0L)
    assert(r(0).getDouble(4) == 0.5)
    // doc 20: same shared span but doc_id > keeper -> masked
    assert(r(1).getLong(2) == 1L && r(1).getLong(3) == 1L)
    // doc 30: 8 tokens -> 1 window, nothing shared
    assert(r(2).getLong(1) == 1L && r(2).getLong(2) == 0L && r(2).getDouble(4) == 0.0)
  }

  test("d10: short docs surface with zero spans and dup_frac 0") {
    val docs = Seq((1L, "too short"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val r = Dedup.spanDupStats(spark, docs).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 0L && r(0).getDouble(4) == 0.0)
    assert(r(1).getLong(1) == 1L) // exactly one 8-token window
  }

  // --- d11 -----------------------------------------------------------

  test("d11: later occurrence masked token-by-token, keeper untouched") {
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (10L, span + " alpha"),
      (20L, span + " beta"),
      (30L, "no shared words appear anywhere in this one")
    ).toDF("doc_id", "text")
    val r = Dedup.spanMask(spark, docs).orderBy("doc_id").collect()
    // keeper (10): nothing masked, text is the canonical re-join
    assert(r(0).getLong(1) == 0L && r(0).getString(2) == span + " alpha")
    // doc 20: the 8 span tokens masked, the trailing token kept
    assert(r(1).getLong(1) == 8L)
    assert(r(1).getString(2) ==
      (Seq.fill(8)(Dedup.MaskToken) :+ "beta").mkString(" "))
    // doc 30: untouched
    assert(r(2).getLong(1) == 0L &&
      r(2).getString(2) == "no shared words appear anywhere in this one")
  }

  test("d11: overlapping dup windows mask the union of their positions") {
    // 10 tokens sharing a 9-token prefix -> doc 2 has two dup windows
    // (i=0 and i=1) whose union covers tokens 0..8, leaving only the
    // 10th token unmasked.
    val nine = "a b c d e f g h i"
    val docs = Seq(
      (1L, nine + " tail1"),
      (2L, nine + " tail2")
    ).toDF("doc_id", "text")
    val r = Dedup.spanMask(spark, docs).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 0L)
    assert(r(1).getLong(1) == 9L)
    assert(r(1).getString(2) ==
      (Seq.fill(9)(Dedup.MaskToken) :+ "tail2").mkString(" "))
  }

  test("d11: short docs pass through unmasked") {
    val docs = Seq((1L, "too short"), (2L, "too short")).toDF("doc_id", "text")
    val r = Dedup.spanMask(spark, docs).orderBy("doc_id").collect()
    assert(r.forall(_.getLong(1) == 0L))
    assert(r.forall(_.getString(2) == "too short"))
  }

  // --- e07 -----------------------------------------------------------

  test("e07: cells partition the corpus; purity well-formed") {
    val total = Tables.embeddings(spark, sf001).count()
    val r = Similarity.e07ClusterStats(spark, sf001).collect()
    assert(r.map(_.getLong(1)).sum == total)              // sum n_vecs = corpus
    assert(r.forall(x => x.getLong(3) <= x.getLong(1)))   // top_n <= n_vecs
    assert(r.forall { x =>
      val p = x.getDouble(4); p > 0.0 && p <= 1.0 })
    assert(r.length <= Similarity.KmeansCells)
  }

  // --- x07 -----------------------------------------------------------

  test("x07: cube margins re-add to the corpus totals") {
    val docs = Tables.documents(spark, sf001)
    val nDocs = docs.count()
    val r = Sampling.x07Datasheet(spark, sf001).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
    val global = r.filter(_._1 == 3L)
    assert(global.length == 1 && global.head._4 == nDocs)
    // per-lang margin rows (lvl=1: source rolled up) sum to the corpus
    assert(r.filter(_._1 == 1L).map(_._4).sum == nDocs)
    // finest cells (lvl=0) also sum to the corpus
    assert(r.filter(_._1 == 0L).map(_._4).sum == nDocs)
  }
}
