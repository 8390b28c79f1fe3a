package graft

import org.apache.spark.sql.Row
import graft.operators.Sampling

/** x16 fixtures: greedy left-to-right merge application per token,
  * non-alphanumeric tokens excluded, zero-encodable docs restored by
  * the join-back, and the gated key's compression invariants. */
class BpeEncodeSpec extends SparkSpecBase {
  import spark.implicits._

  private val merges = Seq(
    (1L, "a", "b", "ab", 0L),
    (2L, "ab", "c", "abc", 0L))

  private def run(rows: (Long, String)*): Map[Long, Row] =
    Sampling.bpeEncode(rows.toSeq.toDF("doc_id", "text"), merges)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("merges chain: abc → one symbol, cab → two, ab → one") {
    // abc: (a)(b)(c) → (ab)(c) → (abc); cab: (c)(a)(b) → (c)(ab);
    // 'zz!' is non-alphanumeric and never enters the encoder.
    val r = run(1L -> "abc ab zz! cab")(1L)
    assert(r.getAs[Long]("n_enc_tokens") == 3L)
    assert(r.getAs[Long]("n_base_symbols") == 8L)
    assert(r.getAs[Long]("n_symbols") == 4L)
    assert(r.getAs[Long]("n_merges_applied") == 4L)
  }

  test("greedy leftmost: aab merges the FIRST ab it can reach") {
    // (a)(a)(b): leftmost '(a)(b)' occurrence sits at positions 2-3 →
    // (a)(ab); round 2 finds no '(ab)(c)'.
    val r = run(1L -> "aab")(1L)
    assert(r.getAs[Long]("n_symbols") == 2L)
  }

  test("zero-encodable docs survive the join-back with zeros") {
    val r = run(1L -> "!!! ???")(1L)
    assert(r.getAs[Long]("n_enc_tokens") == 0L)
    assert(r.getAs[Long]("n_symbols") == 0L)
    assert(r.getAs[Long]("n_merges_applied") == 0L)
  }

  test("gated key: one row per doc, symbols bounded by base, real compression") {
    val out = Queries.production("x16_bpe_encode")(spark, sf001).collect()
    assert(out.length.toLong == Tables.documents(spark, sf001).count())
    for (r <- out) {
      assert(r.getAs[Long]("n_symbols") <= r.getAs[Long]("n_base_symbols"))
      assert(r.getAs[Long]("n_symbols") >= r.getAs[Long]("n_enc_tokens"))
    }
    // The trained merges must actually compress this corpus.
    assert(out.map(_.getAs[Long]("n_merges_applied")).sum > 0L)
  }
}
