package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

/** d13 canonicalization on hand-built adversarial URLs and x10 chunk
  * geometry on exact-boundary token counts. */
class UrlChunkSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(urls: (Long, String)*): Map[String, (Long, Long, Long)] =
    Dedup.urlDedup(urls.toSeq.toDF("doc_id", "url")).collect()
      .map(r => r.getAs[String]("canonical_url") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("n_spellings"),
          r.getAs[Long]("n_distinct_raw"))))
      .toMap

  test("url canonicalization: case, default ports, fragments, tracking params, slashes") {
    val m = canon(
      1L -> "https://www.site.com/a/b",
      2L -> "HTTPS://WWW.Site.COM:443/a/b#frag",
      3L -> "https://www.site.com/a/b?utm_source=x&utm_medium=y",
      4L -> "https://www.site.com/a/b/?ref=home",
      5L -> "https://www.site.com/a/b?id=7&utm_campaign=z",  // real param SURVIVES
      6L -> "http://www.site.com:80/a/b",                     // http default port
      7L -> "https://www.site.com/A/B")                       // path case is SEMANTIC
    assert(m("https://www.site.com/a/b") == ((1L, 4L, 4L)))
    assert(m("https://www.site.com/a/b?id=7") == ((5L, 1L, 1L)))
    assert(m("http://www.site.com/a/b") == ((6L, 1L, 1L)))
    assert(m("https://www.site.com/A/B") == ((7L, 1L, 1L)))
  }

  test("url canonicalization: non-default port and identical raw spellings") {
    val m = canon(
      1L -> "https://www.site.com:8443/x",  // NON-default port survives
      2L -> "https://www.site.com/x",
      3L -> "https://www.site.com/x")       // exact duplicate spelling
    assert(m("https://www.site.com:8443/x") == ((1L, 1L, 1L)))
    assert(m("https://www.site.com/x") == ((2L, 2L, 1L)))
  }

  test("d13 over the generated corpus: every canonical group has exactly 4 spellings") {
    val out = Queries.production("d13_url_dedup")(spark, sf001)
    val docs = Tables.documents(spark, sf001).count()
    assert(out.count() == (docs + 3) / 4)
    assert(out.filter(col("n_spellings") =!= 4 &&
      col("keep_id") < (docs / 4) * 4).count() == 0)
  }

  test("x10 chunk geometry: boundary token counts, overlap, md5 of the exact slice") {
    val C = Sampling.ChunkTokens
    val S = Sampling.ChunkStride
    // x10SeqChunk reads the documents table, so the geometry rule is
    // checked on exact boundary sizes here and the catalog output is
    // cross-checked against per-row recomputation below.
    def chunksOf(n: Int): Seq[(Int, Int)] = {
      val k = if (n <= C) 1 else (n - C + S - 1) / S + 1
      (0 until k).map(i => (i * S, math.min(C, n - i * S)))
    }
    assert(chunksOf(C) == Seq((0, C)))
    assert(chunksOf(C + 1) == Seq((0, C), (S, C + 1 - S)))
    assert(chunksOf(1) == Seq((0, 1)))
    val out = Queries.production("x10_seq_chunk")(spark, sf001)
      .orderBy("doc_id", "chunk_no").collect()
    val toks = Tables.documents(spark, sf001).orderBy("doc_id")
      .select(col("doc_id"), split(col("text"), "\\s+").as("t")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    // every chunk row obeys the geometry AND fingerprints its exact slice
    out.take(50).foreach { r =>
      val (id, k) = (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_no").toInt)
      val t = toks(id)
      val expect = chunksOf(t.size)(k)
      assert(r.getAs[Long]("start_tok") == expect._1.toLong)
      assert(r.getAs[Long]("n_chunk_tokens") == expect._2.toLong)
      val slice = t.slice(expect._1, expect._1 + C).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("chunk_md5") == md)
    }
    // overlap invariant: consecutive chunks share C - S tokens
    assert(C - S > 0)
  }
}
