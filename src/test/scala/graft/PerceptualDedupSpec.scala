package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.PngCodec

/** m07 fixtures: the decode path is REAL (javax.imageio reads our
  * PNGs and agrees pixel-for-pixel; all five scanline filters
  * round-trip; CRC tampering fails loudly), and the gated key does
  * real work in both directions (re-encode plants at hamming 0,
  * brightness plants within the radius, unrelated images far outside
  * it). */
class PerceptualDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def gradient(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i * 7 + (i / w) * 13) % 256)

  test("emitted PNGs are fully valid: javax.imageio decodes them and " +
    "agrees with PngCodec pixel-for-pixel (both filter paths)") {
    for (id <- Seq(1L, 2L, 17L, 34L, 62L)) { // 17/34 = Sub-filter re-encodes
      val (w, h, px) = Multimodal.m07Pixels(id)
      val ft = if (id % 17 == 0) 1 else 0
      val bytes = PngCodec.encode(w, h, px, ft, s"m07 doc $id")
      val (dw, dh, dpx) = PngCodec.decode(bytes)
      assert((dw, dh) == (w, h) && dpx.sameElements(px))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected the PNG")
      assert(img.getWidth == w && img.getHeight == h)
      val ras = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(ras.getSample(x, y, 0) == px(y * w + x),
          s"pixel ($x,$y) of doc $id")
    }
  }

  test("all five PNG filter types round-trip through encode/decode") {
    val (w, h) = (11, 9)
    val px = gradient(w, h)
    for (ft <- 0 to 4) {
      val (dw, dh, dpx) = PngCodec.decode(PngCodec.encode(w, h, px, ft, s"f$ft"))
      assert((dw, dh) == (w, h) && dpx.sameElements(px), s"filter $ft")
    }
  }

  test("a corrupted chunk CRC fails loudly, not silently") {
    val bytes = PngCodec.encode(8, 8, gradient(8, 8), 0, "x")
    bytes(bytes.length - 20) = (bytes(bytes.length - 20) ^ 0x55).toByte
    intercept[IllegalArgumentException] { PngCodec.decode(bytes) }
  }

  test("pixel-identical re-encodes differ byte-wise but hash equal; " +
    "+3-brightness edits stay within the radius; unrelated images are far") {
    def enc(id: Long, ft: Int) = {
      val (w, h, px) = Multimodal.m07Pixels(id)
      (PngCodec.encode(w, h, px, ft, s"v$ft doc $id"), (w, h, px))
    }
    val (orig, (w, h, px)) = enc(16L, 0)
    val (re, _) = enc(16L, 1)
    assert(!java.util.Arrays.equals(orig, re), "re-encode must differ byte-wise")
    val h0 = Multimodal.aHash64(w, h, px)
    val hRe = { val (dw, dh, dpx) = PngCodec.decode(re); Multimodal.aHash64(dw, dh, dpx) }
    assert(h0 == hRe)
    val bright = px.map(p => math.min(p + 3, 255))
    val hBr = Multimodal.aHash64(w, h, bright)
    assert(java.lang.Long.bitCount(h0 ^ hBr) <= Multimodal.M07MaxHamming)
    val (w2, h2, px2) = Multimodal.m07Pixels(100L)
    val hFar = Multimodal.aHash64(w2, h2, px2)
    assert(java.lang.Long.bitCount(h0 ^ hFar) > Multimodal.M07MaxHamming)
  }

  test("gated key: every clean re-encode plant pairs with its source at " +
    "hamming 0; every pair has a plant endpoint") {
    val pairs = Queries.production("m07_perceptual_dedup")(spark, sf001)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming")))
    assert(pairs.nonEmpty)
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val maxId = spark.read.parquet(s"$sf001/documents.parquet")
      .agg(max("doc_id")).head().getLong(0)
    def isPlant(id: Long) = id > 0 && (id % 17 == 0 || id % 31 == 0)
    var cleanReencodes = 0
    for (doc <- 17L to maxId by 17L if !isPlant(doc - 1)) {
      assert(byPair.get((doc - 1, doc)).contains(0L),
        s"re-encode pair (${doc - 1}, $doc) missing or nonzero")
      cleanReencodes += 1
    }
    assert(cleanReencodes > 0)
    for ((a, b, _) <- pairs)
      assert(isPlant(a) || isPlant(b), s"unplanted pair ($a, $b)")
  }

  test("m08 gated key: plant pairs share a group, keeper is the min id") {
    val groups = Queries.production("m08_media_groups")(spark, sf001)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("group_size"),
          r.getAs[Boolean]("is_keeper"))).toMap
    val pairs = Queries.production("m07_perceptual_dedup")(spark, sf001)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs)
      assert(groups(a)._1 == groups(b)._1, s"pair ($a,$b) split across groups")
    for ((id, (canon, size, keeper)) <- groups) {
      assert(canon <= id)
      assert(keeper == (id == canon))
      if (pairs.exists(p => p._1 == id || p._2 == id)) assert(size >= 2L)
    }
    // Singletons (no perceptual neighbour) are their own keeper.
    val linked = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    for ((id, (canon, size, _)) <- groups if !linked(id))
      assert(canon == id && size == 1L)
  }

  test("spec entry: hand-planted near-dup found, distinct image not") {
    val base = gradient(12, 10)
    val near = base.map(p => math.min(p + 3, 255))
    val far = Array.tabulate(12 * 10)(i => ((i * 101 + 37) * 97) % 256)
    val frame = Seq(
      (1L, PngCodec.encode(12, 10, base, 0, "a")),
      (2L, PngCodec.encode(12, 10, near, 4, "b")),
      (3L, PngCodec.encode(12, 10, far, 2, "c"))
    ).toDF("doc_id", "payload")
    val got = Multimodal.perceptualDedup(spark, frame)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
