package graft

import graft.operators.Multimodal

/** m06 fixtures: the metadata-segment parser on hand-built containers
  * (PNG chunk list and JPEG marker list constructed byte-by-byte in the
  * test, not by the generator), the shared-segment threshold in both
  * directions, and the gated key's planted-pair structure. */
class MediaNeardupSpec extends SparkSpecBase {
  import spark.implicits._

  private def be(v: Long, n: Int): Array[Byte] =
    (n - 1 to 0 by -1).map(j => ((v >> (8 * j)) & 0xff).toByte).toArray

  private def png(vals: Seq[Long]): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      (be(13, 4) ++ "IHDR".getBytes ++ Array.fill[Byte](13)(1) ++ be(0, 4)) ++
      vals.toArray.flatMap(v =>
        be(8, 4) ++ "tEXt".getBytes ++ be(v, 8) ++ be(0, 4)) ++
      (be(0, 4) ++ "IEND".getBytes ++ be(0, 4))

  private def jpeg(vals: Seq[Long]): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      vals.toArray.flatMap(v =>
        Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x0a) ++ be(v, 8)) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)

  test("parser reads ordinal, marker, value from real container bytes") {
    val p = Multimodal.MetaValueWalk.extract(7L, png(Seq(100L, 200L)))
    assert(p.map(s => (s.ord, s.marker, s.value)) == Seq((1, "tEXt", 100L), (2, "tEXt", 200L)))
    val j = Multimodal.MetaValueWalk.extract(8L, jpeg(Seq(300L)))
    assert(j.map(s => (s.ord, s.marker, s.value)) == Seq((1, "COM", 300L)))
    assert(Multimodal.MetaValueWalk.extract(9L, Array[Byte](1, 2, 3)).isEmpty)
  }

  test("threshold: 3 shared segments flag, 2 do not, 4 = exact dup") {
    val rows = Seq(
      1L -> png(Seq(10L, 20L, 30L, 40L)),
      2L -> png(Seq(10L, 20L, 30L, 99L)), // shares 3 with 1 → pair
      3L -> png(Seq(10L, 20L, 98L, 97L)), // shares 2 with 1 → no pair
      4L -> png(Seq(10L, 20L, 30L, 40L)), // identical to 1 → 4 shared
      5L -> jpeg(Seq(10L, 20L, 30L, 40L)) // same values, other marker → no pair
    ).toDF("doc_id", "payload")
    val out = Multimodal.mediaNeardup(spark, rows)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 3L, (1L, 4L) -> 4L, (2L, 4L) -> 3L))
  }

  test("gated key: exactly the even-source planted pairs, n_shared = 3") {
    val docs = Tables.documents(spark, sf001)
      .selectExpr("doc_id").collect().map(_.getLong(0))
    val shift = docs.max + 1L
    val out = Queries.production("m06_media_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = docs.filter(_ % 2 == 0).map(d => (d, d + shift, 3L)).toSet
    assert(out.toSet == expected)
  }
}
