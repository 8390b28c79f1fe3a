package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal.HeaderDecode

/** Byte-level semantics of the container-header decoder, independent of
  * the payload generator (hand-assembled arrays, not the generation
  * expressions — a generator bug can't self-certify). */
class MultimodalSpec extends SparkSpecBase {

  private def be4(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be2(v: Long): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG IHDR decode: signature check + big-endian dims") {
    val png = hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452") ++
      be4(640) ++ be4(480) ++ hexBytes("080600000012345678")
    assert(HeaderDecode.decode(png) == ((640L, 480L, "png")))
  }

  test("JPEG SOF decode walks variable-length segments before the frame header") {
    // SOI, a COM segment of unusual length (9), APP0, then SOF2
    // (progressive) — offsets differ from the generator's fixed layout,
    // so a fixed-offset cheat would fail here.
    val jpeg = hexBytes("FFD8" + "FFFE0009" + "00112233445566") ++
      hexBytes("FFE000104A46494600010100000100010000") ++
      hexBytes("FFC2001108") ++ be2(1080) ++ be2(1920) ++
      hexBytes("03012200021101031101" + "FFD9")
    assert(HeaderDecode.decode(jpeg) == ((1920L, 1080L, "jpeg")))
  }

  test("non-media bytes fall through to unknown, not an exception") {
    assert(HeaderDecode.decode("plain text".getBytes("UTF-8"))._3 == "unknown")
    assert(HeaderDecode.decode(Array[Byte]())._3 == "unknown")
    // JPEG SOI but truncated before any SOF
    assert(HeaderDecode.decode(hexBytes("FFD8FFFE"))._3 == "unknown")
  }

  test("PNG chunk walk: every chunk surfaced with type, length, byte-sum") {
    import graft.operators.Multimodal.SegmentWalk
    val png = hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452") ++
      be4(640) ++ be4(480) ++ hexBytes("080600000012345678") ++
      hexBytes("00000003" + "74455874" + "010203" + "00000000") ++ // tEXt, 3 data bytes
      hexBytes("00000000" + "49454E44" + "AE426082")
    val segs = SegmentWalk.walk(png)
    assert(segs.map(_._1) == Seq("IHDR", "tEXt", "IEND"))
    assert(segs(0)._4 && !segs(1)._4) // IHDR is the keyframe segment
    assert(segs(1) == (("tEXt", 3L, 6L, false))) // 1+2+3
  }

  test("JPEG segment walk handles standalone markers and stops at EOI") {
    import graft.operators.Multimodal.SegmentWalk
    val jpeg = hexBytes("FFD8" + "FFFE0004" + "0A0B" + "FFC00007" + "08") ++
      be2(9) ++ be2(7) ++ hexBytes("FFD9")
    val segs = SegmentWalk.walk(jpeg)
    assert(segs.map(_._1) == Seq("COM", "SOF0", "EOI"))
    assert(segs(0) == (("COM", 2L, 21L, false)))   // 0x0A + 0x0B
    assert(segs(1)._4)                             // SOF is the keyframe
    assert(segs(1)._3 == 8L + 9L + 7L)             // precision + dim bytes
    assert(SegmentWalk.walk("not media".getBytes("UTF-8")).isEmpty)
  }

  test("m01 payloads round-trip: decoded dims equal the generation rule") {
    val out = Queries.production("m01_multimodal_meta")(spark, sf001)
    val bad = out.filter(
      col("width") =!= (lit(64) + col("doc_id") % 1920) ||
      col("format").isin("unknown")).count()
    assert(bad == 0)
    assert(out.filter(col("format") === "png").count() > 0)
    assert(out.filter(col("format") === "jpeg").count() > 0)
  }

  test("opt-in imageio decode agrees with the header walk on the whole corpus") {
    // The per-partition handle must carry a REAL codec library: the JDK's
    // registered PNG/JPEG readers parse the same synthetic payloads (they
    // are byte-valid containers) and must report identical
    // (doc_id, n_bytes, width, height, format) rows.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1).toSeq
    val header = rows(operators.Multimodal.m01MultimodalMeta(spark, sf001))
    val imageio = rows(operators.Multimodal.m01MultimodalMetaImageIo(spark, sf001))
    assert(header.nonEmpty)
    assert(imageio == header)
  }

  private def le4(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le2(v: Long): Array[Byte] = Array(v.toByte, (v >> 8).toByte)

  test("RIFF/WAV decode: hand-assembled PCM file, odd-size chunk padding") {
    import graft.operators.Multimodal.RiffDecode
    // 2ch 44.1kHz 16-bit, 100 samples -> data 400 bytes, byteRate 176400.
    // A LIST chunk with ODD size (3, padded to 4) sits before fmt so a
    // walker that skips padding lands mid-chunk and fails.
    val data = Array.fill(400)(0x41.toByte)
    val wav = "RIFF".getBytes ++ le4(4 + 12 + 24 + 8 + 400) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le4(3) ++ Array[Byte](1, 2, 3, 0) ++
      "fmt ".getBytes ++ le4(16) ++ le2(1) ++ le2(2) ++ le4(44100) ++
      le4(176400) ++ le2(4) ++ le2(16) ++
      "data".getBytes ++ le4(400) ++ data
    assert(RiffDecode.decode(wav) == ((2L, 44100L, 16L, 400L, 2L, "wav")))
    assert(RiffDecode.decode("not audio at all".getBytes("UTF-8"))._6 == "unknown")
    assert(RiffDecode.decode(Array[Byte]())._6 == "unknown")
  }

  test("BMFF box walk: hand-assembled MP4, v1 mvhd, non-generator layout") {
    import graft.operators.Multimodal.BmffDecode
    def be8(v: Long): Array[Byte] = be4(v >> 32) ++ be4(v & 0xffffffffL)
    def box(typ: String, content: Array[Byte]): Array[Byte] =
      be4(content.length + 8L) ++ typ.getBytes("US-ASCII") ++ content
    // Layout deliberately unlike the generator's: a `free` box inside
    // moov, a VERSION-1 mvhd (64-bit times), no tkhd/mdhd/hdlr at all —
    // a generic box walker must still land on mvhd and the stsd entry.
    val entry = be4(86) ++ "hvc1".getBytes ++ Array.fill[Byte](24)(0) ++
      be2(3840) ++ be2(2160) ++ Array.fill[Byte](50)(0)
    val stsd = box("stsd", be4(0) ++ be4(1) ++ entry)
    val trak = box("trak", box("mdia", box("minf", box("stbl", stsd))))
    // truncated-but-offset-correct v1 mvhd: verflags, ctime8, mtime8,
    // timescale 90000, duration(64) 123456789
    val mvhd = box("mvhd",
      hexBytes("01000000") ++ be8(7L) ++ be8(9L) ++ be4(90000) ++ be8(123456789L))
    val moov = box("moov", box("free", Array[Byte](1, 2)) ++ mvhd ++ trak)
    val ftyp = box("ftyp", "isom".getBytes ++ be4(0))
    val mp4 = ftyp ++ moov
    assert(BmffDecode.decode(mp4) ==
      ((3840L, 2160L, "hvc1", 123456789000L / 90000L, "mp4")))
    assert(BmffDecode.decode("no ftyp here".getBytes("UTF-8"))._5 == "unknown")
    assert(BmffDecode.decode(Array[Byte]())._5 == "unknown")
    // size==0 ("extends to end of enclosing box") must consume to EOF
    // and terminate — an empty EOF-extended moov yields no metadata.
    val broken = ftyp ++ be4(0) ++ "moov".getBytes
    assert(BmffDecode.decode(broken)._3 == "unknown")
    // Legal size==0 on a trailing mdat (streamed-file layout): the walk
    // must step over it without declaring the file malformed.
    val mdatEof = be4(0) ++ "mdat".getBytes ++ Array.fill[Byte](32)(7)
    assert(BmffDecode.decode(ftyp ++ moov ++ mdatEof) ==
      ((3840L, 2160L, "hvc1", 123456789000L / 90000L, "mp4")))
    // Legal size==1 (64-bit largesize, 16-byte header) wrapping moov:
    // payload offsets shift by the wider header; fields still decode.
    val moovLarge = be4(1) ++ "moov".getBytes ++ be8(moov.length + 8L) ++
      moov.drop(8)
    assert(BmffDecode.decode(ftyp ++ moovLarge ++ mdatEof) ==
      ((3840L, 2160L, "hvc1", 123456789000L / 90000L, "mp4")))
    // size==1 with a truncated largesize is malformed, not a loop.
    assert(BmffDecode.decode(ftyp ++ be4(1) ++ "moov".getBytes)._3 == "unknown")
  }

  test("m04 payloads round-trip: decoded video fields equal the generation rule") {
    val out = Queries.production("m04_video_meta")(spark, sf001)
    assert(out.filter(col("format") =!= "mp4").count() == 0,
      "every generated payload must parse as an ISO-BMFF container")
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("n_chars"))
    val bad = out.join(docs, "doc_id").filter(
      col("width") =!= (lit(128) + col("doc_id") % 1792) ||
      col("height") =!= (lit(96) + col("n_chars") % 984) ||
      col("codec") =!= when(col("doc_id") % 2 === 0, "avc1").otherwise("hvc1") ||
      col("n_bytes") =!= (lit(443) + col("doc_id") % 32) ||
      col("duration_ms") =!=
        expr("(600 + (n_chars * 37) % 72000) * 1000 DIV (600 * (1 + doc_id % 4))"))
      .count()
    assert(bad == 0)
    assert(out.count() == docs.count())
  }

  test("m05 content dedup: md5 groups are exactly the byte-equality classes") {
    val docs = Tables.documents(spark, sf001)
    val n = docs.count()
    val m = math.max(1L, n / 2L)
    val out = Queries.production("m05_media_dedup")(spark, sf001).collect()
    // groups = distinct content keys; copies sum back to the corpus
    assert(out.length == m.toInt, s"${out.length} groups, expected $m")
    assert(out.map(_.getAs[Long]("n_copies")).sum == n)
    assert(out.forall(_.getAs[Long]("n_copies") >= (n / m)),
      "every synthesized payload must have its planted copy")
    // byte-level cross-check, independent of the grouping path: two docs
    // sharing a content key have IDENTICAL payload bytes; adjacent keys
    // differ (injectivity of the generator in ckey).
    val pay = graft.operators.Multimodal.m05Payloads(spark, sf001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    assert(pay(0L).sameElements(pay(m)), "same ckey must mean same bytes")
    assert(!pay(0L).sameElements(pay(1L)), "different ckey must mean different bytes")
  }

  test("m03 payloads round-trip: decoded audio fields equal the generation rule") {
    val out = Queries.production("m03_audio_meta")(spark, sf001)
    assert(out.filter(col("format") =!= "wav").count() == 0,
      "every generated payload must parse as a RIFF/WAVE container")
    val bad = out.filter(
      col("channels") =!= (lit(1) + col("doc_id") % 2) ||
      col("sample_rate") =!= (lit(8000) + (col("doc_id") % 5) * 8000) ||
      col("bits_per_sample") =!= (lit(8) * (lit(1) + col("doc_id") % 3)) ||
      col("duration_ms") =!= expr("n_samples * 1000 DIV sample_rate")).count()
    assert(bad == 0)
    assert(out.count() == Tables.documents(spark, sf001).count())
  }
}
