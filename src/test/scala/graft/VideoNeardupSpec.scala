package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{Mp4Frames, PngCodec}

/** m11: MP4 sample-table frame addressing + perceptual video dedup —
  * container round-trip, fail-loud structure checks, BmffDecode parity
  * on the same files, planted-pair fixtures, and the stop-frame cap. */
class VideoNeardupSpec extends SparkSpecBase {
  import spark.implicits._

  // md5-entropy pixels: low-entropy generators (linear progressions)
  // collapse to a handful of above-mean aHash patterns and collide.
  private def frame(seed: Long, w: Int = 8, h: Int = 8,
                    ft: Int = 0): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val px = Array.tabulate(w * h) { i =>
      md.reset()
      val dig = md.digest(s"fix:$seed:${i / 16}".getBytes("UTF-8"))
      dig(i % 16) & 0xff
    }
    PngCodec.encode(w, h, px, ft, s"f$seed")
  }

  test("Mp4Frames: sampleRanges recovers the encoded frames byte-for-byte via the tables") {
    val fs = Seq(frame(1), frame(2, 10, 9), frame(3, 12, 8, 2))
    val mp4 = Mp4Frames.encode(fs, 8, 8)
    val got = Mp4Frames.sampleRanges(mp4).map { case (off, len) =>
      java.util.Arrays.copyOfRange(mp4, off, off + len).toSeq
    }
    assert(got == fs.map(_.toSeq))
  }

  test("Mp4Frames: fails loudly on truncation and non-MP4 bytes") {
    val mp4 = Mp4Frames.encode(Seq(frame(1)), 8, 8)
    intercept[IllegalArgumentException](Mp4Frames.sampleRanges(mp4.take(60)))
    intercept[IllegalArgumentException](Mp4Frames.sampleRanges("nope".getBytes))
  }

  test("BmffDecode reads the m11 container: codec fourcc and coded dims from stsd") {
    val mp4 = Mp4Frames.encode(Seq(frame(1, 12, 9)), 12, 9)
    val (w, h, codec, _, fmt) = Multimodal.BmffDecode.decode(mp4)
    assert(w == 12 && h == 9 && codec == "png " && fmt == "mp4")
  }

  test("videoNeardup fixtures: re-encode shares all frames, trim shares the tail, unrelated absent") {
    val base = Seq(frame(10), frame(11), frame(12))
    val reenc = base.map { f =>
      val (w, h, px) = PngCodec.decode(f)
      PngCodec.encode(w, h, px, 1, "re")
    }
    val rows = Seq(
      (1L, Mp4Frames.encode(base, 8, 8)),
      (2L, Mp4Frames.encode(reenc, 8, 8)),       // zero shared bytes
      (3L, Mp4Frames.encode(base.drop(1), 8, 8)), // trimmed repost
      (4L, Mp4Frames.encode(Seq(frame(90), frame(91), frame(92)), 8, 8))
    ).toDF("doc_id", "payload")
    val got = Multimodal.videoNeardup(spark, rows)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((1L, 2L)) == ((3L, 3L, 3L)), "re-encode shares every frame")
    assert(got((1L, 3L)) == ((2L, 3L, 2L)), "trim shares the two tail frames")
    assert(got((2L, 3L))._1 == 2L)
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("stop-frame cap: a boilerplate frame shared by >cap videos generates no pairs") {
    val slate = frame(500)
    val rows = (1L to (Multimodal.M11MaxFrameDf + 6L)).map { i =>
      (i, Mp4Frames.encode(Seq(slate, frame(1000 + i), frame(2000 + i)), 8, 8))
    }.toDF("doc_id", "payload")
    // Every pair's ONLY shared frame is the slate; over the df cap it
    // leaves the index, so nothing reaches MinShared.
    assert(Multimodal.videoNeardup(spark, rows).count() == 0)
  }

  test("gate corpus: planted re-encodes and trims recovered on real data") {
    val pairs = Multimodal.m11VideoNeardup(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val reenc = pairs.filter { case (a, b, _) => b == a + 1 && b % 23 == 0 }
    assert(reenc.nonEmpty, "re-encode plants recovered")
    assert(pairs.forall(_._3 >= Multimodal.M11MinShared.toLong))
  }
}
