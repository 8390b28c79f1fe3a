package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.PcmCodec

/** m09: real-PCM perceptual audio dedup — codec round-trip, javax.sound
  * cross-check (the AudioSystem parity m07 gets from ImageIO), hash
  * invariances, and planted-pair recovery on engineered fixtures and the
  * real gate corpus. */
class AudioDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def sig(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i => (((seed * 2654435761L + i * 40503L) >>> 16) % 256 - 128).toInt)

  test("PcmCodec: decode(encode(s)) == s at both depths, odd lengths padded per RIFF") {
    for (n <- Seq(64, 97, 160)) { // 97: odd 8-bit data chunk needs the pad byte
      val s8 = sig(n, n)
      val (b8, d8) = (PcmCodec.encode(8, s8), PcmCodec.decode(PcmCodec.encode(8, s8)))
      assert(d8._1 == 8 && d8._2.toSeq == s8.toSeq)
      assert(b8.length % 2 == 0, "RIFF chunks must be padded to even length")
      val d16 = PcmCodec.decode(PcmCodec.encode(16, s8))
      assert(d16._1 == 16 && d16._2.toSeq == s8.map(_ * 256).toSeq)
    }
  }

  test("PcmCodec: decode fails loudly on stereo, non-PCM, odd depth, truncation") {
    val good = PcmCodec.encode(8, sig(1, 64))
    intercept[IllegalArgumentException](PcmCodec.decode(good.take(30)))
    val stereo = good.clone(); stereo(22) = 2 // fmt channels field
    intercept[IllegalArgumentException](PcmCodec.decode(stereo))
    val ulaw = good.clone(); ulaw(20) = 7 // fmt codec field
    intercept[IllegalArgumentException](PcmCodec.decode(ulaw))
    intercept[IllegalArgumentException](PcmCodec.decode("junk".getBytes))
  }

  test("javax.sound reads the same files: format fields and frame bytes match the codec") {
    for (bits <- Seq(8, 16)) {
      val s = sig(7, 100)
      val bytes = PcmCodec.encode(bits, s)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = in.getFormat
      assert(f.getChannels == 1 && f.getSampleRate == 8000f &&
        f.getSampleSizeInBits == bits)
      assert(in.getFrameLength == 100)
      val raw = in.readAllBytes()
      // The frame bytes javax hands back are exactly our data chunk.
      val block = bits / 8
      val expect = new Array[Byte](100 * block)
      for (i <- 0 until 100) {
        if (bits == 8) expect(i) = (s(i) + 128).toByte
        else {
          val v = s(i) * 256
          expect(2 * i) = (v & 0xff).toByte
          expect(2 * i + 1) = ((v >> 8) & 0xff).toByte
        }
      }
      assert(raw.toSeq == expect.toSeq)
    }
  }

  test("audioHash64: uniform re-encode scaling leaves every bit unchanged") {
    for (seed <- 1 to 20) {
      val s = sig(seed, 64 + seed * 3)
      assert(Multimodal.audioHash64(s) == Multimodal.audioHash64(s.map(_ * 256)),
        s"seed $seed")
    }
  }

  test("audioDedup fixtures: re-encode at hamming 0, gain edit within radius, unrelated absent") {
    val base = sig(42, 128)
    val edit = base.map(v => if (v >= 0) math.min(v + 5, 127) else math.max(v - 5, -128))
    val rows = Seq(
      (1L, PcmCodec.encode(8, base)),
      (2L, PcmCodec.encode(16, base)),   // bit-depth re-encode: zero shared bytes
      (3L, PcmCodec.encode(8, edit)),    // gain edit
      (4L, PcmCodec.encode(8, sig(999, 128))) // unrelated
    ).toDF("doc_id", "payload")
    val got = Multimodal.audioDedup(spark, rows)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0L,
      "re-encode must land at hamming 0 exactly")
    assert(got.contains((2L, 3L)) || got.contains((1L, 3L)),
      "the gain edit must pair with the original within the radius")
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated audio must not pair")
  }

  test("gate corpus: the planted re-encode chain is recovered on real data") {
    val pairs = Multimodal.m09AudioDedup(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val reenc = pairs.filter { case (a, b, _) => b == a + 1 && b % 19 == 0 }
    assert(reenc.nonEmpty && reenc.forall(_._3 == 0L),
      "re-encode plants recovered at hamming 0")
    assert(pairs.forall(_._3 <= Multimodal.M09MaxHamming.toLong))
  }
}
