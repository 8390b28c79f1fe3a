package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A row carrying an opaque binary media payload. */
case class MediaRow(doc_id: Long, payload: Array[Byte])

/** Decoded (stub) media metadata. */
case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                     format: String)

/** One sampled frame of a media payload. */
case class FrameRow(doc_id: Long, frame_no: Long, checksum: Long,
                    is_keyframe: Boolean)

/** Multimodal column handling (SURVEY §2.E): media as opaque `binary`
  * columns + typed decode metadata.
  *
  * The Spark-side plumbing is real — binary column, case-class Encoders,
  * per-partition imperative decode via mapPartitions (the shape a real
  * codec integration needs: the decoder is driven once per partition, so
  * a native library handle could be initialized per-partition, not
  * per-row). m01's payloads are REAL PNG/JPEG headers (signature + IHDR
  * chunk / JFIF + SOF0 segment, synthesized deterministically since the
  * container ships no image files) and [[HeaderDecode]] is a real
  * fixed-offset/marker-walk parser that works on any actual PNG or
  * baseline JPEG. Only m02's frame EXTRACTION remains a declared stub
  * (true frame decode needs a codec library).
  */
object Multimodal {

  /** Real container-header decoders: PNG signature + IHDR big-endian
    * dimensions; JPEG segment walk to the first SOF0/1/2 frame header.
    * Pure byte arithmetic — no codec library — so it runs anywhere and
    * is exactly what "extract image metadata without decoding pixels"
    * does in production pipelines. */
  object HeaderDecode {
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be16(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 8) | (b(i + 1) & 0xffL)

    private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** (width, height, format); (0, 0, "unknown") when neither container
      * matches — the permissive posture, bad payloads surface in an
      * audit column instead of killing the job. */
    def decode(b: Array[Byte]): (Long, Long, String) = {
      if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
          new String(b.slice(12, 16), "US-ASCII") == "IHDR") {
        // IHDR is mandatory-first: length(4) type(4) width(4) height(4)
        (be32(b, 16), be32(b, 20), "png")
      } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk marker segments (each FF mm len2 payload) until a
        // start-of-frame (C0 baseline / C1 extended / C2 progressive);
        // its payload is precision(1) height(2) width(2).
        var i = 2
        while (i + 9 <= b.length && (b(i) & 0xff) == 0xff) {
          val m = b(i + 1) & 0xff
          if (m == 0xc0 || m == 0xc1 || m == 0xc2)
            return (be16(b, i + 7), be16(b, i + 5), "jpeg")
          i += 2 + be16(b, i + 2).toInt
        }
        (0L, 0L, "unknown")
      } else (0L, 0L, "unknown")
    }
  }

  /** Deterministic media dimensions per document — the generation rule
    * the oracle mirrors as its ground truth. */
  private def widthCol = (lit(64) + col("doc_id") % 1920).cast("bigint")
  private def heightCol = (lit(64) + col("n_chars") % 1080).cast("bigint")

  /** 4-/2-byte big-endian encodings of an integer column. */
  private def be4(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
  private def be2(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))

  /** Synthesized payload: even doc_ids get a PNG (8-byte signature +
    * IHDR chunk with real big-endian dims; CRC bytes are fixed filler —
    * header parsers don't checksum), odd doc_ids a baseline JPEG
    * (SOI + 16-byte JFIF APP0 + SOF0 with real dims + EOI). These are
    * byte-valid container headers: [[HeaderDecode]] does no
    * generation-specific shortcuts. */
  private def payloadCol = when(col("doc_id") % 2 === 0,
    concat(
      unhex(lit("89504E470D0A1A0A0000000D49484452")), // sig + IHDR len/type
      be4(widthCol), be4(heightCol),
      unhex(lit("0806000000AA5500FF")))               // depth/color/comp/filter/interlace + CRC filler
  ).otherwise(
    concat(
      unhex(lit("FFD8FFE000104A46494600010100000100010000FFC0001108")), // SOI + APP0 + SOF0 head
      be2(heightCol), be2(widthCol),
      unhex(lit("03012200021101031101")),             // 3 components
      unhex(lit("FFD9"))))                            // EOI

  /** m01: attach a binary media payload and decode its metadata from the
    * container header bytes. */
  def m01MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), payloadCol.as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        // A real integration opens the codec once here, then streams rows.
        it.map { r =>
          val (w, h, fmt) = HeaderDecode.decode(r.payload)
          MediaMeta(r.doc_id, r.payload.length.toLong, w, h, fmt)
        }
      }
      .toDF()
  }

  /** m02: frame sampling — one payload row fans out to N frame rows via
    * a typed flatMap (the row-multiplying shape a video/audio sampler
    * needs). The frame extraction is the same clearly-marked stub:
    * fixed 4-byte "frames" of the md5 payload, checksummed. */
  def m02FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[MediaRow]
      .flatMap { r =>
        // a real codec seeks keyframe boundaries here
        val b = r.payload
        (0 until 4).iterator.map { i =>
          val cs = ((b(4 * i) & 0xffL) << 24) | ((b(4 * i + 1) & 0xffL) << 16) |
            ((b(4 * i + 2) & 0xffL) << 8) | (b(4 * i + 3) & 0xffL)
          FrameRow(r.doc_id, i.toLong, cs, cs % 5 == 0)
        }
      }
      .toDF()
  }
}
