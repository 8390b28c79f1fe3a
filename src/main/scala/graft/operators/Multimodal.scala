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
  * per-row). The DECODE ITSELF IS A DETERMINISTIC STUB — this container
  * has no image/audio codecs — deriving (width, height, format) from the
  * payload bytes (md5 of the doc text), which keeps it SQL-expressible
  * for the oracle.
  */
object Multimodal {

  /** m01: attach a binary payload and "decode" its metadata. */
  def m01MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        // A real integration opens the codec once here, then streams rows.
        it.map { r =>
          val b = r.payload
          // STUB decode: header fields faked from the payload bytes. A
          // real decoder parses the container header at exactly this spot.
          val width = (((b(0) & 0xff) << 8) | (b(1) & 0xff)).toLong
          val height = (((b(2) & 0xff) << 8) | (b(3) & 0xff)).toLong
          val format = (b(4) & 0xff) % 3 match {
            case 0 => "png"
            case 1 => "jpeg"
            case _ => "webp"
          }
          MediaMeta(r.doc_id, b.length.toLong, width, height, format)
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
