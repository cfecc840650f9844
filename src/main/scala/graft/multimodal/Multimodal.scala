package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded via per-partition imperative code (`mapPartitions` — a
  * real codec is per-row imperative byte work; this is the one place the
  * DataFrame expression API genuinely can't express the operator).
  *
  * DECODE IS A DETERMINISTIC STAND-IN: the container has no image/audio
  * codecs, so `FakeCodec` derives dimensions/frames from the blob's MD5
  * fingerprint and length. Everything AROUND the stub is the real contract —
  * binary column in, typed Dataset[MediaMeta] out, one codec instance per
  * partition (the expensive-init pattern), frame sampling as a flatMap.
  * Swap `FakeCodec` for a JNI/javacv codec and nothing else changes.
  */
object Multimodal {

  /** typed decode output — the schema the rest of the pipeline sees */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Long,
      thumb_hash: String)

  final case class Frame(doc_id: Long, frame_idx: Long, frame_sig: String)

  /** Deterministic fake decoder: all values derive from the blob bytes via
    * MD5, so the DuckDB oracle can reproduce them exactly. One instance per
    * partition (MessageDigest is stateful and non-thread-safe, like real
    * codec handles). */
  final class FakeCodec {
    private val md = MessageDigest.getInstance("MD5")

    def fingerprint(blob: Array[Byte]): String =
      md.digest(blob).map("%02x".format(_)).mkString

    def decode(docId: Long, blob: Array[Byte]): MediaMeta = {
      val hex = fingerprint(blob)
      val width = 16 + Integer.parseInt(hex.substring(0, 2), 16) % 112
      val height = 16 + Integer.parseInt(hex.substring(2, 4), 16) % 112
      val nFrames = 1L + blob.length / 256
      val mediaType = (blob.length % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      // "resize to thumbnail + re-hash" stand-in: hash of the fingerprint
      val thumb = md.digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
      MediaMeta(docId, blob.length.toLong, mediaType, width, height, nFrames, thumb)
    }

    /** sample up to `k` evenly-indexed frames; signature per frame */
    def sampleFrames(docId: Long, blob: Array[Byte], k: Int): Seq[Frame] = {
      val meta = decode(docId, blob)
      val hex = fingerprint(blob)
      val n = math.min(meta.n_frames, k.toLong)
      (0L until n).map { idx =>
        val sig = md.digest(s"$hex:$idx".getBytes("UTF-8")).map("%02x".format(_)).mkString
        Frame(docId, idx, sig)
      }
    }
  }

  /** binary column → typed metadata; one codec per partition. */
  def decodeMeta(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new FakeCodec // per-partition init, NOT per row
        it.map { case (id, blob) => codec.decode(id, blob) }
      }
  }

  /** binary column → sampled frames (flatMap shape of a video pipeline). */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String, k: Int): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new FakeCodec
        it.flatMap { case (id, blob) => codec.sampleFrames(id, blob, k) }
      }
  }
}
