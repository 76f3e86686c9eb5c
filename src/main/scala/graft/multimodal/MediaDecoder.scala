package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded media record: typed metadata + extracted features for one
  * opaque binary payload. */
final case class DecodedMedia(
    doc_id: Long,
    n_bytes: Int,
    width: Int,
    height: Int,
    channels: Int,
    fingerprint: String,
    features: Array[Float])

/** Multimodal decode pipeline: image/audio/video as opaque `binary`
  * columns processed in per-partition batches.
  *
  * The Spark-side plumbing is real and tested — schema, partition
  * batching via `mapPartitions`, typed output encoder — while the
  * actual codec call is STUBBED (this container ships no image/audio
  * libraries): [[decodeStub]] stands in for e.g. a JNI JPEG decode,
  * producing deterministic fake dimensions/features from the bytes so
  * tests are reproducible. Swap [[decodeStub]] for a real codec and
  * nothing else changes.
  *
  * Scale: decode cost dominates at 100 TB, so the operator is shaped
  * for it — one task per input partition, no shuffle, streaming
  * iterator (no partition materialization), codec state reusable per
  * partition (the `it => { val codec = ...; it.map }` pattern).
  */
object MediaDecoder {

  /** STUB: deterministic fake decode — replace with a real codec.
    * Dimensions/features are arithmetic on the payload bytes. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = (n % 640) + 1
    val height = ((n.toLong * 7) % 480).toInt + 1 // no 32-bit wrap on huge blobs
    val channels = 3
    // fake 8-dim feature vector: normalized byte octiles
    val features = Array.tabulate(8) { i =>
      if (n == 0) 0f else (bytes(math.min(i * n / 8, n - 1)) & 0xff) / 255f
    }
    (width, height, channels, features)
  }

  /** Decode a frame of (id, payload) rows partition-by-partition. The
    * input is repartitioned only if the caller asks (decode is
    * shuffle-free by default). */
  def decode(df: DataFrame, idCol: String, binCol: String): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site: the codec analog (here the digest —
        // digest(bytes) resets it, so one instance serves every row)
        // is created ONCE per partition, not per record
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          val (w, h, c, feats) = decodeStub(payload)
          DecodedMedia(id, payload.length, w, h, c,
            md.digest(payload).map("%02x".format(_)).mkString,
            feats)
        }
      }
  }

  /** Frame-sampling shape for video-like payloads: split a payload
    * into fixed-size windows and emit one row per sampled frame —
    * demonstrates the 1-to-N explode side of media processing. */
  def sampleFrames(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, everyNth: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          payload.grouped(frameBytes).zipWithIndex
            .filter(_._2 % everyNth == 0)
            .map { case (frame, idx) =>
              val (w, h, _, _) = decodeStub(frame)
              (id, idx, frame.length, w, h)
            }
        }
      }
      .toDF(idCol, "frame_idx", "frame_bytes", "width", "height")
  }
}
