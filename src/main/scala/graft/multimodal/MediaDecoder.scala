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
  * batching via `mapPartitions`, typed output encoder. Real decodes,
  * all pure-JVM: uncompressed 24/32-bit [[decodeBmp BMP]] (header
  * dims + per-channel pixel means as features), PCM [[decodeWav WAV]]
  * (header layout + per-octile RMS amplitude as features), and
  * compressed PNG/JPEG/GIF via the JDK's own `javax.imageio` codecs
  * ([[decodeImage]]). Payloads in any other format fall back to
  * [[decodeStub]] — the stand-in for e.g. a JNI video decode (this
  * container ships no external codec libraries), producing
  * deterministic fake dimensions/features from the bytes so tests are
  * reproducible. Swap the stub for a real codec and nothing else
  * changes.
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

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** REAL decode of an uncompressed (BI_RGB) 24/32-bit BMP: width,
    * height and channel count from the BITMAPINFOHEADER, features =
    * mean intensity per channel in B,G,R[,A] order (rows are 4-byte
    * padded; a negative header height means top-down storage — mean
    * features are orientation-invariant). Returns None for anything
    * that is not a plain uncompressed BMP — compressed or paletted
    * variants fall back to the caller's stub path. */
  def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER etc: not handled
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val height = math.abs(rawHeight)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (width <= 0 || height == 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    val channels = bpp / 8
    val pixOff = le32(b, 10)
    // all size arithmetic in Long with coarse guards first: a crafted
    // header (width ~ 2^30) would overflow an Int stride to a negative
    // value and sail through the bounds check into an
    // ArrayIndexOutOfBounds — corrupt input must fall back, not throw
    val strideL = ((width.toLong * channels + 3) / 4) * 4
    if (strideL <= 0 || strideL > b.length || height > b.length) return None
    val stride = strideL.toInt
    if (pixOff < 0 || pixOff.toLong + strideL * height > b.length)
      return None
    val sums = new Array[Long](channels)
    var row = 0
    while (row < height) {
      var x = 0
      val base = pixOff + row * stride
      while (x < width) {
        var c = 0
        while (c < channels) {
          sums(c) += (b(base + x * channels + c) & 0xff).toLong
          c += 1
        }
        x += 1
      }
      row += 1
    }
    val nPix = width.toLong * height
    val features = Array.tabulate(8)(i =>
      if (i < channels) (sums(i).toDouble / nPix / 255.0).toFloat else 0f)
    Some((width, height, channels, features))
  }

  /** REAL decode of a PCM WAV: channel count / sample rate / sample
    * count from the RIFF chunks (mapped onto the image-shaped record
    * as width = frames per channel, height = sample rate), features =
    * RMS amplitude (normalized to [0,1]) of each octile of the 16-bit
    * sample stream. Returns None for non-RIFF/WAVE payloads or
    * non-PCM encodings. */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var off = 12
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = le32(b, off + 4)
      if (size < 0 || off + 8 + size.toLong > b.length) return None
      id match {
        case "fmt " =>
          if (size < 16 || le16(b, off + 8) != 1) return None // PCM only
          channels = le16(b, off + 10)
          sampleRate = le32(b, off + 12)
          bits = le16(b, off + 22)
        case "data" => dataOff = off + 8; dataLen = size
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataOff < 0)
      return None
    val nSamples = dataLen / 2
    val frames = nSamples / channels
    val features = Array.tabulate(8) { i =>
      val from = i * nSamples / 8
      val until = (i + 1) * nSamples / 8
      if (until <= from) 0f
      else {
        var s = 0.0; var j = from
        while (j < until) {
          val v = le16(b, dataOff + 2 * j).toShort.toDouble / 32768.0
          s += v * v
          j += 1
        }
        math.sqrt(s / (until - from)).toFloat
      }
    }
    Some((frames, sampleRate, channels, features))
  }

  /** Decompression-bomb guard: refuse a full raster decode when the
    * header-declared pixel count exceeds this (16.7M px ≈ a 4096×4096
    * frame, a ~67 MB ARGB raster — per-task, times 32 local threads).
    * A tiny crafted PNG/GIF can declare 60000×60000 and ImageIO.read
    * would allocate the multi-GB raster from the HEADER, throwing
    * OutOfMemoryError (not caught by NonFatal) before a single
    * compressed byte is validated — so dimensions are checked
    * header-only, before any raster exists. */
  private val MaxDecodePixels = 1L << 24

  /** PNG / JPEG / GIF magic — sniffed BEFORE handing bytes to ImageIO
    * so arbitrary binary payloads never pay a codec parse attempt. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    (b.length > 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
    (b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) ||
    (b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')

  /** REAL decode of compressed PNG/JPEG/GIF via `javax.imageio` — the
    * codecs ship inside the JDK, so "no image libraries in the
    * container" does not apply to them. Dimensions from the decoded
    * raster, channels from the color model (3, or 4 with alpha),
    * features = mean intensity per channel in R,G,B[,A] order. Pixels
    * are read one ROW at a time (no w×h driver-side buffer for huge
    * images). Dimensions are validated from the HEADER (reader
    * getWidth/getHeight — no raster) against [[MaxDecodePixels]] before
    * the full decode, so a crafted 60000×60000 1 KB payload returns
    * None instead of OOM-killing the executor. Undecodable or non-image
    * payloads return None — the caller's stub path. The input stream is
    * a per-call MemoryCacheImageInputStream (pure in-memory; avoids
    * both per-payload tmp-file spooling and the JVM-global
    * ImageIO.setUseCache flip). */
  def decodeImage(b: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    if (!looksLikeImage(b)) return None
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      val img =
        try {
          reader.setInput(iis, true, true)
          // header-only dimension probe, then the guarded full decode
          val w0 = reader.getWidth(0); val h0 = reader.getHeight(0)
          if (w0 <= 0 || h0 <= 0 || w0.toLong * h0 > MaxDecodePixels) return None
          reader.read(0)
        } finally reader.dispose()
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val channels = if (img.getColorModel.hasAlpha) 4 else 3
      val sums = new Array[Long](4)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          sums(0) += (p >>> 16) & 0xff
          sums(1) += (p >>> 8) & 0xff
          sums(2) += p & 0xff
          sums(3) += (p >>> 24) & 0xff
          x += 1
        }
        y += 1
      }
      val nPix = w.toLong * h
      val features = Array.tabulate(8)(i =>
        if (i < channels) (sums(i).toDouble / nPix / 255.0).toFloat else 0f)
      Some((w, h, channels, features))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Deterministic 24-bit BI_RGB BMP fixture bytes: `w`×`h`, every
    * pixel the same (r,g,b) — the byte-level inverse of [[decodeBmp]],
    * used by the mm2 gate to drive the REAL decode path with payloads
    * whose expected decode output is computable arithmetically (no
    * reference decoder needed on the oracle side). */
  def encodeBmp24(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
    buf.putInt(0).putInt(0)
    var row = 0
    while (row < h) {
      var x = 0
      while (x < w) { // pixel order B,G,R
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row += 1
    }
    buf.array()
  }

  /** Deterministic solid-color PNG fixture: encoded through the same
    * JDK codec family [[decodeImage]] reads with. The exact byte
    * stream is encoder-dependent, but the decoded pixels (hence the
    * mm2 gate's output) are fully determined by (w, h, r, g, b). */
  def encodePngSolid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Format-sniffing decode: real BMP/WAV/PNG/JPEG/GIF parsing when
    * the payload is one, the deterministic stub otherwise. */
  def decodeAny(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
    decodeBmp(bytes).orElse(decodeWav(bytes)).orElse(decodeImage(bytes))
      .getOrElse(decodeStub(bytes))

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
          val (w, h, c, feats) = decodeAny(payload)
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
