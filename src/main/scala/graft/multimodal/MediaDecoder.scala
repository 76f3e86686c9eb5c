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

  /** Guarded RIFF/WAVE chunk walk for 16-bit PCM: returns
    * (dataOff, dataLen, channels, sampleRate), or None for
    * non-RIFF/WAVE payloads, non-PCM encodings, non-16-bit samples,
    * or chunk sizes escaping the payload. */
  private def parseWavPcm16(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
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
    if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataOff < 0) None
    else Some((dataOff, dataLen, channels, sampleRate))
  }

  /** REAL decode of a PCM WAV: channel count / sample rate / sample
    * count from the RIFF chunks (mapped onto the image-shaped record
    * as width = frames per channel, height = sample rate), features =
    * RMS amplitude (normalized to [0,1]) of each octile of the 16-bit
    * sample stream. Returns None for non-RIFF/WAVE payloads or
    * non-PCM encodings. */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    val (dataOff, dataLen, channels, sampleRate) = parseWavPcm16(b) match {
      case Some(p) => p
      case None => return None
    }
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

  /** [[resizeBoxRaw]]'s target-grid cap: accumulator cells are 32 B
    * (4 Longs) vs 4 B per raster pixel, so the grid cap is 64× lower
    * than [[MaxDecodePixels]] for the same per-task memory class. */
  private val MaxResizeCells = 1L << 18

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
  /** The ONE guarded ImageIO read ([[decodeImage]] and
    * [[streamPixels]] both go through it): magic sniff, per-call
    * in-memory input stream, header-only dimension probe against
    * [[MaxDecodePixels]] BEFORE the raster exists, reader disposal,
    * NonFatal fallback. Returns None for undecodable / non-image /
    * bomb-guarded payloads. */
  private def readGuardedImage(
      b: Array[Byte]): Option[java.awt.image.BufferedImage] = {
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
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(img)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  def decodeImage(b: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    val img = readGuardedImage(b) match {
      case Some(i) => i
      case None => return None
    }
    {
      val w = img.getWidth; val h = img.getHeight
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
    }
  }

  /** Stream every pixel of an image payload in row-major IMAGE order
    * as `visit(x, y, r, g, b)` (always R,G,B regardless of the
    * container's byte order), holding at most one pixel row in memory.
    * BMP payloads are parsed directly (bottom-up files are flipped to
    * image coordinates — unlike mean features, positional consumers
    * such as [[resizeBox]] are NOT orientation-invariant); PNG/JPEG/GIF
    * go through the same header-guarded `javax.imageio` row reads as
    * [[decodeImage]]. `onDims(w, h)` fires once, before the first
    * pixel, so positional consumers can size their accumulators.
    * Returns the image dimensions, or None for undecodable /
    * non-image / bomb-guarded payloads. */
  private def streamPixels(b: Array[Byte])(onDims: (Int, Int) => Unit)(
      visit: (Int, Int, Int, Int, Int) => Unit): Option[(Int, Int)] = {
    // BMP branch: same guarded header parse as decodeBmp
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) >= 40) {
      val width = le32(b, 18)
      val rawHeight = le32(b, 22)
      val height = math.abs(rawHeight)
      val bpp = le16(b, 28)
      if (width <= 0 || height == 0 || le32(b, 30) != 0 ||
        (bpp != 24 && bpp != 32)) return None
      val channels = bpp / 8
      val pixOff = le32(b, 10)
      val strideL = ((width.toLong * channels + 3) / 4) * 4
      if (strideL <= 0 || strideL > b.length || height > b.length) return None
      val stride = strideL.toInt
      if (pixOff < 0 || pixOff.toLong + strideL * height > b.length)
        return None
      onDims(width, height)
      var row = 0
      while (row < height) {
        // positive header height = bottom-up storage: file row 0 is
        // the BOTTOM image row
        val y = if (rawHeight > 0) height - 1 - row else row
        var x = 0
        val base = pixOff + row * stride
        while (x < width) { // byte order B,G,R[,A]
          val o = base + x * channels
          visit(x, y, b(o + 2) & 0xff, b(o + 1) & 0xff, b(o) & 0xff)
          x += 1
        }
        row += 1
      }
      return Some((width, height))
    }
    readGuardedImage(b).map { img =>
      val w = img.getWidth; val h = img.getHeight
      onDims(w, h)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          visit(x, y, (p >>> 16) & 0xff, (p >>> 8) & 0xff, p & 0xff)
          x += 1
        }
        y += 1
      }
      (w, h)
    }
  }

  /** Box-binned area RESIZE of one image payload to an `outW`×`outH`
    * grid: input pixel (x, y) contributes its full value to output
    * cell (⌊x·outW/inW⌋, ⌊y·outH/inH⌋); each cell's value is the mean
    * of its binned pixels. This is the standard anti-aliased
    * downsample of a training-data image pipeline (exactly the area
    * average when the grid divides the image; pixel-granular binning
    * otherwise), chosen over interpolating kernels because its output
    * is INTEGER arithmetic on the input — a DuckDB oracle can replay
    * it bit-exactly with no image library.
    *
    * Memory is O(outW·outH), never O(inW·inH): cell sums accumulate
    * while [[streamPixels]] walks rows, so a huge input image resizes
    * in one pass with a single row buffered. The target grid is
    * capped at [[MaxResizeCells]] — accumulator cells cost 32 bytes
    * each (one count + three sums, all Long), 4× an ARGB raster pixel,
    * so reusing the raster-sized [[MaxDecodePixels]] here would allow
    * ~537 MB of per-task accumulators (the OOM class the decode guard
    * exists to prevent). 2^18 cells = a 512×512 thumbnail grid at
    * ≤8.4 MB per task.
    *
    * @return (inW, inH, nPix, sums): `nPix(cy·outW+cx)` = pixels
    *         binned into the cell, `sums((cy·outW+cx)·3 + c)` = that
    *         cell's channel-c (R,G,B) intensity sum. None for
    *         undecodable payloads or non-positive / over-cap target
    *         dims. */
  def resizeBoxRaw(b: Array[Byte], outW: Int, outH: Int)
      : Option[(Int, Int, Array[Long], Array[Long])] = {
    if (outW <= 0 || outH <= 0 || outW.toLong * outH > MaxResizeCells)
      return None
    val nPix = new Array[Long](outW * outH)
    val sums = new Array[Long](outW * outH * 3)
    var dimW = 1; var dimH = 1
    streamPixels(b) { (w, h) => dimW = w; dimH = h } { (x, y, r, g, bl) =>
      val cx = ((x.toLong * outW) / dimW).toInt
      val cy = ((y.toLong * outH) / dimH).toInt
      val cell = cy * outW + cx
      nPix(cell) += 1
      sums(cell * 3) += r
      sums(cell * 3 + 1) += g
      sums(cell * 3 + 2) += bl
    } match {
      case Some((w, h)) => Some((w, h, nPix, sums))
      case None => None
    }
  }

  /** Deterministic 24-bit BI_RGB BMP fixture bytes: `w`×`h`, pixel
    * (x, y) colored by `px` (returning packed 0xRRGGBB) — the
    * byte-level inverse of [[decodeBmp]]/[[streamPixels]], used by the
    * mm2/mm3 gates to drive the REAL decode path with payloads whose
    * expected decode output is computable arithmetically (no reference
    * decoder needed on the oracle side). Rows are stored bottom-up
    * (positive header height), the common BMP layout. */
  def encodeBmp24With(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
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
      val y = h - 1 - row // bottom-up: file row 0 = bottom image row
      var x = 0
      while (x < w) { // pixel byte order B,G,R
        val p = px(x, y)
        buf.put((p & 0xff).toByte).put(((p >>> 8) & 0xff).toByte)
          .put(((p >>> 16) & 0xff).toByte)
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row += 1
    }
    buf.array()
  }

  /** Solid-color BMP fixture (mm2 gate). */
  def encodeBmp24(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
    encodeBmp24With(w, h)((_, _) => (r << 16) | (g << 8) | b)

  /** Deterministic PNG fixture with pixel (x, y) colored by `px`
    * (packed 0xRRGGBB): encoded through the same JDK codec family
    * [[decodeImage]] reads with. The exact byte stream is
    * encoder-dependent, but PNG is lossless so the decoded pixels
    * (hence the mm2/mm3 gates' output) are fully determined by
    * (w, h, px). */
  def encodePngWith(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, px(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    // explicit in-memory image stream: ImageIO.write(…, OutputStream)
    // would otherwise spool through a temp FILE per call (default
    // useCache=true) — per-payload disk I/O inside the fixture hot
    // loop, and an outright IOException under an unwritable tmpdir.
    // Mirror of the decode side's MemoryCacheImageInputStream.
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try javax.imageio.ImageIO.write(img, "png", ios)
    finally ios.close()
    out.toByteArray
  }

  /** Solid-color PNG fixture (mm2 gate). */
  def encodePngSolid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
    encodePngWith(w, h)((_, _) => (r << 16) | (g << 8) | b)

  /** Deterministic 16-bit PCM WAV fixture bytes — the byte-level
    * inverse of [[parseWavPcm16]]/[[decodeWav]] (mm5 gate and specs).
    * `samples` is the interleaved frame stream. */
  def encodeWavPcm16(
      rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** RESAMPLE one 16-bit PCM payload by integer decimation: keep every
    * `factor`-th FRAME (all channels of it), drop the rest — the audio
    * analog of [[sampleFrames]]' stride (a production pipeline would
    * low-pass first; decimation is the part with data-movement shape,
    * and skipped frames are never read). Energy/peak of the KEPT
    * samples come back as exact integers (sum of squares, max |s|) so
    * a DuckDB oracle replays them without float-summation-order
    * hazards.
    *
    * @return (framesIn, rateIn, channels, framesOut, rateOut,
    *         sumsqOut, peakOut); None for non-PCM-16 payloads or
    *         factor <= 0. */
  def resamplePcmRaw(b: Array[Byte], factor: Int)
      : Option[(Int, Int, Int, Int, Int, Long, Long)] = {
    if (factor <= 0) return None
    parseWavPcm16(b).map { case (dataOff, dataLen, channels, rate) =>
      val framesIn = dataLen / 2 / channels
      var sumsq = 0L; var peak = 0L; var framesOut = 0
      var f = 0
      while (f < framesIn) {
        var c = 0
        while (c < channels) {
          val v = le16(b, dataOff + 2 * (f * channels + c)).toShort.toLong
          sumsq += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          c += 1
        }
        framesOut += 1
        f += factor
      }
      (framesIn, rate, channels, framesOut, rate / factor, sumsq, peak)
    }
  }

  /** Energy-gated PCM segmentation — the silence-trim / VAD-shape
    * primitive of a speech-curation pipeline: one streaming pass over
    * the decoded 16-bit frames (real RIFF parse, like
    * [[resamplePcmRaw]]) emitting every MAXIMAL run of consecutive
    * frames whose first-channel |amplitude| ≥ `threshold`, as
    * (startFrame, nFrames, sum of squared amplitudes). O(1) state per
    * payload (current-run accumulator only), integer-exact output so
    * a SQL oracle can replay the gating and run-grouping bit-for-bit.
    * None for non-PCM payloads or a non-positive threshold. */
  def segmentPcmRaw(b: Array[Byte], threshold: Int)
      : Option[(Int, Seq[(Int, Int, Long)])] = {
    if (threshold <= 0) return None
    parseWavPcm16(b).map { case (dataOff, dataLen, channels, _) =>
      val framesIn = dataLen / 2 / channels
      val segs = Seq.newBuilder[(Int, Int, Long)]
      var start = -1; var sumsq = 0L
      var f = 0
      while (f < framesIn) {
        val v = le16(b, dataOff + 2 * f * channels).toShort.toLong
        if (math.abs(v) >= threshold) {
          if (start < 0) { start = f; sumsq = 0L }
          sumsq += v * v
        } else if (start >= 0) {
          segs += ((start, f - start, sumsq)); start = -1
        }
        f += 1
      }
      if (start >= 0) segs += ((start, framesIn - start, sumsq))
      (framesIn, segs.result())
    }
  }

  /** [[segmentPcmRaw]] over a frame of (id, payload) rows: one row per
    * voiced segment — (id, frames_in, seg_idx 1-based, start_frame,
    * n_frames, sumsq). Same shuffle-free one-task-per-partition shape
    * as [[decode]]; undecodable payloads emit no rows. */
  def segmentPcm(
      df: DataFrame, idCol: String, binCol: String,
      threshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          segmentPcmRaw(payload, threshold).iterator.flatMap {
            case (framesIn, segs) =>
              segs.iterator.zipWithIndex.map {
                case ((start, len, sumsq), i) =>
                  (id, framesIn, i + 1, start, len, sumsq)
              }
          }
        }
      }
      .toDF(idCol, "frames_in", "seg_idx", "start_frame", "n_frames",
        "sumsq")
  }

  /** Resample every (id, payload) PCM row by integer decimation
    * ([[resamplePcmRaw]]) — same execution shape as [[decode]]: one
    * task per partition, no shuffle, streaming. Non-PCM payloads emit
    * no rows. */
  def resamplePcm(
      df: DataFrame, idCol: String, binCol: String, factor: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          resamplePcmRaw(payload, factor).map {
            case (fi, ri, ch, fo, ro, sumsq, peak) =>
              (id, fi, ri, ch, fo, ro, sumsq, peak)
          }
        }
      }
      .toDF(idCol, "frames_in", "rate_in", "channels", "frames_out",
        "rate_out", "sumsq_out", "peak_out")
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

  /** Resize every (id, payload) image row to an `outW`×`outH` grid
    * ([[resizeBoxRaw]] box-binned area average) and emit ONE ROW PER
    * NON-EMPTY CELL: (id, width, height, cell_x, cell_y, n_pix,
    * r_sum, g_sum, b_sum) — the cell mean is `sum / (n_pix * 255.0)`,
    * left to the caller so the emitted values stay exact integers.
    * Same execution shape as [[decode]]: one task per input partition,
    * no shuffle, streaming iterator, O(outW·outH) memory per payload
    * regardless of input image size. Undecodable payloads emit no
    * rows. */
  def resizeBox(
      df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          resizeBoxRaw(payload, outW, outH).iterator.flatMap {
            case (w, h, nPix, sums) =>
              Iterator.range(0, outW * outH)
                .filter(nPix(_) > 0)
                .map { cell =>
                  (id, w, h, cell % outW, cell / outW, nPix(cell),
                    sums(cell * 3), sums(cell * 3 + 1), sums(cell * 3 + 2))
                }
          }
        }
      }
      .toDF(idCol, "width", "height", "cell_x", "cell_y", "n_pix",
        "r_sum", "g_sum", "b_sum")
  }

  /** 64-bit average-hash (aHash) of one image payload: box-resize to
    * an 8×8 grid ([[resizeBoxRaw]]), per-cell gray level = summed
    * r+g+b intensity (channel-ORDER-invariant, so BMP's B,G,R and
    * PNG's R,G,B byte layouts hash identically), bit i (= cell_y·8 +
    * cell_x) set iff cell i's per-pixel gray mean ≥ the whole image's
    * — compared integer-exactly as cross-products, so a SQL oracle
    * replays every bit with no image library. A uniform brightness
    * shift moves every cell with the mean and leaves the hash
    * unchanged — the property that makes aHash a PERCEPTUAL
    * fingerprint rather than an exact one. Returned as two 32-bit
    * halves (hi = bits 32-63): packing bit 63 into one signed 64-bit
    * value would overflow the oracle side's integer arithmetic.
    * Memory/IO cost is [[resizeBoxRaw]]'s: one streaming pass,
    * O(64 cells) state, any input size. None for undecodable
    * payloads. */
  def aHash64(b: Array[Byte]): Option[(Long, Long)] =
    resizeBoxRaw(b, 8, 8).map { case (_, _, nPix, sums) =>
      val cellGray = Array.tabulate(64)(c =>
        sums(c * 3) + sums(c * 3 + 1) + sums(c * 3 + 2))
      var totPix = 0L; var totGray = 0L
      var i = 0
      while (i < 64) { totPix += nPix(i); totGray += cellGray(i); i += 1 }
      var hi = 0L; var lo = 0L
      i = 0
      while (i < 64) {
        // cellGray(i)/nPix(i) ≥ totGray/totPix as exact cross-products
        // (cellGray ≤ 765·MaxDecodePixels and totPix ≤ MaxDecodePixels,
        // so both products stay far below Long overflow); cells an
        // undersized image leaves empty stay 0
        if (nPix(i) > 0 && cellGray(i) * totPix >= totGray * nPix(i)) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        i += 1
      }
      (hi, lo)
    }

  /** 64-bit ENVELOPE hash of a PCM WAV — the audio analog of
    * [[aHash64]], built for near-dup detection robust to the two
    * perturbations a re-encoded copy of the same recording carries:
    * a constant amplitude scale and leading/trailing silence.
    *
    *  1. per-frame magnitude = MAX over channels of `abs(sample)` —
    *     the multi-channel contract: a mono clip and its
    *     stereo-duplicated re-encode hash identically (max of equal
    *     channels = the channel), and a clip whose loud content lives
    *     in ANY one channel (silent-left/loud-right stereo) is heard,
    *     not dropped; unlike a summed mixdown, max also keeps the
    *     mono↔stereo magnitude SCALE identical, so the trim threshold
    *     means the same thing at every channel count
    *  2. trim leading/trailing silence (frame magnitude < threshold)
    *  3. split the active region into 65 equal-span windows
    *     (window of frame f = `f·65 / m`, integer division)
    *  4. per-window envelope = sum of frame magnitudes
    *  5. bit k (k < 64) = window k's MEAN magnitude ≥ window k+1's, as
    *     exact integer cross-products (`sum·count` ≤ 32768·frames² —
    *     far below Long overflow)
    *
    * Mean DELTAS are invariant to amplitude scaling (both sides of
    * every comparison scale together) and to padding (trimmed before
    * windowing). Two streaming passes over the payload bytes — trim
    * bounds, then window folds — O(windows) state, never a samples
    * buffer. None for non-PCM payloads and all-silent clips. Windows
    * an m < 65 clip leaves empty compare as mean 0. */
  def envHash64(b: Array[Byte], threshold: Int): Option[(Long, Long)] =
    parseWavPcm16(b).flatMap { case (dataOff, dataLen, channels, _) =>
      val framesIn = dataLen / 2 / channels
      def mag(f: Int): Int = {
        var best = 0; var c = 0
        while (c < channels) {
          val v = math.abs(
            le16(b, dataOff + 2 * (f * channels + c)).toShort.toInt)
          if (v > best) best = v
          c += 1
        }
        best
      }
      var first = -1; var last = -1
      var f = 0
      while (f < framesIn) {
        if (mag(f) >= threshold) { if (first < 0) first = f; last = f }
        f += 1
      }
      if (first < 0) None
      else {
        val m = last - first + 1
        val W = 65
        val sums = new Array[Long](W)
        val cnts = new Array[Long](W)
        f = 0
        while (f < m) {
          val w = (f.toLong * W / m).toInt
          sums(w) += mag(first + f)
          cnts(w) += 1
          f += 1
        }
        var hi = 0L; var lo = 0L
        var k = 0
        while (k < 64) {
          if (sums(k) * math.max(cnts(k + 1), 1L) >=
              sums(k + 1) * math.max(cnts(k), 1L)) {
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
          k += 1
        }
        Some((hi, lo))
      }
    }

  /** The ONE (id, payload) → (id, hash_hi, hash_lo) signature frame —
    * [[aHash]], [[envHash]], and [[videoHash]] all go through it, so
    * the two-unsigned-32-bit-halves contract the shared hamming-band
    * machinery relies on (and the null-payload guard, and the
    * no-row-on-None drop-out semantics) is defined once. Same
    * shuffle-free one-task-per-partition shape as [[decode]]. */
  private def sigFrame(df: DataFrame, idCol: String, binCol: String)(
      hash: Array[Byte] => Option[(Long, Long)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          hash(payload).map { case (hi, lo) => (id, hi, lo) }
        }
      }
      .toDF(idCol, "hash_hi", "hash_lo")
  }

  /** [[envHash64]] over a frame of (id, payload) rows ([[sigFrame]]);
    * one row per decodable non-silent payload. */
  def envHash(
      df: DataFrame, idCol: String, binCol: String,
      threshold: Int): DataFrame =
    sigFrame(df, idCol, binCol)(envHash64(_, threshold))

  /** [[aHash64]] over a frame of (id, payload) rows ([[sigFrame]]);
    * one row per decodable payload. */
  def aHash(df: DataFrame, idCol: String, binCol: String): DataFrame =
    sigFrame(df, idCol, binCol)(aHash64)

  /** 64-bit perceptual hash of a VIDEO-like payload (fixed-size frame
    * windows, the [[sampleFrames]] container contract): sample
    * `samples` frames at fixed TIME FRACTIONS — slot k reads frame
    * ⌊k·nFrames/samples⌋ — aHash each sampled frame ([[aHash64]]),
    * and fold to one signature by PER-BIT MAJORITY (bit i set iff
    * ≥ half the decodable sampled frames set it; exact-half ties set
    * the bit). Built for the two perturbations a re-encoded copy of
    * the same footage carries:
    *
    *  - a FRAME-RATE change: time-fraction sampling indexes by
    *    position in the clip, not absolute frame number, so a
    *    frame-doubled re-encode (frame i = source frame ⌊i/2⌋)
    *    samples byte-identical content — ⌊⌊2a⌋/2⌋ = ⌊a⌋ makes slot
    *    k's frame EXACTLY the source's slot-k frame;
    *  - a global BRIGHTNESS shift: inherited from [[aHash64]]'s
    *    mean-threshold invariance per frame, and per-bit majority
    *    never amplifies per-frame bit noise (a folded bit flips only
    *    when half the sampled frames flip it).
    *
    * Skipped frames are never copied or decoded — each slot jumps
    * straight to its byte offset, so cost is O(samples) frame decodes
    * regardless of clip length (the 100 TB point: a signature pass
    * over a video corpus touches `samples/nFrames` of the bytes).
    * Slots may repeat a frame when the clip is shorter than
    * `samples`; repeats vote again, keeping the fold a pure function
    * of the slot sequence. None when no sampled frame decodes or the
    * payload is shorter than one frame. */
  def videoHash64(
      b: Array[Byte], frameBytes: Int, samples: Int): Option[(Long, Long)] = {
    if (frameBytes <= 0 || samples <= 0 || b.length < frameBytes) return None
    val nFrames = b.length / frameBytes
    val ones = new Array[Int](64)
    var sampled = 0
    var k = 0
    while (k < samples) {
      val idx = (k.toLong * nFrames / samples).toInt
      val frame = java.util.Arrays.copyOfRange(
        b, idx * frameBytes, (idx + 1) * frameBytes)
      aHash64(frame) match {
        case Some((hi, lo)) =>
          sampled += 1
          var i = 0
          while (i < 64) {
            val set =
              if (i < 32) ((lo >>> i) & 1L) == 1L
              else ((hi >>> (i - 32)) & 1L) == 1L
            if (set) ones(i) += 1
            i += 1
          }
        case None => ()
      }
      k += 1
    }
    if (sampled == 0) None
    else {
      var hi = 0L; var lo = 0L
      var i = 0
      while (i < 64) {
        if (2 * ones(i) >= sampled) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        i += 1
      }
      Some((hi, lo))
    }
  }

  /** [[videoHash64]] over a frame of (id, payload) rows
    * ([[sigFrame]]); one row per hashable payload. */
  def videoHash(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, samples: Int): DataFrame =
    sigFrame(df, idCol, binCol)(videoHash64(_, frameBytes, samples))

  /** Shot-boundary segmentation over a fixed-frame-window video-like
    * payload — the video twin of [[segmentPcmRaw]]'s audio VAD shape,
    * the clip-extraction primitive a video-curation pipeline runs
    * before sampling training clips: one streaming pass over the
    * frames, per-frame 64-bit aHash ([[aHash64]]), hamming distance
    * to the previous decodable frame, a CUT wherever the distance
    * exceeds `threshold`. Emits every maximal run of cut-free
    * consecutive frames as (startFrame, nFrames, cutHamming — the
    * distance that OPENED the run; 0 for the clip's first run). O(1)
    * state per payload (previous hash + run accumulator — at 100 TB
    * of video the operator never buffers a clip), integer-exact so a
    * SQL oracle replays the per-frame hash, the deltas, and the
    * run-grouping bit-for-bit. An UNDECODABLE frame closes the
    * current run and belongs to no segment (the corrupt-GOP analog
    * of silence in [[segmentPcmRaw]]); the next decodable frame
    * opens a fresh run with cutHamming 0 (no cross-gap comparison).
    * None for an empty/short payload or non-positive frameBytes. */
  def sceneSegmentsRaw(b: Array[Byte], frameBytes: Int, threshold: Int)
      : Option[(Int, Seq[(Int, Int, Int)])] = {
    if (frameBytes <= 0 || threshold < 0 || b.length < frameBytes)
      return None
    val nFrames = b.length / frameBytes
    val segs = Seq.newBuilder[(Int, Int, Int)]
    var prevHi = 0L; var prevLo = 0L; var havePrev = false
    var start = -1; var openHam = 0
    var f = 0
    while (f < nFrames) {
      val frame = java.util.Arrays.copyOfRange(
        b, f * frameBytes, (f + 1) * frameBytes)
      aHash64(frame) match {
        case Some((hi, lo)) =>
          if (!havePrev) { start = f; openHam = 0 }
          else {
            val h = java.lang.Long.bitCount(hi ^ prevHi) +
              java.lang.Long.bitCount(lo ^ prevLo)
            if (h > threshold) {
              segs += ((start, f - start, openHam))
              start = f; openHam = h
            }
          }
          prevHi = hi; prevLo = lo; havePrev = true
        case None =>
          if (start >= 0) { segs += ((start, f - start, openHam)) }
          start = -1; havePrev = false; openHam = 0
      }
      f += 1
    }
    if (start >= 0) segs += ((start, nFrames - start, openHam))
    Some((nFrames, segs.result()))
  }

  /** [[sceneSegmentsRaw]] over a frame of (id, payload) rows: one row
    * per scene — (id, frames_in, scene_idx 1-based, start_frame,
    * n_frames, cut_hamming). Same shuffle-free one-task-per-partition
    * shape as [[segmentPcm]]; unhashable payloads emit no rows. */
  def sceneSegments(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, threshold: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          sceneSegmentsRaw(payload, frameBytes, threshold)
            .iterator.flatMap { case (framesIn, segs) =>
              segs.iterator.zipWithIndex.map {
                case ((start, len, ham), i) =>
                  (id, framesIn, i + 1, start, len, ham)
              }
            }
        }
      }
      .toDF(idCol, "frames_in", "scene_idx", "start_frame", "n_frames",
        "cut_hamming")
  }

  /** Frame-sampling shape for video-like payloads: treat a payload as
    * fixed-size frame windows and emit one row per SAMPLED frame with
    * a real per-frame decode ([[decodeAny]] — frames carrying a BMP /
    * PNG / WAV payload decode for real; anything else takes the
    * clearly-marked stub, the stand-in for a JNI video codec).
    * Skipped frames are never copied or decoded — the stride jumps
    * straight to the next sampled offset, so sampling 1/N touches
    * ~1/N of the frame bytes (the 100 TB point of frame sampling). A
    * short final window is emitted as-is, mirroring a truncated tail
    * GOP. */
  def sampleFrames(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, everyNth: Int): DataFrame = {
    require(frameBytes > 0 && everyNth > 0,
      s"frameBytes=$frameBytes everyNth=$everyNth must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray else bytes
          val step = frameBytes.toLong * everyNth
          Iterator.iterate(0L)(_ + step)
            .takeWhile(_ < payload.length)
            .map { off =>
              val o = off.toInt
              val end = math.min(o + frameBytes, payload.length)
              val frame = java.util.Arrays.copyOfRange(payload, o, end)
              val idx = (off / frameBytes).toInt
              val (w, h, _, feats) = decodeAny(frame)
              (id, idx, frame.length, w, h,
                if (feats.length > 0) feats(0) else 0f,
                if (feats.length > 1) feats(1) else 0f,
                if (feats.length > 2) feats(2) else 0f)
            }
        }
      }
      .toDF(idCol, "frame_idx", "frame_bytes", "width", "height",
        "c0", "c1", "c2")
  }
}
