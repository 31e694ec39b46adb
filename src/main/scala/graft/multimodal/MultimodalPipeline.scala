package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media record as a training-data pipeline would model it: an opaque
  * payload plus typed metadata. At 100 TB the payload column dominates
  * I/O, so every transform here is designed to (a) prune the payload
  * from the scan when only metadata is needed and (b) process payloads
  * partition-local with zero shuffle.
  */
final case class MediaRecord(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    content: Array[Byte],
    source: String)

/** Decoded-media features. The audio and image paths are REAL:
  * `MediaCodec` carries dependency-free parsers (and encoders, used
  * by the specs to build fixtures) for the uncompressed core of two
  * standard containers — RIFF/WAVE PCM (true sample rate / channels /
  * duration / peak / rms) and BI_RGB BMP (true dimensions / bit depth
  * / mean intensity). Payloads in any other format (and all video —
  * no pure-JVM codec for compressed formats lives in this container)
  * fall back to a deterministic pseudo-decode. The Spark plumbing —
  * schema, batch iteration, partition-local execution, frame
  * sampling — is the production shape either way: swap the fallback
  * for an actual codec (JavaCPP/FFmpeg, ImageIO) and nothing else
  * changes.
  */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    // per-sampled-frame 8-bin intensity histogram, row-major
    histogram: Array[Double])

/** Features of a REAL-decoded audio payload ([[MediaCodec.parseWav]]). */
final case class AudioFeatures(
    media_id: Long,
    sample_rate: Int,
    channels: Int,
    bits: Int,
    n_sample_frames: Long,
    duration_ms: Long,
    peak: Double,
    rms: Double)

/** A decoded RIFF/WAVE PCM stream: format header facts plus the two
  * amplitude features (peak, rms) a curation pipeline filters on,
  * both normalized to [0, 1] of full scale. */
final case class WavInfo(
    sampleRate: Int,
    channels: Int,
    bitsPerSample: Int,
    nSampleFrames: Long,
    durationMs: Long,
    peak: Double,
    rms: Double)

/** A decoded uncompressed BMP: header facts plus the mean pixel
  * intensity in [0, 1] (the cheap brightness feature an image
  * curation gate filters on). */
final case class BmpInfo(
    width: Int,
    height: Int,
    bitsPerPixel: Int,
    meanIntensity: Double)

/** Features of a REAL-decoded image payload ([[MediaCodec.parseBmp]]). */
final case class ImageFeatures(
    media_id: Long,
    width: Int,
    height: Int,
    bits: Int,
    n_pixels: Long,
    mean_intensity: Double)

object MediaCodec {

  /** REAL decode of an uncompressed RIFF/WAVE payload — a chunk-walk
    * of the container (RIFF size header, `fmt ` format block, `data`
    * PCM block; unknown chunks skipped by their declared size, odd
    * sizes padded per the RIFF spec) followed by one pass over the
    * samples for peak/rms. Supports the uncompressed core of the
    * format: PCM (audioFormat 1), 8-bit unsigned or 16-bit signed
    * little-endian, any channel count. Zero dependencies — the point
    * of choosing WAV as the real codec behind the multimodal seam.
    * Returns None for anything that isn't a well-formed PCM WAV
    * (wrong magic, truncated chunk, compressed format), which routes
    * the payload to the deterministic stub path. */
  def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int): String =
      new String(bytes, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 44 || tag4(0) != "RIFF" || tag4(8) != "WAVE")
      return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var data: Option[(Int, Int)] = None // offset, length
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag4(pos)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          fmt = Some((bb.getShort(pos + 8) & 0xffff,
            bb.getShort(pos + 10) & 0xffff,
            bb.getInt(pos + 12), bb.getShort(pos + 22) & 0xffff))
        case "data" => data = Some((pos + 8, size))
        case _ => ()
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, ch, rate, bits)), Some((off, len)))
          if ch > 0 && rate > 0 && (bits == 8 || bits == 16) =>
        val bytesPerSample = bits / 8
        val nSamples = len / bytesPerSample
        val frames = nSamples.toLong / ch
        var peak = 0.0
        var sumSq = 0.0
        var i = 0
        while (i < nSamples) {
          // normalize both widths to [-1, 1] of full scale
          val x =
            if (bits == 16) bb.getShort(off + i * 2) / 32768.0
            else ((bytes(off + i) & 0xff) - 128) / 128.0
          val ax = math.abs(x)
          if (ax > peak) peak = ax
          sumSq += x * x
          i += 1
        }
        val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
        Some(WavInfo(rate, ch, bits, frames,
          frames * 1000L / rate, peak, rms))
      case _ => None
    }
  }

  /** REAL encode: 16-bit signed PCM, interleaved, canonical 44-byte
    * header. Round-trips through [[parseWav]] bit-exactly; the specs
    * use it to build genuine fixtures. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16.toShort)
    bb.put("data".getBytes(ascii)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL decode of an uncompressed Windows BMP: BITMAPFILEHEADER
    * ("BM", pixel-data offset) + BITMAPINFOHEADER (≥40 bytes: dims,
    * planes, bpp, compression), then one pass over the pixel rows —
    * bottom-up or top-down (negative height), each row padded to a
    * 4-byte boundary per the format — for the mean intensity.
    * Supports the uncompressed core: BI_RGB (compression 0) at 24-bit
    * BGR or 8-bit grayscale-palette-free samples. Returns None for
    * anything else (wrong magic, compressed, truncated), routing the
    * payload to the deterministic stub path — same contract as
    * [[parseWav]]. Zero dependencies. */
  def parseBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val pixelOff = bb.getInt(10)
    val hdrSize = bb.getInt(14)
    if (hdrSize < 40) return None
    val width = bb.getInt(18)
    val rawHeight = bb.getInt(22)
    val height = math.abs(rawHeight)
    val bpp = bb.getShort(28) & 0xffff
    val compression = bb.getInt(30)
    if (compression != 0 || width <= 0 || height == 0 ||
        (bpp != 24 && bpp != 8)) return None
    val bytesPerPx = bpp / 8
    val rowStride = ((width * bytesPerPx + 3) / 4) * 4 // 4-byte row padding
    val need = pixelOff.toLong + rowStride.toLong * height
    if (pixelOff < 54 || need > bytes.length) return None
    var sum = 0.0
    var y = 0
    while (y < height) {
      val row = pixelOff + y * rowStride
      var x = 0
      while (x < width) {
        val p = row + x * bytesPerPx
        val v =
          if (bpp == 24) // BGR triplet → mean channel
            ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
              (bytes(p + 2) & 0xff)) / 3.0
          else (bytes(p) & 0xff).toDouble
        sum += v
        x += 1
      }
      y += 1
    }
    Some(BmpInfo(width, height, bpp,
      sum / (width.toLong * height) / 255.0))
  }

  /** REAL encode: 24-bit BI_RGB bottom-up BMP with canonical 54-byte
    * headers and padded rows. `pixels(y)(x)` = (r, g, b), row 0 = TOP
    * row (encoder flips to the format's bottom-up order). Round-trips
    * through [[parseBmp]]; the specs use it to build genuine
    * fixtures. */
  def encodeBmp24(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val height = pixels.length
    val width = pixels.head.length
    val rowStride = ((width * 3 + 3) / 4) * 4
    val dataLen = rowStride * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel offset
    bb.putInt(40).putInt(width).putInt(height) // bottom-up
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(dataLen) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, palette
    var y = height - 1 // bottom-up: last image row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixels(y)(x)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowStride - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** Decode a payload to the (width, height, n_frames) feature
    * contract. Payloads that really are one of the two supported
    * uncompressed formats decode for REAL: a PCM WAV on the audio
    * path → (channels, bitsPerSample, one frame per 100 ms window),
    * an uncompressed BMP on the image path → (width, height, 1).
    * Anything else (including all video payloads — no pure-JVM codec
    * for compressed formats lives in this container) falls back to
    * the deterministic pseudo-decode so the pipeline shape stays
    * exercised end-to-end on any corpus. */
  def decode(bytes: Array[Byte], mediaType: String): (Int, Int, Int) =
    (mediaType, parseWav(bytes), parseBmp(bytes)) match {
      case ("audio", Some(w), _) =>
        (w.channels, w.bitsPerSample,
          math.max(1, ((w.durationMs + 99) / 100).toInt))
      case ("image", _, Some(b)) =>
        (b.width, b.height, 1)
      case _ =>
        val h = java.util.Arrays.hashCode(bytes)
        val width = math.abs(h % 640) + 1
        val height = math.abs((h / 640) % 480) + 1
        val frames = mediaType match {
          case "video" => math.abs(h % 30) + 2
          case "audio" => math.abs(h % 100) + 1
          case _ => 1
        }
        (width, height, frames)
    }

  /** STUB intensity histogram over (a sample of) the payload bytes. */
  def histogram(bytes: Array[Byte], bins: Int = 8): Array[Double] = {
    val out = new Array[Double](bins)
    if (bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      out(((bytes(i) & 0xff) * bins) / 256) += 1.0
      i += 1
    }
    var b = 0
    while (b < bins) { out(b) /= bytes.length; b += 1 }
    out
  }
}

object MultimodalPipeline {

  /** Builds a MediaRecord dataset from the driver's documents table
    * (UTF-8 bytes standing in for media payloads; media_type assigned
    * round-robin so every branch is exercised). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.T.tbl(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("content"),
        col("source"))
      .as[MediaRecord]
  }

  /** Decode + feature-extract, partition-local (the mapInPandas /
    * mapPartitions batch shape): one codec invocation per record, no
    * shuffle, payloads never leave the executor. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = MediaCodec.decode(r.content, r.media_type)
        MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
          w, h, f, MediaCodec.histogram(r.content))
      }
    }
  }

  /** Typed audio decode over the REAL WAV parser, partition-local
    * like [[extractFeatures]] (payloads never leave the executor, no
    * shuffle). Non-WAV payloads are dropped — the production
    * "decodable gate" shape, where undecodable records route to a
    * dead-letter audit rather than fake features. */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodec.parseWav(r.content).map { w =>
          AudioFeatures(r.media_id, w.sampleRate, w.channels,
            w.bitsPerSample, w.nSampleFrames, w.durationMs, w.peak, w.rms)
        }
      }
    }
  }

  /** Typed image decode over the REAL BMP parser — the image twin of
    * [[extractAudioFeatures]], same partition-local decodable-gate
    * shape (undecodable payloads drop to the dead-letter side). */
  def extractImageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodec.parseBmp(r.content).map { b =>
          ImageFeatures(r.media_id, b.width, b.height, b.bitsPerPixel,
            b.width.toLong * b.height, b.meanIntensity)
        }
      }
    }
  }

  /** Resize: recompute target dimensions preserving aspect ratio
    * (longest side capped at `maxSide`) — partition-local like
    * [[extractFeatures]]; a real implementation hands pixels to the
    * codec, the dimension arithmetic and batch shape stay the same. */
  def resize(features: Dataset[MediaFeatures], maxSide: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val longest = math.max(f.width, f.height)
      if (longest <= maxSide) f
      else {
        val scale = maxSide.toDouble / longest
        f.copy(
          width = math.max(1, math.round(f.width * scale).toInt),
          height = math.max(1, math.round(f.height * scale).toInt))
      }
    }
  }

  /** Frame sampling: every k-th frame index up to the decoded frame
    * count — the row-explosion shape of video pipelines (each sampled
    * frame becomes a row, to be decoded/embedded downstream). */
  def sampleFrames(features: Dataset[MediaFeatures], every: Int): DataFrame =
    features.toDF()
      .select(col("media_id"), col("media_type"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every)))
          .as("frame_idx"))

  /** Metadata-only aggregate: byte/dimension stats per media_type.
    * Selecting no payload-derived columns from the *source* lets
    * Parquet prune the payload column entirely — the plan to check
    * with .explain at scale. */
  def mediaStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("width")).as("avg_w"),
        avg(col("height")).as("avg_h"),
        max(col("n_frames")).as("max_frames"))
}
