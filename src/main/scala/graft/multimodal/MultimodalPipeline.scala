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

/** Decoded-media features. `MediaCodec.decode` is a STUB (this
  * container has no image/audio libs): it derives deterministic fake
  * "decoded" dimensions/samples from the payload bytes, but the Spark
  * plumbing around it — schema, batch iteration, partition-local
  * execution, frame sampling — is the real production shape: swap the
  * stub body for an actual codec (JavaCPP/FFmpeg, ImageIO) and nothing
  * else changes.
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

object MediaCodec {
  /** STUB decode: deterministic pseudo-decode of a payload. A real
    * implementation would hand `bytes` to a codec; everything after
    * (feature shape, sampling) is unchanged. */
  def decode(bytes: Array[Byte], mediaType: String): (Int, Int, Int) = {
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
