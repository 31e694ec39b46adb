package graft

import graft.multimodal._

class MultimodalSpec extends SparkSpec {

  private lazy val media = MultimodalPipeline.mediaFromDocuments(spark, sfDir)
  private lazy val feats = MultimodalPipeline.extractFeatures(media)

  test("media dataset covers all media types with non-empty payloads") {
    val types = media.collect().groupBy(_.media_type).view.mapValues(_.length)
    assert(types.keySet == Set("image", "audio", "video"))
    assert(media.collect().forall(_.content.nonEmpty))
  }

  test("decode stub is deterministic and features are well-formed") {
    val a = feats.collect().sortBy(_.media_id)
    val b = MultimodalPipeline.extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.map(_.width).sameElements(b.map(_.width)))
    assert(a.forall(f => f.width >= 1 && f.width <= 640))
    assert(a.forall(f => f.height >= 1 && f.height <= 480))
    assert(a.forall(f => f.n_frames >= 1))
    assert(a.filter(_.media_type == "video").forall(_.n_frames >= 2))
    // histogram is a probability distribution
    assert(a.forall(f => math.abs(f.histogram.sum - 1.0) < 1e-9))
  }

  test("frame sampling explodes every 2nd frame index") {
    val sampled = MultimodalPipeline.sampleFrames(feats, every = 2)
    val byId = sampled.collect().groupBy(_.getLong(0))
    val nFrames = feats.collect().map(f => f.media_id -> f.n_frames).toMap
    byId.foreach { case (id, rows) =>
      val expected = (0 until nFrames(id) by 2).toSeq
      assert(rows.map(_.getInt(3)).sorted.toSeq == expected)
    }
  }

  test("resize caps the longest side preserving aspect ratio") {
    val resized = MultimodalPipeline.resize(feats, maxSide = 100).collect()
    val originals = feats.collect().map(f => f.media_id -> f).toMap
    resized.foreach { r =>
      val o = originals(r.media_id)
      assert(math.max(r.width, r.height) <= 100)
      if (math.max(o.width, o.height) <= 100)
        assert(r.width == o.width && r.height == o.height)
      else if (math.min(r.width, r.height) >= 5) {
        // ratio check only where integer rounding can't dominate
        val ratioO = o.width.toDouble / o.height
        val ratioR = r.width.toDouble / r.height
        assert(math.abs(ratioO - ratioR) / ratioO < 0.2)
      }
    }
  }

  test("media stats aggregates per type") {
    val stats = MultimodalPipeline.mediaStats(feats).collect()
    assert(stats.length == 3)
    assert(stats.forall(_.getLong(1) > 0))
  }

  // ---- REAL WAV codec (round 6): generated PCM fixtures decoded ----
  // ---- end-to-end through the partition-local Spark path        ----

  /** A sampleRate-Hz mono sine at `freq` Hz, `ms` long, amplitude
    * `amp` of full scale — a genuine PCM signal with known duration,
    * peak and rms (sine rms = amp/√2). */
  private def sineWav(sampleRate: Int, freq: Double, ms: Int,
      amp: Double): Array[Byte] = {
    val n = sampleRate * ms / 1000
    val samples = Array.tabulate[Short](n) { i =>
      (math.sin(2 * math.Pi * freq * i / sampleRate) * amp * 32767).toShort
    }
    MediaCodec.encodeWavPcm16(sampleRate, 1, samples)
  }

  test("WAV parser decodes a generated 16-bit PCM fixture exactly") {
    val bytes = sineWav(44100, 440.0, ms = 250, amp = 0.5)
    val w = MediaCodec.parseWav(bytes).get
    assert(w.sampleRate == 44100 && w.channels == 1 && w.bitsPerSample == 16)
    assert(w.nSampleFrames == 44100L * 250 / 1000)
    assert(w.durationMs == 250)
    // peak: the sine grid doesn't hit the crest exactly, but 250ms of
    // 440Hz comes within a fraction of a percent of amp
    assert(math.abs(w.peak - 0.5) < 0.005, s"peak=${w.peak}")
    // sine rms = amp/sqrt(2)
    assert(math.abs(w.rms - 0.5 / math.sqrt(2)) < 0.005, s"rms=${w.rms}")
  }

  test("WAV parser walks unknown chunks and rejects malformed payloads") {
    // splice a LIST chunk between fmt and data: parser must skip it
    val base = sineWav(8000, 100.0, ms = 50, amp = 0.25)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val listChunk = "LIST".getBytes(ascii) ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes(ascii)
    val spliced = java.nio.ByteBuffer
      .allocate(base.length + listChunk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(base, 0, 36) // RIFF header + fmt chunk
      .put(listChunk)
      .put(base, 36, base.length - 36)
      .array()
    // patch the RIFF size for the inserted chunk
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, base.length - 8 + listChunk.length)
    val w = MediaCodec.parseWav(spliced).get
    assert(w.sampleRate == 8000 && w.durationMs == 50)
    assert(math.abs(w.peak - 0.25) < 0.01)
    // malformed: wrong magic, truncated data chunk, compressed format
    assert(MediaCodec.parseWav("not a wav at all".getBytes(ascii)).isEmpty)
    assert(MediaCodec.parseWav(base.take(60)).isEmpty)
    val compressed = base.clone()
    java.nio.ByteBuffer.wrap(compressed)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(20, 3.toShort)
    assert(MediaCodec.parseWav(compressed).isEmpty)
  }

  test("BMP parser decodes a generated 24-bit fixture exactly") {
    // 6x4 left-to-right grayscale gradient: intensity of column x is
    // x*51 (0, 51, ..., 255); known mean = (0+51+102+153+204+255)/6/255
    val px = Array.tabulate(4, 6)((_, x) => (x * 51, x * 51, x * 51))
    val bytes = MediaCodec.encodeBmp24(px.map(_.toArray))
    val b = MediaCodec.parseBmp(bytes).get
    assert(b.width == 6 && b.height == 4 && b.bitsPerPixel == 24)
    assert(math.abs(b.meanIntensity - 127.5 / 255.0) < 1e-9,
      s"mean=${b.meanIntensity}")
    // width 6 → 18-byte rows padded to 20: the parser must honor the
    // 4-byte row stride (a naive contiguous read would smear rows)
    assert(bytes.length == 54 + 20 * 4)
    // decode() routes a real BMP to its true dimensions
    assert(MediaCodec.decode(bytes, "image") == (6, 4, 1))
    // malformed payloads fall back: wrong magic, truncated, compressed
    assert(MediaCodec.parseBmp("not a bitmap".getBytes).isEmpty)
    assert(MediaCodec.parseBmp(bytes.take(60)).isEmpty)
    val rle = bytes.clone()
    java.nio.ByteBuffer.wrap(rle).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 1) // BI_RLE8
    assert(MediaCodec.parseBmp(rle).isEmpty)
  }

  test("image features flow end-to-end through the partition-local path") {
    import spark.implicits._
    def gray(w: Int, h: Int, v: Int) =
      MediaCodec.encodeBmp24(Array.fill(h)(Array.fill(w)((v, v, v))))
    val fixtures = Seq(
      MediaRecord(1L, "image", gray(8, 5, 200), "gen"),
      MediaRecord(2L, "image", gray(3, 3, 0), "gen"),
      MediaRecord(3L, "image", "not an image".getBytes, "doc"))
    val out = MultimodalPipeline.extractImageFeatures(
        spark.createDataset(fixtures).repartition(2))
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(out(0).width == 8 && out(0).height == 5 && out(0).n_pixels == 40)
    assert(math.abs(out(0).mean_intensity - 200.0 / 255) < 1e-9)
    assert(out(1).mean_intensity == 0.0)
  }

  test("audio features flow end-to-end through the partition-local path") {
    import spark.implicits._
    val fixtures = Seq(
      MediaRecord(1L, "audio", sineWav(44100, 440.0, 250, 0.5), "gen"),
      MediaRecord(2L, "audio", sineWav(16000, 220.0, 1000, 0.9), "gen"),
      // non-WAV payload: must be gated out, not faked
      MediaRecord(3L, "audio", "plain text payload".getBytes, "doc"))
    val ds = spark.createDataset(fixtures).repartition(2)
    val out = MultimodalPipeline.extractAudioFeatures(ds)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(out(0).sample_rate == 44100 && out(0).duration_ms == 250)
    assert(out(1).sample_rate == 16000 && out(1).duration_ms == 1000)
    assert(math.abs(out(1).peak - 0.9) < 0.005)
    assert(math.abs(out(1).rms - 0.9 / math.sqrt(2)) < 0.005)
    // decode() routes a real WAV to real facts: channels, bit depth,
    // 100ms frame windows — and q36/q68's document payloads (non-WAV)
    // keep their deterministic stub values
    val (w, h, f) = MediaCodec.decode(fixtures(1).content, "audio")
    assert((w, h, f) == (1, 16, 10))
    val doc = "document text".getBytes
    assert(MediaCodec.decode(doc, "audio") ==
      MediaCodec.decode(doc, "audio"))
  }
}
