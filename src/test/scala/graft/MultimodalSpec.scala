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
}
