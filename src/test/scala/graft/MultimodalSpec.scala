package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("feature extraction is deterministic and batch-shaped") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val feats2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats1.length == 30)
    assert(feats1.map(_.checksum).toSeq == feats2.map(_.checksum).toSeq)
    assert(feats1.forall(_.feature.length == 8))
    // L1-normalized histogram sums to ~1
    assert(feats1.forall(f => math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-5))
  }

  test("frame sampling yields one row per sampled timestamp of video rows") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 500).collect()
    val videos = media.collect().filter(_.kind == "video")
    val expected = videos.map(v => (v.durationMs + 499) / 500).sum
    assert(frames.length.toLong == expected)
    assert(frames.forall(_.thumbnail.length <= 16))
  }

  test("featureStats aggregates per kind") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val stats = Multimodal.featureStats(Multimodal.extractFeatures(media))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("image" -> 10L, "audio" -> 10L, "video" -> 10L))
  }
}
