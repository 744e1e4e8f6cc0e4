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

  test("ImageCodec decodes real PNGs: dimensions, deterministic feature, format-invariant checksum") {
    import java.awt.image.BufferedImage
    // in-memory 20x10 gradient PNG
    val img = new BufferedImage(20, 10, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, (x * 12 << 16) | (y * 25 << 8) | 99)
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = encode("png")
    assert(Multimodal.ImageCodec.dims(png).contains((20, 10)))
    val f1 = Multimodal.ImageCodec.feature(png)
    val f2 = Multimodal.ImageCodec.feature(png)
    assert(f1.toSeq == f2.toSeq && f1.length == 8)
    assert(math.abs(f1.map(_.toDouble).sum - 1.0) < 1e-5)
    // pixel-derived checksum agrees across lossless container formats
    assert(Multimodal.ImageCodec.checksum(png) ==
      Multimodal.ImageCodec.checksum(encode("bmp")))
    // real resize: output decodes to the requested dimensions
    val small = Multimodal.ImageCodec.resize(png, 8)
    assert(Multimodal.ImageCodec.dims(small).contains((8, 8)))
    // garbage bytes are undecodable, not a crash
    assert(Multimodal.ImageCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("imageFeatures pipeline decodes distributed PNGs and drops undecodable rows") {
    val images = Multimodal.syntheticImages(spark, 12)
    val feats = Multimodal.imageFeatures(images).collect().sortBy(_.media_id)
    assert(feats.length == 12)
    // decoded dims match the generator's metadata
    val meta = images.collect().map(m => m.media_id -> (m.width, m.height)).toMap
    assert(feats.forall(f => meta(f.media_id) == (f.width, f.height)))
    assert(feats.forall(f => math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-5))
    // kind-routed extractFeatures uses the real codec for images: its
    // checksum is pixel-derived, so it matches imageFeatures' checksum
    val routed = Multimodal.extractFeatures(images, Multimodal.kindCodecs)
      .collect().sortBy(_.media_id)
    assert(routed.map(_.checksum).toSeq == feats.map(_.checksum).toSeq)
    // undecodable rows (synthetic non-image bytes) are dropped, not fatal
    val mixed = Multimodal.syntheticMedia(spark, 9) // fake payloads
    assert(Multimodal.imageFeatures(mixed).collect().isEmpty)
  }

  test("AudioCodec decodes real WAVs; features derive from samples, not bytes") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val audio = Multimodal.syntheticAudio(spark, 10)
    val feats = Multimodal.extractFeatures(audio, Multimodal.kindCodecs)
      .collect().sortBy(_.media_id)
    assert(feats.length == 10)
    // sine has a flat loudness contour: every envelope segment ≈ 1/8
    feats.foreach { f =>
      assert(math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-5)
      f.feature.foreach(v => assert(math.abs(v - 0.125f) < 0.02f,
        s"media ${f.media_id}: uneven sine envelope ${f.feature.toSeq}"))
    }
    // decoded sample count matches the generator's duration metadata
    val one = audio.filter(_.media_id == 3L).collect().head
    val Some((rate, samples)) = Multimodal.AudioCodec.decode(one.payload)
    assert(rate == 8000f)
    assert(samples.length == (8000L * one.durationMs / 1000).toInt)
    // container invariance: the same PCM as AIFF (big-endian JDK writer)
    // yields the identical checksum and feature
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = {
      val b = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        b(2 * i) = (samples(i) & 0xff).toByte
        b(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      b
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      AudioFileFormat.Type.AIFF, bos)
    val aiff = bos.toByteArray
    assert(!aiff.sameElements(one.payload), "fixture must differ at byte level")
    assert(Multimodal.AudioCodec.checksum(aiff) ==
      Multimodal.AudioCodec.checksum(one.payload))
    assert(Multimodal.AudioCodec.feature(aiff).toSeq ==
      Multimodal.AudioCodec.feature(one.payload).toSeq)
    // resample thumbnail: decodable WAV with exactly n samples
    val thumb = Multimodal.AudioCodec.resize(one.payload, 64)
    val Some((_, small)) = Multimodal.AudioCodec.decode(thumb)
    assert(small.length == 64)
    // garbage bytes are undecodable, not a crash
    assert(Multimodal.AudioCodec.decode(Array[Byte](9, 8, 7, 6)).isEmpty)
  }

  test("VideoCodec decodes real animated GIFs; envelope sees the fade-in; real frame thumbnails") {
    val videos = Multimodal.syntheticVideos(spark, 8)
    val rows = videos.collect().sortBy(_.media_id)
    // every fixture payload decodes to the generated frame count & dims
    rows.foreach { v =>
      val frames = Multimodal.VideoCodec.decodeFrames(v.payload)
      assert(frames.isDefined, s"video ${v.media_id} undecodable")
      assert(frames.get.length.toLong == v.durationMs / 100,
        s"video ${v.media_id}: frame count")
      assert(frames.get.head.getWidth == v.width &&
        frames.get.head.getHeight == v.height)
    }
    // kind-routed features: pixel-derived, deterministic, L1-normed, and
    // the fade-in makes late segments BRIGHTER than early ones
    val feats = Multimodal.extractFeatures(videos, Multimodal.kindCodecs)
      .collect().sortBy(_.media_id)
    assert(feats.length == 8)
    feats.foreach { f =>
      assert(math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-5)
      assert(f.feature.last > f.feature.head,
        s"fade-in must brighten the envelope tail: ${f.feature.toSeq}")
    }
    // checksum is pixel-derived: decoding + re-encoding the same
    // palette-exact frames yields the same checksum from different bytes
    val one = rows.head
    val reencoded = {
      import javax.imageio.{IIOImage, ImageIO}
      val bos = new java.io.ByteArrayOutputStream()
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      val w = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        w.setOutput(out); w.prepareWriteSequence(null)
        Multimodal.VideoCodec.decodeFrames(one.payload).get.foreach(f =>
          w.writeToSequence(new IIOImage(f, null, null), null))
        w.endWriteSequence()
      } finally { w.dispose(); out.close() }
      bos.toByteArray
    }
    assert(Multimodal.VideoCodec.checksum(reencoded) ==
      Multimodal.VideoCodec.checksum(one.payload))
    // sampleFrames on real GIFs: PNG-decodable 16×16 thumbnails, and the
    // sampled sequence ends on the LAST frame (fade-in: brighter than
    // the first thumbnail)
    val frames = Multimodal.sampleFrames(videos, everyMs = 100).collect()
      .filter(_.media_id == one.media_id).sortBy(_.frameIndex)
    assert(frames.length.toLong == one.durationMs / 100)
    val thumbs = frames.map(f => Multimodal.ImageCodec.decode(f.thumbnail))
    assert(thumbs.forall(t => t.isDefined &&
      t.get.getWidth == 16 && t.get.getHeight == 16))
    def meanLuma(img: java.awt.image.BufferedImage): Double = {
      var s = 0.0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000.0
      }
      s / (img.getWidth * img.getHeight)
    }
    assert(meanLuma(thumbs.last.get) > meanLuma(thumbs.head.get),
      "last sampled frame must be brighter (fade-in)")
    // garbage bytes are undecodable, not a crash
    assert(Multimodal.VideoCodec.decodeFrames(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("image near-dedup: banded dHash pairs == brute-force Hamming<=3 (pigeonhole recall)") {
    import spark.implicits._
    // fixture: 40 VISUALLY DISTINCT images (random 4x4-block patterns —
    // the gradient fixture is perceptually one image and dHash rightly
    // collapses it) + 6 planted near-dups: 3 byte-identical re-uploads
    // (hamming 0) and 3 one-pixel edits
    val base = (0 until 40).map { i =>
      val rng = new scala.util.Random(i * 9176L + 11)
      val (w, h) = (32, 24)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (by <- 0 until h / 4; bx <- 0 until w / 4) {
        val c = rng.nextInt(0xffffff)
        for (y <- by * 4 until by * 4 + 4; x <- bx * 4 until bx * 4 + 4)
          img.setRGB(x, y, c)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.MediaRecord(i.toLong, "image", bos.toByteArray, w, h, 0L)
    }.toArray
    val planted = (0 until 3).map { i =>
      base(i).copy(media_id = 100L + i) // exact re-upload, new id
    } ++ (3 until 6).map { i =>
      val img = Multimodal.ImageCodec.decode(base(i).payload).get
      img.setRGB(0, 0, 0xffffff) // one-pixel edit
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      base(i).copy(media_id = 200L + i, payload = bos.toByteArray)
    }
    val media = spark.createDataset(base.toSeq ++ planted)
    val pairs = Multimodal.imageNearDupPairs(media, maxBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // exact re-uploads MUST pair at hamming 0
    for (i <- 0 until 3)
      assert(pairs.exists(p => p._1 == i && p._2 == 100L + i && p._3 == 0),
        s"re-upload of $i not found in $pairs")
    // brute-force reference: ALL pairs within 3 bits (4 bands, <=3
    // flipped bits => >=1 band untouched => candidate generated)
    val hashes = media.collect().map(m =>
      (m.media_id, Multimodal.ImageCodec.dHash(m.payload)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(pairs == brute,
      s"banded recall must be exact at maxBits=3: ${brute.diff(pairs)} missed")
    // and the blocking is selective: nowhere near all-pairs
    assert(pairs.size < 46 * 45 / 8, s"pair explosion: ${pairs.size}")
  }

  test("audio near-dedup: banded envelope-dHash pairs == brute-force " +
      "Hamming<=3; volume-scaled re-upload lands at hamming 0") {
    import spark.implicits._
    // fixture: 30 clips with DISTINCT loudness contours (per-clip seeded
    // per-segment amplitudes over 65 segments — a flat sine would hash
    // to 0 everywhere and rightly collapse) + planted near-dups:
    // 3 volume-scaled copies (amplitude invariance => hamming 0) and
    // 3 copies with two segments re-leveled (small bit flips)
    def wav(seed: Long, scale: Double, perturb: Set[Int]): Array[Byte] = {
      val rate = 8000f
      val nSeg = 65
      val perSeg = 40 // 2600 samples
      val rng = new scala.util.Random(seed)
      val amps = Array.fill(nSeg)(2000 + rng.nextInt(10000))
      perturb.foreach(s => amps(s) = 14000) // re-level a segment
      val pcm = new Array[Byte](nSeg * perSeg * 2)
      for (s <- 0 until nSeg; j <- 0 until perSeg) {
        val t = s * perSeg + j
        val v = (math.sin(2 * math.Pi * 440.0 * t / rate) *
          amps(s) * scale).toInt
        pcm(2 * t) = (v & 0xff).toByte
        pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
      }
      import javax.sound.sampled.{AudioFileFormat, AudioFormat,
        AudioInputStream, AudioSystem}
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, (nSeg * perSeg).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val base = (0 until 30).map(i => Multimodal.MediaRecord(
      i.toLong, "audio", wav(i * 7919L + 3, 1.0, Set.empty), 0, 0, 325L))
    val planted = (0 until 3).map { i => // volume-scaled re-upload
      Multimodal.MediaRecord(100L + i, "audio",
        wav(i * 7919L + 3, 0.5, Set.empty), 0, 0, 325L)
    } ++ (3 until 6).map { i => // two segments re-leveled
      Multimodal.MediaRecord(200L + i, "audio",
        wav(i * 7919L + 3, 1.0, Set(10, 40)), 0, 0, 325L)
    }
    val media = spark.createDataset(base ++ planted)
    val pairs = Multimodal.audioNearDupPairs(media, maxBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // volume-scaled copies MUST pair at hamming 0 (amplitude invariance)
    for (i <- 0 until 3)
      assert(pairs.exists(p => p._1 == i && p._2 == 100L + i && p._3 == 0),
        s"volume-scaled re-upload of $i not at hamming 0 in $pairs")
    val hashes = media.collect().map(m =>
      (m.media_id, Multimodal.AudioCodec.dHash(m.payload)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(pairs == brute,
      s"banded recall must be exact at maxBits=3: ${brute.diff(pairs)} missed")
    assert(pairs.size < 36 * 35 / 8, s"pair explosion: ${pairs.size}")
  }

  test("m1/m2/m3 registry entries reproduce the pinned golden rows (oracle drift guard)") {
    // the driver's DuckDB oracle for m1/m2/m3 is the pinned VALUES
    // table in MediaOracle — computed INDEPENDENTLY by
    // tools/media_oracle_check.py (first-principles Python replay of
    // the pre-codec fixture; round 18). This spec fails FIRST (in sbt
    // test) if the fixture, a codec, or a hash pipeline drifts from
    // that pinned output.
    import spark.implicits._
    val m1 = graft.SparkEntry.queries("m1_image_neardup")(spark, "unused")
      .as[(Long, Long, Int)].collect().toSet
    assert(m1 == graft.multimodal.MediaOracle.m1Rows.toSet,
      s"m1 drift: extra=${m1 -- graft.multimodal.MediaOracle.m1Rows.toSet} " +
        s"missing=${graft.multimodal.MediaOracle.m1Rows.toSet -- m1}")
    val m2 = graft.SparkEntry.queries("m2_audio_neardup")(spark, "unused")
      .as[(Long, Long, Int)].collect().toSet
    assert(m2 == graft.multimodal.MediaOracle.m2Rows.toSet,
      s"m2 drift: extra=${m2 -- graft.multimodal.MediaOracle.m2Rows.toSet} " +
        s"missing=${graft.multimodal.MediaOracle.m2Rows.toSet -- m2}")
    val m3 = graft.SparkEntry.queries("m3_video_neardup")(spark, "unused")
      .as[(Long, Long, Int)].collect().toSet
    assert(m3 == graft.multimodal.MediaOracle.m3Rows.toSet,
      s"m3 drift: extra=${m3 -- graft.multimodal.MediaOracle.m3Rows.toSet} " +
        s"missing=${graft.multimodal.MediaOracle.m3Rows.toSet -- m3}")
    // planted structure: every 100-block copy pairs with its base at 0
    assert((0L until 8L).forall(i => m1.contains((i, i + 100L, 0))))
    assert((0L until 6L).forall(i => m2.contains((i, i + 100L, 0))))
    assert((0L until 6L).forall(i => m3.contains((i, i + 100L, 0))))
    // threshold boundary: base 0's 4-bit variant must NOT pair (the
    // ≤3 filter is load-bearing, not vacuous)
    assert(!m3.exists(p => p._1 == 0L && p._2 == 200L),
      "the Hamming-4 variant (0,200) leaked through the ≤3 filter")
  }
}
