package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Raster
import graft.multimodal.Media
import graft.multimodal.Media.{MediaMeta, MediaRow}

/** Multimodal plumbing: binary payload + typed metadata, real image
  * codecs, stubbed A/V codec with production batch shape (one codec
  * init per partition, streamed rows). */
class MediaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def png(v: Int, h: Int = 8, w: Int = 8): Array[Byte] =
    Raster.encodePng(Seq.fill(3)(Seq.fill(h)(Seq.fill(w)(v))))

  private def mediaDs: Dataset[MediaRow] = {
    import Media._
    val rows = Seq(
      MediaRow(1L, "image", png(100), MediaMeta("image/png", 8, 8, 0L)),
      MediaRow(2L, "image", png(200, 14, 14), MediaMeta("image/png", 14, 14, 0L)),
      MediaRow(3L, "video", Array.tabulate(64)(_.toByte), MediaMeta("video/mp4", 4, 4, 400L)),
      MediaRow(4L, "audio", Array.tabulate(32)(_.toByte), MediaMeta("audio/wav", 1, 16, 1000L)))
    spark.createDataset(rows)(mediaRowEnc).repartition(2)
  }

  test("feature extraction: real image luminance, stubbed a/v, codec init once per partition") {
    Media.FakeAvCodec.initializations.set(0)
    val feats = Media.extractFeatures(mediaDs).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).meanLuminance == 100.0, "uniform PNG decodes to its gray level (real codec)")
    assert(feats(2L).meanLuminance == 200.0)
    assert(feats(3L).nFrames == 10, "400ms at the 25fps stub = 10 frames")
    assert(feats(4L).nFrames == 25)
    assert(feats.values.map(_.partitionTag).toSet.size <= 2)
    val inits = Media.FakeAvCodec.initializations.get()
    assert(inits <= 2, s"codec must initialize per PARTITION, not per row (saw $inits)")
  }

  test("image features carry the q87 perceptual fingerprint; sub-grid images and a/v rows don't") {
    import Media._
    val big = Seq.tabulate(3, 14, 18)((c, y, x) => (c * 40 + y * 9 + x * 5) % 256)
    val tiny = Seq.fill(3)(Seq.fill(4)(Seq.fill(4)(50)))
    val rows = Seq(
      MediaRow(20L, "image", Raster.encodePng(big), MediaMeta("image/png", 18, 14, 0L)),
      MediaRow(21L, "image", Raster.encodePng(tiny), MediaMeta("image/png", 4, 4, 0L)))
    val feats = Media.extractFeatures(spark.createDataset(rows)(mediaRowEnc))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(20L).dhash.contains(graft.functions.ImageHash.pixelDhashSeq(big)),
      "image dhash must equal the kernel replay (PNG roundtrip is lossless)")
    assert(feats(21L).dhash.isEmpty, "below the 7x9 grid there is no fingerprint")
  }

  test("image path spans all real containers: JPEG and zip-of-band-TIFFs extract features") {
    import Media._
    val cube = Seq.fill(3)(Seq.fill(8)(Seq.fill(8)(120)))
    val rows = Seq(
      MediaRow(10L, "image", Raster.encodeJpeg(cube, 0.9f),
        MediaMeta("image/jpeg", 8, 8, 0L)),
      MediaRow(11L, "image", Raster.encodeBandZip(cube, Seq("B04", "B03", "B02")),
        MediaMeta("application/zip", 8, 8, 0L)))
    val feats = Media.extractFeatures(spark.createDataset(rows)(mediaRowEnc))
      .collect().map(f => f.media_id -> f).toMap
    // JPEG is lossy but near-exact on a uniform image
    assert(math.abs(feats(10L).meanLuminance - 120.0) < 2.0, s"${feats(10L)}")
    // band-zip is lossless
    assert(feats(11L).meanLuminance == 120.0, s"${feats(11L)}")
  }

  test("frame sampling explodes every Nth frame as rows, deterministically") {
    val frames = Media.sampleFrames(mediaDs, everyN = 3).collect()
    assert(frames.map(_.media_id).toSet == Set(3L), "only video rows sampled")
    assert(frames.map(_.frameIdx).sorted.toSeq == Seq(0, 3, 6, 9))
    val again = Media.sampleFrames(mediaDs, everyN = 3).collect()
    assert(frames.map(f => (f.media_id, f.frameIdx, f.framePayload.toSeq)).toSet ==
      again.map(f => (f.media_id, f.frameIdx, f.framePayload.toSeq)).toSet)
  }

  test("resize keeps the payload decodable and updates metadata") {
    val resized = Media.resizeImages(mediaDs, factor = 7).collect()
      .map(r => r.media_id -> r).toMap
    val r2 = resized(2L)
    assert(r2.meta.width == 2 && r2.meta.height == 2, "14×14 ÷ 7 → 2×2")
    val px = Raster.decodeImage(r2.payload)
    assert(px.head.length == 2 && px.head.head.length == 2)
    assert(px(0)(0)(0) == 200, "uniform image stays uniform through bicubic")
    assert(resized(3L).payload.sameElements(mediaDs.collect().find(_.media_id == 3L).get.payload),
      "non-images pass through untouched")
  }

  test("WAV codec: RIFF/PCM16 round-trip, real duration and RMS; malformed payloads raise") {
    import Media.WavCodec
    // 0.5 s of a 440 Hz sine at 8 kHz, stereo interleaved
    val rate = 8000; val frames = 4000; val amp = 16000.0
    val samples = Array.tabulate(frames * 2) { i =>
      val t = (i / 2).toDouble / rate
      (amp * math.sin(2 * math.Pi * 440.0 * t)).toShort
    }
    val wav = WavCodec.encode(samples, rate, channels = 2)
    assert(WavCodec.isWav(wav))
    val a = WavCodec.decode(wav)
    assert(a.sampleRate == rate && a.channels == 2)
    assert(a.samples.sameElements(samples), "PCM samples must round-trip bit-exactly")
    assert(a.nFrames == frames && a.durationMs == 500L)
    // RMS of a sine is amp/sqrt(2); on the 0..255 scale
    val expectedRms = amp / math.sqrt(2) / 32768.0 * 255.0
    assert(math.abs(a.rmsLevel - expectedRms) < 1.0, s"rms ${a.rmsLevel} vs $expectedRms")

    // the extraction pipeline real-decodes WAV audio rows
    import spark.implicits._
    val row = MediaRow(42L, "audio", wav, MediaMeta("audio/wav", 0, 0, 500L))
    val feats = Media.extractFeatures(Seq(row).toDS()).collect()
    assert(feats.length == 1 && feats.head.nFrames == frames)
    assert(math.abs(feats.head.meanLuminance - expectedRms) < 1.0,
      "pipeline must surface the REAL decoded RMS, not the stub level")

    // unknown chunks (LIST/INFO) are legal and skipped
    val withJunk = {
      val junk = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII")).array()
      val out = java.nio.ByteBuffer.allocate(wav.length + 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(wav, 0, 12).put(junk).put(wav, 12, wav.length - 12)
      val b = out.array()
      // fix RIFF size
      val sz = b.length - 8
      b(4) = (sz & 0xff).toByte; b(5) = ((sz >> 8) & 0xff).toByte
      b(6) = ((sz >> 16) & 0xff).toByte; b(7) = ((sz >> 24) & 0xff).toByte
      b
    }
    assert(WavCodec.decode(withJunk).samples.sameElements(samples))

    // truncated/hostile payloads raise, they do not guess
    intercept[IllegalArgumentException](WavCodec.decode(wav.take(20)))
    intercept[IllegalArgumentException](WavCodec.decode("RIFFxxxxWAVE".getBytes))
  }

  test("q104 real-PCM leg: gain-shifted + re-encoded audio pairs with its original; distinct audio does not") {
    import Media.WavCodec
    import graft.functions.AudioHash
    val perFrame = 100
    // amplitude-modulated tone: independent per-envelope-frame random
    // amplitudes (seeded — deterministic test) make the energy
    // envelope distinctive; two seeds → uncorrelated gradient signs
    def tone(seed: Int): Array[Short] = {
      val rnd = new scala.util.Random(seed)
      val amps = Array.fill(AudioHash.Frames)(2000 + rnd.nextInt(8000))
      Array.tabulate(AudioHash.Frames * perFrame) { i =>
        (amps(i / perFrame) * math.sin(2 * math.Pi * 440.0 * i / 8000.0)).toShort
      }
    }
    val orig = tone(1)
    // the planted duplicate: gain ×0.8 (integer truncation IS the
    // re-encode noise), then a full WAV encode → decode round-trip —
    // the dup arrives the way a re-uploaded file would
    val dup = WavCodec.decode(WavCodec.encode(
      orig.map(s => (s * 4 / 5).toShort), 8000, channels = 1)).samples
    val other = tone(2)
    import spark.implicits._
    val audio = Seq(
      (1L, orig.map(_.toInt).toSeq),
      (2L, dup.map(_.toInt).toSeq),
      (3L, other.map(_.toInt).toSeq)).toDF("doc_id", "samples")
    val pairs = graft.operators.Dedup.audioNearDupSamples(audio).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"exactly the planted pair must survive: ${pairs.mkString(",")}")
    assert(pairs.head._3 <= graft.operators.Dedup.AudioHamMax)
    // the distributed kernel ≡ the driver replay on the same samples
    val viaSpark = audio.filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .select(AudioHash.pcmEnvHash(org.apache.spark.sql.functions.col("samples")))
      .head().getLong(0)
    assert(viaSpark == AudioHash.pcmEnvHashSeq(orig.map(_.toInt).toSeq))
    // gain invariance is the perceptual claim: the planted pair's
    // fingerprints differ by at most the pairing radius
    val hDup = AudioHash.pcmEnvHashSeq(dup.map(_.toInt).toSeq)
    assert(java.lang.Long.bitCount(viaSpark ^ hDup) <= graft.operators.Dedup.AudioHamMax)
    // while the distinct tone sits far outside it
    val hOther = AudioHash.pcmEnvHashSeq(other.map(_.toInt).toSeq)
    assert(java.lang.Long.bitCount(viaSpark ^ hOther) > 2 * graft.operators.Dedup.AudioHamMax)
  }

  test("q105 real-video leg: trimmed + frame-noised Y4M re-encode pairs with its " +
      "original through the frame vote; distinct video does not") {
    import Media.Y4mCodec
    import graft.functions.VideoHash
    val w = 48; val h = 28
    def vid(seed: Int, n: Int): IndexedSeq[Array[Byte]] = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map(_ => Array.fill[Byte](w * h)((rnd.nextInt(256) - 128).toByte))
    }
    val orig = vid(1, 40)
    // the planted duplicate arrives the way a re-upload would: intro
    // trimmed (first 4 frames cut), every 5th surviving frame carries
    // mild luma noise (the re-encode), then a full Y4M encode→decode
    // round-trip
    val rnd = new scala.util.Random(99)
    val dupFrames = orig.drop(4).zipWithIndex.map { case (f, i) =>
      if (i % 5 == 0)
        f.map(b => (((b & 0xff) + rnd.nextInt(7) - 3).max(0).min(255)).toByte)
      else f.clone
    }
    val other = vid(2, 40)
    import spark.implicits._
    def row(id: Long, frames: Seq[Array[Byte]]) = MediaRow(
      id, "video", Y4mCodec.encode(frames, w, h, 25, 1),
      MediaMeta("video/y4m", w, h, frames.size * 40L))
    val ds = Seq(row(1L, orig), row(2L, dupFrames), row(3L, other)).toDS()
    val pairs = graft.operators.Dedup.videoNearDupFrames(
        Media.videoFrameHashes(ds, everyN = 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"exactly the planted pair must survive the vote: ${pairs.mkString(",")}")
    // vote arithmetic: 36 surviving frames, ≤ 8 noised — at least 28
    // bit-identical luma planes vote, comfortably over the 24 threshold
    assert(pairs.head._3 >= 28 && pairs.head._3 <= 36,
      s"vote count ${pairs.head._3} outside the planted band")
    // the distributed kernel ≡ the driver replay on frame 0
    val viaSpark = Media.videoFrameHashes(
        Seq(row(1L, orig.take(1))).toDS(), everyN = 1)
      .head().getLong(1)
    assert(viaSpark == VideoHash.grayDhashOrMin(orig.head, w, h))
  }

  test("Y4M codec: real video frames round-trip; sampling and features use decoded luma") {
    import Media.Y4mCodec
    val w = 16; val h = 8
    // 10 frames with distinct, analytically-known mean luma
    val frames = (0 until 10).map(f => Array.fill[Byte](w * h)((f * 20 + 5).toByte))
    val y4m = Y4mCodec.encode(frames, w, h, fpsNum = 25, fpsDen = 1)
    assert(Y4mCodec.isY4m(y4m))
    val v = Y4mCodec.decode(y4m)
    assert(v.width == w && v.height == h && v.nFrames == 10 && v.durationMs == 400L)
    (0 until 10).foreach(f =>
      assert(v.lumaFrames(f).sameElements(frames(f)), s"frame $f luma must round-trip"))
    assert(math.abs(v.meanLuma(3) - 65.0) < 1e-9)

    import spark.implicits._
    val row = MediaRow(7L, "video", y4m, MediaMeta("video/y4m", w, h, 400L))
    // feature path surfaces the REAL frame count and first-frame luma
    val feats = Media.extractFeatures(Seq(row).toDS()).collect().head
    assert(feats.nFrames == 10 && math.abs(feats.meanLuminance - 5.0) < 1e-9)
    // frame sampling explodes REAL luma planes, every 3rd frame
    val sampled = Media.sampleFrames(Seq(row).toDS(), everyN = 3).collect()
      .sortBy(_.frameIdx)
    assert(sampled.map(_.frameIdx).toSeq == Seq(0, 3, 6, 9))
    assert(sampled(1).framePayload.sameElements(frames(3)))

    // wrong chroma mode / truncated stream raise
    val c444 = new String(y4m.takeWhile(_ != '\n'), "US-ASCII").replace("C420", "C444")
    intercept[IllegalArgumentException](
      Y4mCodec.decode(c444.getBytes("US-ASCII") ++ y4m.dropWhile(_ != '\n')))
    intercept[IllegalArgumentException](Y4mCodec.decode(y4m.take(y4m.length - 10)))
  }
}
