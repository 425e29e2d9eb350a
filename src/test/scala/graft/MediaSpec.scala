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
}
