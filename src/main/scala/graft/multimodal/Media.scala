package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import graft.functions.Raster

/** Multimodal column conventions + kernels (the M6 brief: treat
  * image/audio/video as opaque binary columns with typed metadata;
  * decode / feature-extract / resize / frame-sample as batched
  * executor-side functions).
  *
  * The Scala analog of the brief's `mapInPandas` batching is
  * `mapPartitions` over a typed Dataset: ONE codec/model
  * initialization per partition (not per row), rows streamed through
  * it — the plumbing (schema, partitioning, batch shape) is real and
  * tested in MediaSpec.
  *
  * Codec reality in this offline container:
  *  - images: REAL — PNG/TIFF decode+resize via `Raster`
  *    (JDK ImageIO);
  *  - audio/video: STUBBED behind a deterministic fake decoder
  *    (`FakeAvCodec`) with the production signature — no media libs
  *    ship in the build environment, so the stub synthesizes frames
  *    from the payload bytes deterministically.
  */
object Media {

  /** Schema convention: payload is opaque; everything queryable lives
    * in typed metadata. */
  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      meanLuminance: Double, // real for images, stub-derived for a/v
      nFrames: Int,
      partitionTag: Int) // test observability: which partition built it

  case class FrameRow(media_id: Long, frameIdx: Int, framePayload: Array[Byte])

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameEnc: Encoder[FrameRow] = Encoders.product[FrameRow]

  /** REAL audio codec for WAV/PCM16 — RIFF is a trivial container, so
    * no external library is needed and the audio leg of the multimodal
    * story stops being a stub: parse the chunk list, read `fmt ` +
    * `data`, expose sample frames; the encoder exists so specs (and
    * pipelines) can synthesize valid payloads. Only uncompressed
    * PCM16 is claimed — anything else raises, it does not guess. */
  object WavCodec {
    case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short]) {
      def nFrames: Int = samples.length / channels
      def durationMs: Long = nFrames * 1000L / sampleRate
      /** RMS level per channel on the 0..255 scale the image leg uses. */
      def rmsLevel: Double = {
        if (samples.isEmpty) return 0.0
        val acc = samples.foldLeft(0.0)((a, s) => a + s.toDouble * s)
        math.sqrt(acc / samples.length) / 32768.0 * 255.0
      }
    }

    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    def isWav(payload: Array[Byte]): Boolean =
      payload.length >= 12 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'

    def decode(payload: Array[Byte]): WavAudio = {
      require(isWav(payload), "not a RIFF/WAVE payload")
      var o = 12
      var rate = -1; var ch = -1; var data: Array[Short] = null
      while (o + 8 <= payload.length) {
        val id = new String(payload, o, 4, "US-ASCII")
        val len = le32(payload, o + 4)
        require(len >= 0 && o + 8 + len <= payload.length, s"chunk $id overruns payload")
        id match {
          case "fmt " =>
            require(le16(payload, o + 8) == 1, "only uncompressed PCM is supported")
            ch = le16(payload, o + 10)
            rate = le32(payload, o + 12)
            require(le16(payload, o + 22) == 16, "only 16-bit samples are supported")
          case "data" =>
            data = Array.tabulate(len / 2)(i => le16(payload, o + 8 + 2 * i).toShort)
          case _ => // skip unknown chunks (LIST/INFO etc.) — the container allows them
        }
        o += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(rate > 0 && ch > 0 && data != null, "missing fmt/data chunk")
      WavAudio(rate, ch, data)
    }

    def encode(samples: Array[Short], sampleRate: Int, channels: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(out.putShort)
      out.array()
    }
  }

  /** STUB (documented): deterministic stand-in for an A/V codec.
    * Decodes `payload` into `n` fake frames of `w×h` gray pixels
    * derived from the payload hash — the production implementation
    * swaps this object for a real codec; everything downstream is
    * agnostic. */
  object FakeAvCodec {
    /** Test hook: proves once-per-partition init (valid in local mode
      * where executors share the JVM; production codecs would track
      * this via metrics). */
    val initializations = new java.util.concurrent.atomic.AtomicInteger(0)
    def open(): FakeAvCodec = { initializations.incrementAndGet(); new FakeAvCodec }
  }
  class FakeAvCodec {
    def frameCount(meta: MediaMeta): Int =
      math.max(1, (meta.durationMs / 40L).toInt) // 25 fps stub
    def decodeFrame(payload: Array[Byte], idx: Int, meta: MediaMeta): Array[Byte] = {
      val seed = payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff)) + idx
      Array.tabulate(math.max(1, meta.width * meta.height))(i =>
        (((seed + i) * 2654435761L >>> 16) & 0xff).toByte)
    }
    def meanLevel(payload: Array[Byte], meta: MediaMeta): Double = {
      val f = decodeFrame(payload, 0, meta)
      f.map(_ & 0xff).sum.toDouble / f.length
    }
  }

  /** Feature extraction: one decoder instance per PARTITION, rows
    * streamed through it (the mapInPandas-batch analog). Images use
    * the real ImageIO path, WAV audio the real RIFF/PCM16 parser
    * ([[WavCodec]]); only video (and non-WAV audio) remains on the
    * documented stub. */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      val codec = FakeAvCodec.open() // once per partition
      val pid = org.apache.spark.TaskContext.getPartitionId()
      rows.map { r =>
        r.kind match {
          case "image" =>
            val px = Raster.decodeImage(r.payload) // REAL decode
            val lum = px.head.flatten.map(_.toLong).sum.toDouble /
              (px.head.length * px.head.head.length)
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, lum, 1, pid)
          case "audio" if WavCodec.isWav(r.payload) =>
            val a = WavCodec.decode(r.payload) // REAL decode
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
              a.rmsLevel, a.nFrames, pid)
          case _ =>
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
              codec.meanLevel(r.payload, r.meta), codec.frameCount(r.meta), pid)
        }
      }
    }

  /** Frame sampling: every `everyN`-th frame, exploded to rows —
    * a flatMap (P1-shaped row multiplier), never a collect. */
  def sampleFrames(ds: Dataset[MediaRow], everyN: Int): Dataset[FrameRow] =
    ds.filter(_.kind == "video").mapPartitions { rows =>
      val codec = FakeAvCodec.open()
      rows.flatMap { r =>
        (0 until codec.frameCount(r.meta) by everyN).map(i =>
          FrameRow(r.media_id, i, codec.decodeFrame(r.payload, i, r.meta)))
      }
    }

  /** Resize: real bicubic via Raster for image payloads. */
  def resizeImages(ds: Dataset[MediaRow], factor: Int): Dataset[MediaRow] =
    ds.map { r =>
      if (r.kind != "image") r
      else {
        val thumb = Raster.thumbnailArray(Raster.decodeImage(r.payload), factor)
        r.copy(
          payload = Raster.encodePng(thumb),
          meta = r.meta.copy(
            width = thumb.head.head.length, height = thumb.head.length))
      }
    }
}
