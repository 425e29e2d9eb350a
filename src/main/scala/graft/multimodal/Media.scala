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
  *  - audio: REAL for WAV/PCM16 — [[Media.WavCodec]] parses the RIFF
  *    container directly (no library needed);
  *  - video: REAL for Y4M/C420 — [[Media.Y4mCodec]] parses the
  *    yuv4mpeg2 container directly; COMPRESSED a/v (mp3/h264/…) stays
  *    behind the deterministic `FakeAvCodec` stub with the production
  *    signature — those codecs genuinely need external libraries that
  *    do not ship in this build environment.
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
      partitionTag: Int, // test observability: which partition built it
      // perceptual fingerprint (q87's dHash) for image rows large
      // enough for the 7x9 grid; None for a/v and tiny images — the
      // column the near-dup ingest gate (imageNearDupStream) probes on
      dhash: Option[Long] = None)

  /** One sampled frame. `frameW`/`frameH` are the DECODER-reported
    * dims of `framePayload` — not the catalog metadata's: a re-encode
    * that changed resolution without a catalog update would otherwise
    * hash a misaligned plane silently (round-10 review finding). */
  case class FrameRow(media_id: Long, frameIdx: Int,
      frameW: Int, frameH: Int, framePayload: Array[Byte])

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameEnc: Encoder[FrameRow] = Encoders.product[FrameRow]

  /** PK\u0003\u0004 local-file-header magic — a zip payload is a
    * zip-of-band-TIFFs product ([[Raster.encodeBandZip]]). */
  def isZip(payload: Array[Byte]): Boolean =
    payload.length >= 4 && payload(0) == 'P' && payload(1) == 'K' &&
      payload(2) == 3 && payload(3) == 4

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

  /** REAL video codec for Y4M (yuv4mpeg2) — like WAV, the container is
    * a trivial text header + raw planes, so the video leg gets a real
    * decoder with zero dependencies: `YUV4MPEG2 W.. H.. F..\n` then
    * per frame `FRAME\n` + YUV420 planes. Only C420 is claimed.
    * The decoder exposes the LUMA plane per frame (what frame-level
    * features and thumbnails consume); the encoder exists for specs
    * and pipelines. */
  object Y4mCodec {
    case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
        lumaFrames: Vector[Array[Byte]]) {
      def nFrames: Int = lumaFrames.length
      def durationMs: Long =
        if (fpsNum == 0) 0L else nFrames * 1000L * fpsDen / fpsNum
      def meanLuma(idx: Int): Double = {
        val f = lumaFrames(idx)
        f.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / f.length
      }
    }

    private val Magic = "YUV4MPEG2".getBytes("US-ASCII")

    def isY4m(payload: Array[Byte]): Boolean =
      payload.length > Magic.length && Magic.indices.forall(i => payload(i) == Magic(i))

    def decode(payload: Array[Byte]): Y4mVideo = {
      require(isY4m(payload), "not a YUV4MPEG2 payload")
      val nl = payload.indexOf('\n'.toByte)
      require(nl > 0, "missing stream-header terminator")
      val params = new String(payload, 0, nl, "US-ASCII").split(" ").drop(1)
      def tag(c: Char): Option[String] =
        params.find(p => p.nonEmpty && p.head == c).map(_.tail)
      val w = tag('W').map(_.toInt).getOrElse(
        throw new IllegalArgumentException("missing W tag"))
      val h = tag('H').map(_.toInt).getOrElse(
        throw new IllegalArgumentException("missing H tag"))
      require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, s"bad C420 dimensions ${w}x$h")
      val (fn, fd) = tag('F').map { f =>
        val Array(a, b) = f.split(":"); (a.toInt, b.toInt)
      }.getOrElse((25, 1))
      tag('C').foreach(c => require(c.startsWith("420"), s"only C420 is supported, got C$c"))
      val ySize = w * h; val frameSize = ySize + ySize / 2
      val frames = Vector.newBuilder[Array[Byte]]
      var o = nl + 1
      while (o < payload.length) {
        require(o + 5 <= payload.length &&
          new String(payload, o, 5, "US-ASCII") == "FRAME", "expected FRAME marker")
        val fnl = payload.indexOf('\n'.toByte, o)
        require(fnl > 0 && fnl + 1 + frameSize <= payload.length, "truncated frame")
        frames += java.util.Arrays.copyOfRange(payload, fnl + 1, fnl + 1 + ySize)
        o = fnl + 1 + frameSize
      }
      Y4mVideo(w, h, fn, fd, frames.result())
    }

    /** Encode luma frames as C420 (chroma planes neutral 128). */
    def encode(lumaFrames: Seq[Array[Byte]], w: Int, h: Int,
        fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
      require(lumaFrames.forall(_.length == w * h), "luma plane size mismatch")
      val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420\n".getBytes("US-ASCII")
      val chroma = Array.fill[Byte](w * h / 2)(128.toByte)
      val marker = "FRAME\n".getBytes("US-ASCII")
      val buf = new java.io.ByteArrayOutputStream(
        header.length + lumaFrames.size * (marker.length + w * h * 3 / 2))
      buf.write(header)
      lumaFrames.foreach { f => buf.write(marker); buf.write(f); buf.write(chroma) }
      buf.toByteArray
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
            // one image path, three real containers: PNG/TIFF/JPEG via
            // ImageIO sniffing, zip-of-band-TIFFs via the PK magic
            val px =
              if (Media.isZip(r.payload)) Raster.decodeBandZipSorted(r.payload)
              else Raster.decodeImage(r.payload)
            val lum = px.head.flatten.map(_.toLong).sum.toDouble /
              (px.head.length * px.head.head.length)
            val dh =
              if (px.head.length >= graft.functions.ImageHash.GridRows &&
                  px.head.head.length >= graft.functions.ImageHash.GridCols)
                Some(graft.functions.ImageHash.pixelDhashSeq(px))
              else None
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, lum, 1, pid, dh)
          case "audio" if WavCodec.isWav(r.payload) =>
            val a = WavCodec.decode(r.payload) // REAL decode
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
              a.rmsLevel, a.nFrames, pid)
          case "video" if Y4mCodec.isY4m(r.payload) =>
            val v = Y4mCodec.decode(r.payload) // REAL decode
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
              v.meanLuma(0), v.nFrames, pid)
          case _ =>
            MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
              codec.meanLevel(r.payload, r.meta), codec.frameCount(r.meta), pid)
        }
      }
    }

  /** Frame sampling: every `everyN`-th frame, exploded to rows —
    * a flatMap (P1-shaped row multiplier), never a collect. Y4M
    * payloads sample REAL luma planes; others stay on the stub. */
  def sampleFrames(ds: Dataset[MediaRow], everyN: Int): Dataset[FrameRow] =
    ds.filter(_.kind == "video").mapPartitions { rows =>
      val codec = FakeAvCodec.open()
      rows.flatMap { r =>
        if (Y4mCodec.isY4m(r.payload)) {
          val v = Y4mCodec.decode(r.payload)
          (0 until v.nFrames by everyN).map(i =>
            FrameRow(r.media_id, i, v.width, v.height, v.lumaFrames(i)))
        } else {
          // the stub codec synthesizes frames AT the meta dims, so
          // meta is the decoder-reported truth on this leg
          (0 until codec.frameCount(r.meta) by everyN).map(i =>
            FrameRow(r.media_id, i, r.meta.width, r.meta.height,
              codec.decodeFrame(r.payload, i, r.meta)))
        }
      }
    }

  /** Per-frame perceptual hashes for q105's real video leg: sample
    * every `everyN`-th frame ([[sampleFrames]] — real Y4M luma
    * planes), then the codegen'd 7×9 gray dHash
    * ([[graft.functions.VideoHash.grayDhash]]). Frame dims are the
    * DECODER'S, carried on each [[FrameRow]] — no metadata join, and
    * no way for a stale catalog row to misalign the hash grid. Output
    * (doc_id, fh) feeds [[graft.operators.Dedup.videoNearDupFrames]]. */
  def videoFrameHashes(ds: Dataset[MediaRow], everyN: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    sampleFrames(ds, everyN).toDF()
      .select(col("media_id").as("doc_id"),
        graft.functions.VideoHash.grayDhash(
          col("framePayload"), col("frameW"), col("frameH")).as("fh"))
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
