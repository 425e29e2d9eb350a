package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, udf}
import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Raster kernels (SURVEY §2.5) over the pixel-cube representation
  * `array<array<array<int>>>` = [channel][row][col], 3 channels RGB,
  * values 0–255 (IntegerType — JVM has no unsigned byte, SURVEY §7.3).
  *
  * All kernels are per-row scalar functions → narrow map stages; at
  * the reference's 2100×2100×3 image cap (BASELINE.md) that is ~13 MB
  * per row and zero shuffle.
  */
object Raster {

  /** R1 band stacking (reference main.py:206-232): three single-band
    * planes → one [3][H][W] cube. Pure built-in. */
  def stackBands(r: Column, g: Column, b: Column): Column = array(r, g, b)

  /** R2 raster clip/mask by multi-polygon (reference main.py:240-243,
    * rasterio.mask.mask with nodata=0): pixel centers are mapped
    * through the north-up affine transform
    *   lon = minLon + (col + 0.5)·(maxLon − minLon)/W
    *   lat = maxLat − (row + 0.5)·(maxLat − minLat)/H
    * and pixels whose center falls outside every polygon become 0
    * (nodata, main.py:41). Divergence from the reference, documented:
    * rasterio also CROPS to the polygon bbox; we keep dimensions —
    * downstream stats are identical because cropped-away pixels are
    * nodata either way, and fixed dims keep the column shape stable.
    *
    * The mask is computed once per image (H·W ray casts), not per
    * channel. */
  def clip(
      pixels: Seq[Seq[Seq[Int]]],
      minLon: Double, maxLon: Double, minLat: Double, maxLat: Double,
      polys: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Int]]] = {
    if (pixels == null || pixels.isEmpty || pixels.head.isEmpty) return pixels
    if (polys == null || polys.isEmpty) return pixels // no geometry → no mask
    val h = pixels.head.length
    val w = pixels.head.head.length
    val rings = polys.map(_.map(_.toIndexedSeq).toIndexedSeq)
    val mask = Array.ofDim[Boolean](h, w)
    var i = 0
    while (i < h) {
      val lat = maxLat - (i + 0.5) * (maxLat - minLat) / h
      var j = 0
      while (j < w) {
        val lon = minLon + (j + 0.5) * (maxLon - minLon) / w
        mask(i)(j) = rings.exists(r => Geo.pointInRing(lon, lat, r))
        j += 1
      }
      i += 1
    }
    pixels.map(_.zipWithIndex.map { case (row, ri) =>
      row.zipWithIndex.map { case (v, ci) => if (mask(ri)(ci)) v else 0 }
    })
  }

  val clipUdf = udf(clip _)

  /** R5 thumbnail (reference main.py:288-308): bicubic downscale by
    * factor 7 (THUMBNAIL_SCALE_FACTOR, main.py:40) via java.awt —
    * PIL-bicubic parity is structural (dims, channel means), not
    * bit-exact (SURVEY §7.3). */
  def thumbnailArray(pixels: Seq[Seq[Seq[Int]]], factor: Int): Seq[Seq[Seq[Int]]] = {
    val img = toBufferedImage(pixels)
    val tw = math.max(1, img.getWidth / factor)
    val th = math.max(1, img.getHeight / factor)
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BICUBIC)
    g2.drawImage(img, 0, 0, tw, th, null)
    g2.dispose()
    fromBufferedImage(out)
  }

  val thumbnailUdf = udf((px: Seq[Seq[Seq[Int]]], factor: Int) => thumbnailArray(px, factor))

  /** S5/R5 artifact form: PNG-encoded thumbnail bytes (BinaryType). */
  val thumbnailPngUdf = udf((px: Seq[Seq[Seq[Int]]], factor: Int) =>
    encodePng(thumbnailArray(px, factor)))

  // ------------------------------------------------------------ codecs

  /** S4-inverse/R6 codec: cube → PNG bytes (ImageIO, JDK built-in). */
  def encodePng(pixels: Seq[Seq[Seq[Int]]]): Array[Byte] =
    encode(pixels, "png")

  /** R6 clipped-tif re-encode analog: cube → TIFF bytes (the JDK
    * ships a TIFF plugin since Java 9 — still no external deps). */
  def encodeTiff(pixels: Seq[Seq[Seq[Int]]]): Array[Byte] =
    encode(pixels, "tiff")

  private def encode(pixels: Seq[Seq[Seq[Int]]], format: String): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val ok = ImageIO.write(toBufferedImage(pixels), format, baos)
    require(ok, s"no ImageIO writer for $format")
    baos.toByteArray
  }

  /** S4 decode: PNG/TIFF/JPEG bytes → [3][H][W] cube (ImageIO sniffs
    * the container, so one decoder serves every supported format). */
  def decodeImage(bytes: Array[Byte]): Seq[Seq[Seq[Int]]] =
    fromBufferedImage(ImageIO.read(new ByteArrayInputStream(bytes)))

  /** JPEG encode at an explicit quality (JDK writer — no external
    * deps). JPEG is LOSSY: the roundtrip contract is structural (dims
    * exact, channel means close), never bit-exact — which is why the
    * artifact tier (R6) stays TIFF/PNG and JPEG is the thumbnail/
    * preview tier a real catalog serves. */
  def encodeJpeg(pixels: Seq[Seq[Seq[Int]]], quality: Float = 0.9f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(toBufferedImage(pixels), null, null), params)
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Zip-of-band-TIFFs codec — the delivery format satellite archives
    * actually serve (one single-band GeoTIFF per spectral band, zipped;
    * reference main.py fetches per-band TIFF URLs and stacks them
    * client-side). Encode: each channel becomes an 8-bit grayscale
    * TIFF entry `<band>.tif` (lossless, so THIS roundtrip IS
    * bit-exact). Decode: entries are matched to `bandOrder` by name
    * and stacked into the standard [bands][H][W] cube — the in-archive
    * order is irrelevant, as with real products. */
  def encodeBandZip(pixels: Seq[Seq[Seq[Int]]], bands: Seq[String]): Array[Byte] = {
    require(pixels.length == bands.length,
      s"${pixels.length} planes but ${bands.length} band names")
    val baos = new ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(baos)
    bands.zip(pixels).foreach { case (name, plane) =>
      zip.putNextEntry(new java.util.zip.ZipEntry(s"$name.tif"))
      zip.write(encodeGrayTiff(plane))
      zip.closeEntry()
    }
    zip.close()
    baos.toByteArray
  }

  def decodeBandZip(bytes: Array[Byte], bandOrder: Seq[String]): Seq[Seq[Seq[Int]]] = {
    val zip = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
    val planes = scala.collection.mutable.Map[String, Seq[Seq[Int]]]()
    var entry = zip.getNextEntry
    while (entry != null) {
      val name = entry.getName.stripSuffix(".tif")
      planes(name) = decodeGrayTiff(zip.readAllBytes())
      entry = zip.getNextEntry
    }
    zip.close()
    bandOrder.map(b => planes.getOrElse(b,
      throw new IllegalArgumentException(
        s"band $b missing from archive (has ${planes.keys.mkString(",")})")))
  }

  /** Band-zip decode without a caller-declared band list: planes stack
    * in NAME-sorted order (deterministic for any archive entry order)
    * — the generic-ingest path when no band mapping is configured. */
  def decodeBandZipSorted(bytes: Array[Byte]): Seq[Seq[Seq[Int]]] = {
    val zip = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
    val planes = scala.collection.mutable.Map[String, Seq[Seq[Int]]]()
    var entry = zip.getNextEntry
    while (entry != null) {
      planes(entry.getName) = decodeGrayTiff(zip.readAllBytes())
      entry = zip.getNextEntry
    }
    zip.close()
    require(planes.nonEmpty, "empty band archive")
    planes.toSeq.sortBy(_._1).map(_._2)
  }

  /** Single-band 8-bit grayscale TIFF (TYPE_BYTE_GRAY is its own
    * color space — roundtrips sample values exactly). */
  private def encodeGrayTiff(plane: Seq[Seq[Int]]): Array[Byte] = {
    val h = plane.length; val w = plane.head.length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) { raster.setSample(j, i, 0, plane(i)(j)); j += 1 }
      i += 1
    }
    val baos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "tiff", baos), "no ImageIO writer for tiff")
    baos.toByteArray
  }

  private def decodeGrayTiff(bytes: Array[Byte]): Seq[Seq[Int]] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val raster = img.getRaster
    Seq.tabulate(img.getHeight, img.getWidth)((i, j) => raster.getSample(j, i, 0))
  }

  val encodePngUdf = udf(encodePng _)
  val encodeTiffUdf = udf(encodeTiff _)
  val encodeJpegUdf = udf((px: Seq[Seq[Seq[Int]]], q: Float) => encodeJpeg(px, q))
  val decodeImageUdf = udf(decodeImage _)
  val encodeBandZipUdf = udf(encodeBandZip _)
  val decodeBandZipUdf = udf(decodeBandZip _)

  private def toBufferedImage(pixels: Seq[Seq[Seq[Int]]]): BufferedImage = {
    require(pixels.length == 3, s"expected 3 channels, got ${pixels.length}")
    val h = pixels.head.length
    val w = pixels.head.head.length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        val rgb = (pixels(0)(i)(j) << 16) | (pixels(1)(i)(j) << 8) | pixels(2)(i)(j)
        img.setRGB(j, i, rgb)
        j += 1
      }
      i += 1
    }
    img
  }

  private def fromBufferedImage(img: BufferedImage): Seq[Seq[Seq[Int]]] = {
    val h = img.getHeight
    val w = img.getWidth
    Seq.tabulate(3, h, w) { (c, i, j) =>
      val rgb = img.getRGB(j, i)
      c match {
        case 0 => (rgb >> 16) & 0xff
        case 1 => (rgb >> 8) & 0xff
        case _ => rgb & 0xff
      }
    }
  }
}
