package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Raster

/** Golden tests for the raster kernels (FIXTURES.md §B raster_pixels
  * plan; reference main.py:206-308). */
class RasterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def gray(v: Int, h: Int, w: Int): Seq[Seq[Seq[Int]]] =
    Seq.fill(3)(Seq.fill(h)(Seq.fill(w)(v)))

  val diamond: Seq[Seq[Seq[Double]]] =
    Seq(Seq(Seq(3.7, 2.0), Seq(2.0, 3.7), Seq(0.3, 2.0), Seq(2.0, 0.3)))

  test("clip golden: 4×4 / diamond keeps exactly the 4 center pixels") {
    val cube = gray(200, 4, 4)
    val clipped = Raster.clip(cube, 0, 4, 0, 4, diamond)
    for (c <- 0 until 3; i <- 0 until 4; j <- 0 until 4) {
      val expectIn = (i == 1 || i == 2) && (j == 1 || j == 2)
      assert(clipped(c)(i)(j) == (if (expectIn) 200 else 0),
        s"pixel c=$c i=$i j=$j")
    }
  }

  test("clip golden: 8×8 / triangle polygon matches half-plane closed form") {
    // triangle (0,0)-(8,0)-(0,8): pixel center (x,y) inside iff x+y<8
    val tri = Seq(Seq(Seq(0.0, 0.0), Seq(8.0, 0.0), Seq(0.0, 8.0)))
    val clipped = Raster.clip(gray(99, 8, 8), 0, 8, 0, 8, tri)
    for (i <- 0 until 8; j <- 0 until 8) {
      val x = j + 0.5; val y = 7.5 - i
      val in = x + y < 8.0 // no center lands exactly on the hypotenuse (x+y ∈ {1,2,…})
      assert(clipped(0)(i)(j) == (if (in) 99 else 0), s"i=$i j=$j x=$x y=$y")
    }
  }

  test("clip is idempotent (SURVEY §5 property)") {
    val cube = Seq.tabulate(3, 6, 6)((c, i, j) => (c * 37 + i * 11 + j * 5) % 256)
    val once = Raster.clip(cube, 0, 6, 0, 6, diamond)
    val twice = Raster.clip(once, 0, 6, 0, 6, diamond)
    assert(once == twice)
  }

  test("stack + thumbnail: 14×14 → 2×2 with channel means preserved on uniform input") {
    val thumb = Raster.thumbnailArray(gray(180, 14, 14), 7)
    assert(thumb.length == 3 && thumb.head.length == 2 && thumb.head.head.length == 2)
    // uniform image: bicubic must return the same uniform value
    for (c <- 0 until 3; i <- 0 until 2; j <- 0 until 2)
      assert(thumb(c)(i)(j) == 180)
  }

  test("thumbnail of non-uniform image keeps means within tolerance (PIL-parity is structural)") {
    val cube = Seq.tabulate(3, 14, 14)((c, i, j) => if (j < 7) 40 else 200)
    val thumb = Raster.thumbnailArray(cube, 7)
    val mean = thumb.head.flatten.sum.toDouble / 4
    assert(math.abs(mean - 120.0) < 40.0, s"half-dark/half-light mean ≈ 120, got $mean")
  }

  test("PNG codec roundtrip is lossless") {
    val cube = Seq.tabulate(3, 5, 7)((c, i, j) => (c * 83 + i * 29 + j * 13) % 256)
    assert(Raster.decodeImage(Raster.encodePng(cube)) == cube)
  }

  test("TIFF codec roundtrip is lossless (JDK ImageIO TIFF plugin)") {
    val cube = Seq.tabulate(3, 4, 4)((c, i, j) => (c * 51 + i * 17 + j * 7) % 256)
    assert(Raster.decodeImage(Raster.encodeTiff(cube)) == cube)
  }

  test("JPEG codec: real lossy roundtrip — dims exact, channel means close, smaller payload") {
    // LCG noise, 64×64: incompressible for PNG, so the size claim is
    // about JPEG's lossy transform, not header overhead
    var seed = 42L
    def next(): Int = { seed = (seed * 6364136223846793005L + 1442695040888963407L); ((seed >>> 33) % 256).toInt }
    val cube = Seq.fill(3, 64, 64)(next())
    val bytes = Raster.encodeJpeg(cube, 0.9f)
    // a real JPEG container, not a renamed bitmap
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "missing SOI marker")
    val back = Raster.decodeImage(bytes)
    assert(back.length == 3 && back.head.length == 64 && back.head.head.length == 64)
    def mean(p: Seq[Seq[Int]]): Double = p.flatten.sum.toDouble / p.flatten.size
    (0 until 3).foreach { c =>
      assert(math.abs(mean(back(c)) - mean(cube(c))) < 4.0,
        s"channel $c mean drifted: ${mean(back(c))} vs ${mean(cube(c))}")
    }
    // and the point of JPEG: the payload actually compresses
    assert(bytes.length < Raster.encodePng(cube).length,
      "lossy JPEG at q=0.9 should beat lossless PNG on noise")
  }

  test("zip-of-band-TIFFs codec: order-insensitive bit-exact roundtrip; missing band is loud") {
    val cube = Seq.tabulate(3, 6, 9)((c, i, j) => (c * 91 + i * 31 + j * 11) % 256)
    val bands = Seq("B04", "B03", "B02")
    val zip = Raster.encodeBandZip(cube, bands)
    assert(Raster.decodeBandZip(zip, bands) == cube, "same-order roundtrip")
    // archives deliver entries in arbitrary order — decode stacks by NAME
    val reordered = Raster.decodeBandZip(zip, Seq("B02", "B04", "B03"))
    assert(reordered == Seq(cube(2), cube(0), cube(1)), "by-name stacking")
    val err = intercept[IllegalArgumentException](
      Raster.decodeBandZip(zip, Seq("B04", "B08")))
    assert(err.getMessage.contains("B08"))
    // zip is a real archive: entry names visible to plain java.util.zip
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(zip))
    val names = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map(_.getName).toSet
    assert(names == Set("B04.tif", "B03.tif", "B02.tif"))
  }

  test("q87 pixel leg: planted resized + JPEG-re-encoded duplicates pair with their " +
      "original through imageNearDupPixels; a distinct image stays out") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.{ImageHash, Raster}
    // smooth structured image — strong block-to-block gradients, so
    // the dHash has real margins (flat/noisy inputs would make the
    // gradient signs coin flips, which is not the perceptual regime)
    def img(fx: Double, fy: Double, phase: Double): Seq[Seq[Seq[Int]]] =
      Seq.tabulate(3, 56, 72)((c, y, x) =>
        math.max(0, math.min(255,
          (128 + 110 * math.sin(x / fx + phase) * math.cos(y / fy)).toInt)))
    val base = img(11.0, 9.0, 0.3)
    val distinct = img(5.0, 13.0, 2.1) // different spatial frequencies
    val resized = Raster.thumbnailArray(base, 2) // bicubic 56×72 → 28×36
    val jpeg = Raster.decodeImage(Raster.encodeJpeg(base, 0.85f))
    // kernel-level invariance (driver replay)
    val h0 = ImageHash.pixelDhashSeq(base)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h0, ImageHash.pixelDhashSeq(resized)) <= operators.Dedup.DHashHamMax,
      "bicubic 2x resize must stay within the pairing radius")
    assert(ham(h0, ImageHash.pixelDhashSeq(jpeg)) <= operators.Dedup.DHashHamMax,
      "JPEG q=0.85 re-encode must stay within the pairing radius")
    assert(ham(h0, ImageHash.pixelDhashSeq(distinct)) > operators.Dedup.DHashHamMax,
      "a structurally different image must not pair")
    // operator end-to-end: decode-side types, codegen'd expression,
    // banded pigeonhole join
    val df = Seq((0L, base), (1L, resized), (2L, jpeg), (10L, distinct))
      .toDF("doc_id", "pixels")
    val pairs = operators.Dedup.imageNearDupPixels(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"planted duplicates (and only they) must pair, got $pairs")
  }

  test("clip UDF works inside a DataFrame pipeline (R2 in plan form)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, gray(200, 4, 4))).toDF("id", "pixels")
      .withColumn("clipped",
        Raster.clipUdf(col("pixels"), lit(0.0), lit(4.0), lit(0.0), lit(4.0),
          typedlit(diamond)))
      .select(graft.functions.PixelOps.imageStats(col("clipped")).as("s"))
      .select("s.*")
    val r = df.head()
    assert(r.getDouble(0) == 200.0 && r.getDouble(3) == 1.0)
  }
}
