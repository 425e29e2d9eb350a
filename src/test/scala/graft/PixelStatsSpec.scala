package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.PixelOps

/** Golden + property tests for the R3/R4 pixel kernels
  * (reference main.py:247-286; edge cases from SURVEY.md §5 and
  * FIXTURES.md §B raster_pixels). */
class PixelStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** One-row DataFrame holding a [channel][row][col] cube. */
  private def cubeDf(cube: Seq[Seq[Seq[Int]]]): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(cube)).toDF("pixels")
  }

  private def stats(cube: Seq[Seq[Seq[Int]]]): Row =
    cubeDf(cube).select(PixelOps.imageStats(col("pixels")).as("s"))
      .select("s.*").head()

  private def gray(v: Int, h: Int = 2, w: Int = 2): Seq[Seq[Seq[Int]]] =
    Seq.fill(3)(Seq.fill(h)(Seq.fill(w)(v)))

  test("all-white cube: means 255, white_fraction 1.0") {
    val r = stats(gray(255, 8, 8))
    assert(r.getDouble(0) == 255.0 && r.getDouble(1) == 255.0 && r.getDouble(2) == 255.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("half white / half blue: white_fraction 0.5") {
    // rows 0: (200,200,200) white; rows 1: (10,10,230) not white
    val cube = Seq(
      Seq(Seq(200, 200), Seq(10, 10)),
      Seq(Seq(200, 200), Seq(10, 10)),
      Seq(Seq(200, 200), Seq(230, 230)))
    assert(stats(cube).getDouble(3) == 0.5)
  }

  test("white threshold boundary: 153 is white, 152 is not (main.py:277)") {
    assert(stats(gray(153)).getDouble(3) == 1.0)
    assert(stats(gray(152)).getDouble(3) == 0.0)
  }

  test("spread boundary: spread 25 is white, 26 is not") {
    val w = Seq(
      Seq(Seq(153, 153), Seq(153, 153)),
      Seq(Seq(178, 178), Seq(178, 178)), // max-min = 25 <= 25.5
      Seq(Seq(160, 160), Seq(160, 160)))
    assert(stats(w).getDouble(3) == 1.0)
    val nw = Seq(
      Seq(Seq(153, 153), Seq(153, 153)),
      Seq(Seq(179, 179), Seq(179, 179)), // max-min = 26 > 25.5
      Seq(Seq(160, 160), Seq(160, 160)))
    assert(stats(nw).getDouble(3) == 0.0)
  }

  test("all-zero channel yields null mean for that channel only") {
    val cube = Seq(
      Seq(Seq(10, 20), Seq(30, 40)),
      Seq(Seq(0, 0), Seq(0, 0)),
      Seq(Seq(5, 0), Seq(0, 15)))
    val r = stats(cube)
    assert(r.getDouble(0) == 25.0)
    assert(r.isNullAt(1), "all-zero green channel → null mean (numpy NaN analog)")
    assert(r.getDouble(2) == 10.0, "blue mean over nonzero {5,15} only")
  }

  test("all-zero image: null means AND null white_fraction (nothing in bounds)") {
    val r = stats(gray(0))
    (0 to 3).foreach(i => assert(r.isNullAt(i)))
  }

  test("true-black pixel is conflated with nodata (reference quirk, main.py:276)") {
    // one black pixel among three white → in-bounds count is 3, not 4
    val cube = Seq(
      Seq(Seq(255, 255), Seq(255, 0)),
      Seq(Seq(255, 255), Seq(255, 0)),
      Seq(Seq(255, 255), Seq(255, 0)))
    assert(stats(cube).getDouble(3) == 1.0, "3 white / 3 in-bounds — black excluded from both")
  }

  test("malformed shapes degrade to null, not errors") {
    assert(stats(Seq(Seq(Seq(1)), Seq(Seq(1)))) == Row(null, null, null, null) ||
      cubeDf(Seq(Seq(Seq(1)), Seq(Seq(1))))
        .select(PixelOps.imageStats(col("pixels")).as("s")).head().isNullAt(0))
    // ragged rows
    val ragged = Seq(Seq(Seq(1, 2), Seq(3)), Seq(Seq(1, 2), Seq(3, 4)), Seq(Seq(1, 2), Seq(3, 4)))
    assert(cubeDf(ragged).select(PixelOps.imageStats(col("pixels")).as("s")).head().isNullAt(0))
  }

  test("property: ImageStats ≡ declarative PixelOps formulations on random cubes") {
    import spark.implicits._
    val pxGen = Gen.frequency(
      (2, Gen.const(0)),
      (3, Gen.choose(140, 255)), // straddles white thresholds
      (2, Gen.choose(1, 255)))
    val cubeGen = for {
      h <- Gen.choose(1, 4)
      w <- Gen.choose(1, 4)
      cube <- Gen.listOfN(3, Gen.listOfN(h, Gen.listOfN(w, pxGen)))
    } yield cube.map(_.map(_.toSeq).toSeq).toSeq

    val cubes = Gen.listOfN(60, cubeGen).sample.get
    val df = cubes.zipWithIndex.map { case (c, i) => (i, c) }.toDF("id", "pixels")
    val got = df.select(
        col("id"),
        PixelOps.imageStats(col("pixels")).as("s"),
        PixelOps.maskedMean(element_at(col("pixels"), 1)).as("mr"),
        PixelOps.maskedMean(element_at(col("pixels"), 2)).as("mg"),
        PixelOps.maskedMean(element_at(col("pixels"), 3)).as("mb"),
        PixelOps.whiteFraction(col("pixels")).as("wf"))
      .collect()
    got.foreach { r =>
      def eq(a: Any, b: Any): Boolean = (a, b) match {
        case (null, null) => true
        case (x: Double, y: Double) => math.abs(x - y) < 1e-9
        case _ => false
      }
      val s = r.getStruct(1)
      assert(eq(s.get(0), r.get(2)), s"red mean mismatch id=${r.getInt(0)}: ${s.get(0)} vs ${r.get(2)}")
      assert(eq(s.get(1), r.get(3)), s"green mean mismatch id=${r.getInt(0)}")
      assert(eq(s.get(2), r.get(4)), s"blue mean mismatch id=${r.getInt(0)}")
      assert(eq(s.get(3), r.get(5)), s"white_fraction mismatch id=${r.getInt(0)}")
    }
  }

  test("ImageStats doGenCode compiles and matches interpreted eval (no silent fallback)") {
    import spark.implicits._
    import graft.functions.ImageStats
    import org.apache.spark.sql.GraftSqlBridge
    // Janino failures normally fall back to interpreted execution and
    // the test would still pass — disable the fallback so a codegen
    // bug FAILS here instead of shipping as a silent slow path.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(
        (1, Seq(Seq(Seq(200, 0)), Seq(Seq(210, 0)), Seq(Seq(190, 0)))), // white + nodata px
        (2, Seq(Seq(Seq(10, 20)), Seq(Seq(0, 0)), Seq(Seq(30, 40)))),   // all-zero green
        (3, Seq(Seq(Seq.empty[Int]), Seq(Seq.empty[Int]), Seq(Seq.empty[Int])))) // empty planes
        .toDF("id", "pixels")
      val rows = df.select(col("id"),
          GraftSqlBridge.column(ImageStats(GraftSqlBridge.expression(col("pixels")))).as("s"))
        .orderBy("id").collect()
      val s1 = rows(0).getStruct(1)
      assert(s1.getDouble(0) === 200.0 && s1.getDouble(1) === 210.0 && s1.getDouble(2) === 190.0)
      assert(s1.getDouble(3) === 1.0) // the one in-bounds pixel is white
      val s2 = rows(1).getStruct(1)
      assert(s2.isNullAt(1), "all-zero green channel must be null")
      assert(s2.getDouble(3) === 0.0)
      val s3 = rows(2).getStruct(1)
      assert(s3.isNullAt(0) && s3.isNullAt(3), "empty planes: all stats null")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
