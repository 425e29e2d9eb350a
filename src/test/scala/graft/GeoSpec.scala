package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geo

/** Ray-cast point-in-polygon goldens (F1 general containment — the
  * custom kernel SURVEY §7.2 requires; feeds the R2 raster clip). */
class GeoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  val triangle = IndexedSeq(
    IndexedSeq(0.0, 0.0), IndexedSeq(4.0, 0.0), IndexedSeq(0.0, 4.0))

  test("triangle containment goldens") {
    assert(Geo.pointInRing(1.0, 1.0, triangle))
    assert(Geo.pointInRing(0.5, 0.5, triangle))
    assert(!Geo.pointInRing(3.0, 3.0, triangle), "outside the hypotenuse")
    assert(!Geo.pointInRing(-1.0, 1.0, triangle))
    assert(!Geo.pointInRing(5.0, 0.5, triangle))
  }

  test("diamond (convex) matches the closed form |x-cx|+|y-cy| < r") {
    val (cx, cy, r) = (2.0, 2.0, 1.7)
    val diamond = IndexedSeq(
      IndexedSeq(cx + r, cy), IndexedSeq(cx, cy + r),
      IndexedSeq(cx - r, cy), IndexedSeq(cx, cy - r))
    for (x <- BigDecimal(0.0) to 4.0 by 0.25; y <- BigDecimal(0.0) to 4.0 by 0.25) {
      val (xd, yd) = (x.toDouble, y.toDouble)
      val closed = math.abs(xd - cx) + math.abs(yd - cy) < r
      // skip exact-boundary probes (ray-cast edge behavior is half-open)
      if (math.abs(math.abs(xd - cx) + math.abs(yd - cy) - r) > 1e-9) {
        assert(Geo.pointInRing(xd, yd, diamond) == closed, s"($xd, $yd)")
      }
    }
  }

  test("multi-polygon: disjoint parts OR together") {
    val polys = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(1.0, 1.0), Seq(0.0, 1.0)),
      Seq(Seq(5.0, 5.0), Seq(6.0, 5.0), Seq(6.0, 6.0), Seq(5.0, 6.0)))
    assert(Geo.pointInPolygon(0.5, 0.5, polys))
    assert(Geo.pointInPolygon(5.5, 5.5, polys))
    assert(!Geo.pointInPolygon(3.0, 3.0, polys))
  }

  test("UDF form works in a DataFrame filter") {
    import spark.implicits._
    val geom = Seq(Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(0.0, 4.0)))
    val df = Seq((1L, 1.0, 1.0), (2L, 3.0, 3.0)).toDF("id", "x", "y")
      .withColumn("geom", typedLit(geom))
    val in = df.filter(Geo.pointInPolygonCol(col("x"), col("y"), col("geom")))
      .select("id").collect().map(_.getLong(0))
    assert(in.toSeq == Seq(1L))
  }

  test("concave polygon (L-shape)") {
    val l = IndexedSeq(
      IndexedSeq(0.0, 0.0), IndexedSeq(3.0, 0.0), IndexedSeq(3.0, 1.0),
      IndexedSeq(1.0, 1.0), IndexedSeq(1.0, 3.0), IndexedSeq(0.0, 3.0))
    assert(Geo.pointInRing(0.5, 2.5, l), "vertical arm")
    assert(Geo.pointInRing(2.5, 0.5, l), "horizontal arm")
    assert(!Geo.pointInRing(2.0, 2.0, l), "notch is outside")
  }
}
