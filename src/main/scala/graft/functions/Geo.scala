package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Pure-Scala computational geometry (SURVEY §7.2: F1 general
  * polygon-contains and the R2 clip kernel need custom code; no
  * external geo libs in the offline build).
  *
  * Geometry representation follows the reference's nested-list layout
  * (`water_body_geometries.geometry`, reference main.py:357, 375-377):
  * `array<array<array<double>>>` = polygons → ring vertices → [lon,
  * lat] (z, if present, is dropped upstream — P7).
  */
object Geo {

  /** Even-odd ray cast against one ring (vertices as [x, y] pairs).
    * Boundary behavior: half-open (standard crossing rule) — callers
    * that need exactness on edges must not place test points on them.
    */
  def pointInRing(x: Double, y: Double, ring: IndexedSeq[IndexedSeq[Double]]): Boolean = {
    var inside = false
    var i = 0
    val n = ring.length
    var j = n - 1
    while (i < n) {
      val xi = ring(i)(0); val yi = ring(i)(1)
      val xj = ring(j)(0); val yj = ring(j)(1)
      if ((yi > y) != (yj > y)) {
        val xCross = (xj - xi) * (y - yi) / (yj - yi) + xi
        if (x < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Multi-polygon containment: inside any ring (disjoint-polygon OR —
    * the reference unions its polygons into one boundary, P9
    * main.py:386-390; keeping the multi-polygon and OR-ing is
    * equivalent for disjoint parts, SURVEY §2.4 P9 'our choice'). */
  def pointInPolygon(x: Double, y: Double, polys: Seq[Seq[Seq[Double]]]): Boolean =
    polys.exists(r => pointInRing(x, y, r.map(_.toIndexedSeq).toIndexedSeq))

  /** Column form for joins/filters: point_in_polygon(lon, lat, geom). */
  val pointInPolygonUdf =
    udf((x: Double, y: Double, polys: Seq[Seq[Seq[Double]]]) => pointInPolygon(x, y, polys))

  def pointInPolygonCol(lon: Column, lat: Column, geom: Column): Column =
    pointInPolygonUdf(lon, lat, geom)
}
