package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Spatial surface (SURVEY §2.3 F1, §2.4 P7/P8): the fixtures carry
  * no coordinates, so points and tiles are DERIVED deterministically
  * (shared-formula arithmetic, oracle-replicable) — points from
  * events, a 5×5 world grid of 72°×36° tiles from nation keys.
  *
  *  - q26 spatial containment join, grid style: a point's cell id is
  *    COMPUTED (floor arithmetic), making containment an EQUI-join on
  *    the cell — the scalable spatial-join pattern (the naive form is
  *    a bbox-predicate theta join = nested loop over every tile). The
  *    bbox residual predicate stays as belt-and-braces.
  *  - q27 geometry prep: nested-array polygons ([x,y,z] vertices) →
  *    z-drop (P7, the reference's `del point[2]` main.py:374-377) via
  *    nested `transform`, then bbox + centroid (P8, main.py:379-384)
  *    via array folds — all built-ins, no UDF.
  */
object Spatial {

  /** Point derivation from events — positive before %, so both
    * engines' remainder semantics agree. */
  private val lonSql = "(CAST(user_id AS DOUBLE) * 7.3 + value) % 360.0 - 180.0"
  private val latSql = "(CAST(user_id AS DOUBLE) * 3.7 + value * 2.0) % 180.0 - 90.0"

  def spatialJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(spark, dir)
      .selectExpr("event_id", "value", s"$lonSql AS lon", s"$latSql AS lat")
      .selectExpr("event_id", "value", "lon", "lat",
        "CAST(floor((lat + 90.0) / 36.0) AS INT) * 5 + CAST(floor((lon + 180.0) / 72.0) AS INT) AS cell")
    val tiles = Tables.nation(spark, dir)
      .selectExpr("n_nationkey", "n_name",
        "(n_nationkey % 5) * 72 - 180 AS lon0",
        "(n_nationkey div 5) * 36 - 90 AS lat0") // div = DuckDB's //
    pts.join(broadcast(tiles), pts("cell") === tiles("n_nationkey"))
      // residual bbox containment — provably redundant given the cell
      // arithmetic, kept as the explicit spatial predicate (F1)
      .filter(col("lon") >= col("lon0") && col("lon") < col("lon0") + 72 &&
        col("lat") >= col("lat0") && col("lat") < col("lat0") + 36)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_points"),
        round(min(col("lon")), 6).as("min_lon"),
        round(max(col("lon")), 6).as("max_lon"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  val spatialJoinSql: String =
    s"""WITH pts AS (
       |  SELECT event_id, value, lon, lat,
       |         CAST(floor((lat + 90.0) / 36.0) AS INT) * 5 + CAST(floor((lon + 180.0) / 72.0) AS INT) AS cell
       |  FROM (SELECT event_id, value, $lonSql AS lon, $latSql AS lat FROM events)),
       |tiles AS (
       |  SELECT n_nationkey, n_name,
       |         (n_nationkey % 5) * 72 - 180 AS lon0,
       |         (n_nationkey // 5) * 36 - 90 AS lat0
       |  FROM nation)
       |SELECT n_name, count(*) AS n_points,
       |       round(min(lon), 6) AS min_lon,
       |       round(max(lon), 6) AS max_lon,
       |       round(sum(value), 2) AS sum_value
       |FROM pts JOIN tiles ON cell = n_nationkey
       |WHERE lon >= lon0 AND lon < lon0 + 72
       |  AND lat >= lat0 AND lat < lat0 + 36
       |GROUP BY n_name""".stripMargin

  /** Hexagon-ish vertex offsets (×r/2) — rational arithmetic only, no
    * trig (libm results are not bit-portable across engines). */
  private val dx = Seq("2.0", "1.0", "-1.0", "-2.0", "-1.0", "1.0")
  private val dy = Seq("0.0", "2.0", "2.0", "0.0", "-2.0", "-2.0")

  def geometryPrep(spark: SparkSession, dir: String): DataFrame = {
    val poly = Tables.nation(spark, dir)
      .selectExpr("n_nationkey", "n_name",
        "CAST((n_nationkey % 5) * 72 - 180 + 36 AS DOUBLE) AS clon",
        "CAST((n_nationkey div 5) * 36 - 90 + 18 AS DOUBLE) AS clat",
        "CAST(5 + n_nationkey % 7 AS DOUBLE) AS r")
      // vertices [x, y, z] — z = vertex index (exercises P7 z-drop)
      .withColumn("ring3d", expr(
        s"""transform(sequence(0, 5), k -> array(
           |  clon + r * element_at(array(${dx.mkString(", ")}), k + 1) / 2.0,
           |  clat + r * element_at(array(${dy.mkString(", ")}), k + 1) / 2.0,
           |  CAST(k AS DOUBLE)))""".stripMargin))
      // P7: drop z
      .withColumn("ring", expr("transform(ring3d, p -> slice(p, 1, 2))"))
    poly.select(
      col("n_nationkey"), col("n_name"),
      size(col("ring")).as("n_vertices"),
      round(expr("array_min(transform(ring, p -> p[0]))"), 6).as("min_x"),
      round(expr("array_max(transform(ring, p -> p[0]))"), 6).as("max_x"),
      round(expr("array_min(transform(ring, p -> p[1]))"), 6).as("min_y"),
      round(expr("array_max(transform(ring, p -> p[1]))"), 6).as("max_y"),
      round(expr("aggregate(transform(ring, p -> p[0]), CAST(0 AS DOUBLE), (a, x) -> a + x) / size(ring)"), 6).as("centroid_x"),
      round(expr("aggregate(transform(ring, p -> p[1]), CAST(0 AS DOUBLE), (a, x) -> a + x) / size(ring)"), 6).as("centroid_y"))
  }

  val geometryPrepSql: String =
    s"""WITH poly AS (
       |  SELECT n_nationkey, n_name,
       |         list_transform(generate_series(0, 5), k -> [
       |           CAST((n_nationkey % 5) * 72 - 180 + 36 AS DOUBLE)
       |             + CAST(5 + n_nationkey % 7 AS DOUBLE) * ([${dx.mkString(", ")}])[k + 1] / 2.0,
       |           CAST((n_nationkey // 5) * 36 - 90 + 18 AS DOUBLE)
       |             + CAST(5 + n_nationkey % 7 AS DOUBLE) * ([${dy.mkString(", ")}])[k + 1] / 2.0,
       |           CAST(k AS DOUBLE)]) AS ring3d
       |  FROM nation),
       |r2 AS (SELECT n_nationkey, n_name,
       |              list_transform(ring3d, p -> p[1:2]) AS ring
       |       FROM poly)
       |SELECT n_nationkey, n_name,
       |       len(ring) AS n_vertices,
       |       round(list_min(list_transform(ring, p -> p[1])), 6) AS min_x,
       |       round(list_max(list_transform(ring, p -> p[1])), 6) AS max_x,
       |       round(list_min(list_transform(ring, p -> p[2])), 6) AS min_y,
       |       round(list_max(list_transform(ring, p -> p[2])), 6) AS max_y,
       |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(ring, p -> p[1])), (a, x) -> a + x) / len(ring), 6) AS centroid_x,
       |       round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(ring, p -> p[2])), (a, x) -> a + x) / len(ring), 6) AS centroid_y
       |FROM r2""".stripMargin
}
