package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PixelOps

/** Wires the R3/R4 pixel kernels (reference main.py:247-286) into the
  * oracle-checked query surface.
  *
  * There is no raster table in the driver fixtures, so pixel cubes are
  * DERIVED deterministically from lineitem integer columns with
  * arithmetic that is expressible identically in Spark and DuckDB —
  * the formula strings below are the single source of truth, spliced
  * into both the Spark `selectExpr` and the oracle SQL. The derivation
  * deliberately produces the §5 edge cases at scale:
  *  - `% 256` values hit 0 (nodata) naturally;
  *  - pixel (2,1) is forced to (0,0,0) when l_orderkey % 11 = 0 — the
  *    out-of-bounds/true-black conflation case (main.py:276);
  *  - pixel (2,2) lands in [140, 242] per channel, straddling the
  *    white thresholds (min >= 153, spread <= 25.5, main.py:277).
  *
  * Scale posture: the cube build + ImageStats is a narrow map stage —
  * no shuffle, no pixel explosion; with real imagery (13 M px/image,
  * BASELINE.md) the same single-pass expression holds.
  */
object Pixels {

  /** [channel][row][col] value formulas — valid Spark SQL AND DuckDB
    * SQL over lineitem columns. Keys are cube positions. */
  val pxDefs: Seq[(String, String)] = Seq(
    "r11" -> "(l_partkey * 7 + l_orderkey) % 256",
    "r12" -> "(l_suppkey * 13) % 256",
    "r21" -> "CASE WHEN l_orderkey % 11 = 0 THEN 0 ELSE (l_partkey + l_suppkey) % 256 END",
    "r22" -> "140 + (l_partkey % 103)",
    "g11" -> "(l_partkey * 3 + 5) % 256",
    "g12" -> "CASE WHEN l_orderkey % 7 = 0 THEN 0 ELSE (l_orderkey * 17) % 256 END",
    "g21" -> "CASE WHEN l_orderkey % 11 = 0 THEN 0 ELSE (l_suppkey * 19) % 256 END",
    "g22" -> "140 + ((l_partkey + l_linenumber) % 103)",
    "b11" -> "(l_suppkey * 29 + 3) % 256",
    "b12" -> "(l_orderkey * 23) % 256",
    "b21" -> "CASE WHEN l_orderkey % 11 = 0 THEN 0 ELSE (l_partkey * 31) % 256 END",
    "b22" -> "140 + ((l_partkey + l_suppkey * 2) % 103)",
  )

  /** Bound the verified subset (still O(table) work, O(1/37) output). */
  val subset = "l_orderkey % 37 = 0"

  /** q15: derive 3×2×2 cubes, run the single-pass ImageStats custom
    * expression, emit per-row channel means + white_fraction. */
  def pixelStats(spark: SparkSession, dir: String): DataFrame = {
    val derived = Tables.lineitem(spark, dir)
      .filter(expr(subset))
      .selectExpr(
        Seq("l_orderkey", "l_linenumber") ++
          pxDefs.map { case (n, f) => s"CAST($f AS INT) AS $n" }: _*)
    val cube = expr(
      """array(
        |  array(array(r11, r12), array(r21, r22)),
        |  array(array(g11, g12), array(g21, g22)),
        |  array(array(b11, b12), array(b21, b22)))""".stripMargin)
    derived
      .withColumn("s", PixelOps.imageStats(cube))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("s.red_average"), 4).as("red_average"),
        round(col("s.green_average"), 4).as("green_average"),
        round(col("s.blue_average"), 4).as("blue_average"),
        round(col("s.white_fraction"), 4).as("white_fraction"))
  }

  /** Closed-form oracle: masked mean = sum / count-nonzero (zeros add
    * nothing to the sum); white/in-bounds via greatest/least per pixel.
    * Thresholds as integer comparisons (values are ints: >= 153.0 ⇔
    * >= 153, <= 25.5 ⇔ <= 25). */
  val pixelStatsSql: String = {
    val defs = pxDefs.map { case (n, f) => s"CAST($f AS INT) AS $n" }.mkString(",\n    ")
    def chan(c: String) = {
      val vs = Seq(s"${c}11", s"${c}12", s"${c}21", s"${c}22")
      val cnt = vs.map(v => s"CASE WHEN $v != 0 THEN 1 ELSE 0 END").mkString(" + ")
      val sum = vs.mkString(" + ")
      s"CASE WHEN $cnt > 0 THEN CAST($sum AS DOUBLE) / ($cnt) END"
    }
    def pix(p: String) = (s"greatest(r$p, g$p, b$p)", s"least(r$p, g$p, b$p)")
    val pixels = Seq("11", "12", "21", "22").map(pix)
    val inb = pixels.map { case (mx, _) => s"CASE WHEN $mx != 0 THEN 1 ELSE 0 END" }.mkString(" + ")
    val wht = pixels.map { case (mx, mn) =>
      s"CASE WHEN $mx != 0 AND $mn >= 153 AND $mx - $mn <= 25 THEN 1 ELSE 0 END"
    }.mkString(" + ")
    s"""WITH px AS (
       |  SELECT l_orderkey, l_linenumber,
       |    $defs
       |  FROM lineitem WHERE $subset)
       |SELECT l_orderkey, l_linenumber,
       |  round(${chan("r")}, 4) AS red_average,
       |  round(${chan("g")}, 4) AS green_average,
       |  round(${chan("b")}, 4) AS blue_average,
       |  round(CASE WHEN $inb > 0 THEN CAST($wht AS DOUBLE) / ($inb) END, 4) AS white_fraction
       |FROM px""".stripMargin
  }

  // ---------------------------------------------------------------- q28

  /** q28: R2 raster clip wired end-to-end. A 3×4×4 cube (derived like
    * q15) is geo-referenced to bbox [0,4]×[0,4] (north-up affine:
    * pixel centers x = col+0.5, y = 3.5−row) and clipped by the
    * ray-cast kernel to a diamond |x−2|+|y−2| ≤ 1.7, then ImageStats
    * runs on the clipped cube.
    *
    * Geometry chosen so no pixel center lies on the boundary (center
    * distances are 1.0/2.0/3.0 vs r=1.7) and exactly the 4 center
    * pixels (rows 1–2 × cols 1–2) survive. The ORACLE hardcodes that
    * expected mask — computing stats over only those 4 positions — so
    * any mis-mask in the affine transform or the ray cast is a hash
    * mismatch, not just a unit-test failure. */
  def cubeFormula(c: Int, i: Int, j: Int): String =
    s"(l_partkey * ${3 + c} + l_suppkey * ${1 + i} + l_orderkey * ${1 + j} + ${c * 16 + i * 4 + j}) % 256"

  private val clipSubset = "l_orderkey % 41 = 0 AND l_linenumber <= 2"

  def rasterClip(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Raster
    val names = for (c <- 0 until 3; i <- 0 until 4; j <- 0 until 4) yield s"v${c}_${i}_$j"
    val defs = for (c <- 0 until 3; i <- 0 until 4; j <- 0 until 4)
      yield s"CAST(${cubeFormula(c, i, j)} AS INT) AS v${c}_${i}_$j"
    val cube = expr((0 until 3).map { c =>
      (0 until 4).map { i =>
        "array(" + (0 until 4).map(j => s"v${c}_${i}_$j").mkString(", ") + ")"
      }.mkString("array(", ", ", ")")
    }.mkString("array(", ", ", ")"))
    val diamond: Seq[Seq[Seq[Double]]] =
      Seq(Seq(Seq(3.7, 2.0), Seq(2.0, 3.7), Seq(0.3, 2.0), Seq(2.0, 0.3)))
    val clipped = Raster.clipUdf(
      cube, lit(0.0), lit(4.0), lit(0.0), lit(4.0), typedlit(diamond))
    Tables.lineitem(spark, dir)
      .filter(expr(clipSubset))
      .selectExpr(Seq("l_orderkey", "l_linenumber") ++ defs: _*)
      .withColumn("s", PixelOps.imageStats(clipped))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("s.red_average"), 4).as("red_average"),
        round(col("s.green_average"), 4).as("green_average"),
        round(col("s.blue_average"), 4).as("blue_average"),
        round(col("s.white_fraction"), 4).as("white_fraction"))
  }

  val rasterClipSql: String = {
    // expected survivors of the diamond mask: rows 1-2 × cols 1-2
    val surv = Seq((1, 1), (1, 2), (2, 1), (2, 2))
    val defs = (for (c <- 0 until 3; (i, j) <- surv)
      yield s"CAST(${cubeFormula(c, i, j)} AS INT) AS v${c}_${i}_$j").mkString(",\n    ")
    def chan(c: Int) = {
      val vs = surv.map { case (i, j) => s"v${c}_${i}_$j" }
      val cnt = vs.map(v => s"CASE WHEN $v != 0 THEN 1 ELSE 0 END").mkString(" + ")
      s"CASE WHEN $cnt > 0 THEN CAST(${vs.mkString(" + ")} AS DOUBLE) / ($cnt) END"
    }
    val pixels = surv.map { case (i, j) =>
      (s"greatest(v0_${i}_$j, v1_${i}_$j, v2_${i}_$j)",
        s"least(v0_${i}_$j, v1_${i}_$j, v2_${i}_$j)")
    }
    val inb = pixels.map { case (mx, _) => s"CASE WHEN $mx != 0 THEN 1 ELSE 0 END" }.mkString(" + ")
    val wht = pixels.map { case (mx, mn) =>
      s"CASE WHEN $mx != 0 AND $mn >= 153 AND $mx - $mn <= 25 THEN 1 ELSE 0 END"
    }.mkString(" + ")
    s"""WITH px AS (
       |  SELECT l_orderkey, l_linenumber,
       |    $defs
       |  FROM lineitem WHERE $clipSubset)
       |SELECT l_orderkey, l_linenumber,
       |  round(${chan(0)}, 4) AS red_average,
       |  round(${chan(1)}, 4) AS green_average,
       |  round(${chan(2)}, 4) AS blue_average,
       |  round(CASE WHEN $inb > 0 THEN CAST($wht AS DOUBLE) / ($inb) END, 4) AS white_fraction
       |FROM px""".stripMargin
  }
}
