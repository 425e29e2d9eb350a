package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** Z-order layout: the write-side clustering that makes parquet
  * footer min/max stats selective for MULTI-dimensional predicates.
  * The spec proves the two claims separately: (1) the ZValue
  * expression is the exact Morton interleave (codegen ≡ interpreter ≡
  * a driver-side reference); (2) the layout actually skips — a
  * second-dimension box predicate intersects only the z-files whose
  * min/max boxes cover it, where a linear single-column sort leaves
  * every file eligible. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def refZ(x: Long, y: Long, bits: Int): Long = {
    val mx = (1L << bits) - 1
    val cx = math.max(0L, math.min(mx, x)); val cy = math.max(0L, math.min(mx, y))
    (0 until bits).foldLeft(0L)((z, i) =>
      z | (((cx >> i) & 1L) << (2 * i)) | (((cy >> i) & 1L) << (2 * i + 1)))
  }

  test("ZValue: codegen == interpreter == reference interleave; clamps and propagates null") {
    import spark.implicits._
    val rows = (for (x <- -2L to 130L by 7L; y <- -2L to 130L by 11L) yield (x, y)).toDF("x", "y")
    def eval(): Array[(Long, Long, Long)] = rows
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 7).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val saved = Seq("spark.sql.codegen.fallback", "spark.sql.codegen.wholeStage",
      "spark.sql.codegen.factoryMode").map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val viaCodegen = eval()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val viaInterp = eval()
      assert(viaCodegen.toSeq == viaInterp.toSeq, "ZValue codegen != interpreter")
      viaCodegen.foreach { case (x, y, z) =>
        assert(z == refZ(x, y, 7), s"z($x,$y) = $z != reference ${refZ(x, y, 7)}")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    val n = rows.select(ZOrder.zValue(lit(null).cast("long"), col("y"), 7)).collect()
    assert(n.forall(_.isNullAt(0)), "null dimension must propagate")
  }

  test("z-order files prune a second-dimension box where a linear sort cannot") {
    import spark.implicits._
    val bits = 7
    val grid = spark.range(1L << (2 * bits)).toDF("id")
      .select((col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))

    val zDir = "/tmp/zorder_spec/z"
    val linDir = "/tmp/zorder_spec/lin"
    ZOrder.layoutByZ(grid, col("x"), col("y"), bits, 16)
      .drop("zv").write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(linDir)

    def fileBoxes(dir: String): Seq[(Long, Long, Long, Long)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(files.length >= 12, s"$dir: expected ~16 files, got ${files.length}")
      files.toIndexedSeq.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    // the footer-pruning decision, computed from the same min/max a
    // parquet reader consults: does the file's box intersect the query?
    def hits(boxes: Seq[(Long, Long, Long, Long)],
        x0: Long, x1: Long, y0: Long, y1: Long): Int =
      boxes.count { case (mnx, mxx, mny, mxy) =>
        mxx >= x0 && mnx <= x1 && mxy >= y0 && mny <= y1
      }

    val zBoxes = fileBoxes(zDir)
    val linBoxes = fileBoxes(linDir)

    // y-selective slab: linear-by-x layout cannot skip ANY file (every
    // x-stripe spans all y); z-files cover ~32x32 blocks, so only the
    // slab's block row survives
    val zSlab = hits(zBoxes, 0, 127, 96, 103)
    val linSlab = hits(linBoxes, 0, 127, 96, 103)
    assert(linSlab == linBoxes.length, "linear sort must be unable to skip on y")
    assert(zSlab * 2 <= zBoxes.length,
      s"z-layout should prune the y-slab to a minority of files, hit $zSlab/${zBoxes.length}")

    // tight 2-D box: z-layout narrows to a handful of block files
    val zBox = hits(zBoxes, 32, 39, 96, 103)
    assert(zBox <= 4, s"8x8 box should hit <=4 z-files, hit $zBox")

    // and the layout is still lossless: both copies hold the full grid
    assert(spark.read.parquet(zDir).count() == (1L << (2 * bits)))
  }
}
