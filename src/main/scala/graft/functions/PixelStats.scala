package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Single-pass per-image pixel statistics (reference main.py:247-286,
  * R3+R4 in SURVEY.md §2.5) as a native Catalyst expression.
  *
  * Input: `array<array<array<int>>>` pixels laid out
  * [channel][row][col], 3 channels (RGB), values 0-255 (the
  * reference asserts uint8 at main.py:270, 298; JVM has no unsigned
  * byte so fixtures store ints — SURVEY §7.3).
  *
  * Output: struct(red_average, green_average, blue_average,
  * white_fraction), each nullable.
  *
  * Semantics faithfully reproduce the reference, including its
  * nodata=0 quirk (SURVEY §7.3 "don't fix silently"):
  *  - channel mean is over pixels where that channel != 0
  *    (main.py:247-251 `np.mean(channel[channel != 0])`); an
  *    all-zero channel yields null (numpy yields NaN);
  *  - a pixel is out-of-bounds iff max(r,g,b) == 0 (main.py:276) —
  *    true-black in-bounds pixels are conflated with nodata;
  *  - white iff min(r,g,b) >= 0.6*255 and max-min <= 0.1*255
  *    (main.py:277 — the code thresholds 153/25.5, not the comment's
  *    128/15%; code wins per SURVEY §2.5 R4);
  *  - white_fraction = whiteCount / inBoundsCount (main.py:276-281),
  *    null when nothing is in bounds.
  *
  * Scale rationale: at 2100×2100×3 ≈ 13.2 M pixels per image
  * (BASELINE.md image cap), exploding pixels to rows would shuffle
  * ~100 M rows per 8-image partition; this expression computes all
  * four statistics in ONE pass over the array buffers of the row —
  * a narrow map stage, no shuffle, no row explosion (SURVEY §4
  * custom-work item 3).
  */
case class ImageStats(child: Expression)
    extends UnaryExpression {

  private val WhiteMin = 0.6 * 255.0   // 153.0 (main.py:277)
  private val WhiteSpread = 0.1 * 255.0 // 25.5  (main.py:277)

  override def dataType: DataType = ImageStats.outputType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val channels = v.asInstanceOf[ArrayData]
    if (channels.numElements() != 3) return null
    val r = channels.getArray(0)
    val g = channels.getArray(1)
    val b = channels.getArray(2)
    if (r == null || g == null || b == null) return null
    val nRows = r.numElements()
    if (g.numElements() != nRows || b.numElements() != nRows) return null

    var sumR, sumG, sumB = 0L
    var cntR, cntG, cntB = 0L
    var white, inBounds = 0L

    var i = 0
    while (i < nRows) {
      val rr = r.getArray(i); val gr = g.getArray(i); val br = b.getArray(i)
      // malformed shape (null row array) → null result, matching the
      // other malformed-shape paths — not an executor NPE
      if (rr == null || gr == null || br == null) return null
      val nCols = rr.numElements()
      if (gr.numElements() != nCols || br.numElements() != nCols) return null
      var j = 0
      while (j < nCols) {
        val rv = rr.getInt(j); val gv = gr.getInt(j); val bv = br.getInt(j)
        if (rv != 0) { sumR += rv; cntR += 1 }
        if (gv != 0) { sumG += gv; cntG += 1 }
        if (bv != 0) { sumB += bv; cntB += 1 }
        val mx = math.max(rv, math.max(gv, bv))
        val mn = math.min(rv, math.min(gv, bv))
        if (mx != 0) {
          inBounds += 1
          if (mn >= WhiteMin && (mx - mn) <= WhiteSpread) white += 1
        }
        j += 1
      }
      i += 1
    }

    def mean(s: Long, c: Long): Any = if (c == 0) null else s.toDouble / c
    new GenericInternalRow(Array[Any](
      mean(sumR, cntR), mean(sumG, cntG), mean(sumB, cntB),
      if (inBounds == 0) null else white.toDouble / inBounds))
  }

  /** Same kernel emitted as Java so the per-image pass stays inside
    * whole-stage codegen — no interpreted-eval virtual dispatch per
    * row in the pixel hot path. Thresholds are compared as doubles,
    * exactly like the interpreted eval (PixelStatsSpec pins both
    * paths to the same goldens). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      val ok = ctx.freshName("ok")
      val r = ctx.freshName("r"); val g = ctx.freshName("g"); val b = ctx.freshName("b")
      val sums = ctx.freshName("sums"); val cnts = ctx.freshName("cnts")
      val white = ctx.freshName("white"); val inb = ctx.freshName("inb")
      val nRows = ctx.freshName("nRows"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val rr = ctx.freshName("rr"); val gr = ctx.freshName("gr"); val br = ctx.freshName("br")
      val nCols = ctx.freshName("nCols")
      val rv = ctx.freshName("rv"); val gv = ctx.freshName("gv"); val bv = ctx.freshName("bv")
      val mx = ctx.freshName("mx"); val mn = ctx.freshName("mn")
      val out = ctx.freshName("out")
      s"""
         |${ev.isNull} = true;
         |boolean $ok = $c.numElements() == 3;
         |$ad $r = null; $ad $g = null; $ad $b = null;
         |if ($ok) {
         |  $r = $c.getArray(0); $g = $c.getArray(1); $b = $c.getArray(2);
         |  $ok = $r != null && $g != null && $b != null;
         |}
         |int $nRows = 0;
         |if ($ok) {
         |  $nRows = $r.numElements();
         |  $ok = $g.numElements() == $nRows && $b.numElements() == $nRows;
         |}
         |long[] $sums = new long[3]; long[] $cnts = new long[3];
         |long $white = 0L; long $inb = 0L;
         |for (int $i = 0; $ok && $i < $nRows; $i++) {
         |  $ad $rr = $r.getArray($i); $ad $gr = $g.getArray($i); $ad $br = $b.getArray($i);
         |  if ($rr == null || $gr == null || $br == null) { $ok = false; break; }
         |  int $nCols = $rr.numElements();
         |  if ($gr.numElements() != $nCols || $br.numElements() != $nCols) { $ok = false; break; }
         |  for (int $j = 0; $j < $nCols; $j++) {
         |    int $rv = $rr.getInt($j); int $gv = $gr.getInt($j); int $bv = $br.getInt($j);
         |    if ($rv != 0) { $sums[0] += $rv; $cnts[0]++; }
         |    if ($gv != 0) { $sums[1] += $gv; $cnts[1]++; }
         |    if ($bv != 0) { $sums[2] += $bv; $cnts[2]++; }
         |    int $mx = Math.max($rv, Math.max($gv, $bv));
         |    int $mn = Math.min($rv, Math.min($gv, $bv));
         |    if ($mx != 0) {
         |      $inb++;
         |      if ($mn >= ${WhiteMin}D && ($mx - $mn) <= ${WhiteSpread}D) $white++;
         |    }
         |  }
         |}
         |if ($ok) {
         |  Object[] $out = new Object[4];
         |  for (int $j = 0; $j < 3; $j++) {
         |    $out[$j] = $cnts[$j] == 0L ? null
         |      : (Object) Double.valueOf((double) $sums[$j] / $cnts[$j]);
         |  }
         |  $out[3] = $inb == 0L ? null
         |    : (Object) Double.valueOf((double) $white / $inb);
         |  ${ev.isNull} = false;
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ImageStats = copy(child = c)
  override def prettyName: String = "image_stats"
}

object ImageStats {
  val outputType: StructType = StructType(Seq(
    StructField("red_average", DoubleType),
    StructField("green_average", DoubleType),
    StructField("blue_average", DoubleType),
    StructField("white_fraction", DoubleType)))
}

/** Declarative (pure built-in) formulations of the same kernels —
  * the Catalyst-optimizable reference implementations the custom
  * expression is validated against in PixelStatsSpec. */
object PixelOps {
  import org.apache.spark.sql.functions._

  /** R3: masked mean of one channel plane (`array<array<int>>`):
    * mean over pixels != 0, null if none. */
  def maskedMean(channel: Column): Column = {
    val nz = filter(flatten(channel), (x: Column) => x =!= 0)
    when(size(nz) > 0,
      aggregate(nz, lit(0L), (acc: Column, x: Column) => acc + x).cast("double") / size(nz))
  }

  /** R4: white_fraction over a [channel][row][col] pixel cube. */
  def whiteFraction(pixels: Column): Column = {
    val r = flatten(element_at(pixels, 1))
    val g = flatten(element_at(pixels, 2))
    val b = flatten(element_at(pixels, 3))
    val rg = zip_with(r, g, (a: Column, c: Column) => struct(a.as("r"), c.as("g")))
    val px = zip_with(rg, b, (s: Column, c: Column) =>
      struct(s.getField("r").as("r"), s.getField("g").as("g"), c.as("b")))
    val mx = (s: Column) => greatest(s.getField("r"), s.getField("g"), s.getField("b"))
    val mn = (s: Column) => least(s.getField("r"), s.getField("g"), s.getField("b"))
    val inB = size(filter(px, (s: Column) => mx(s) =!= 0))
    val wh = size(filter(px, (s: Column) =>
      mx(s) =!= 0 && mn(s) >= lit(0.6 * 255) && (mx(s) - mn(s)) <= lit(0.1 * 255)))
    when(inB > 0, wh.cast("double") / inB)
  }

  /** The single-pass kernel as a Column. */
  def imageStats(pixels: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      ImageStats(org.apache.spark.sql.GraftSqlBridge.expression(pixels)))
}
