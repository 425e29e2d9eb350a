package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** Perceptual VIDEO fingerprinting — the third multimodal dedup leg
  * (q87 images, q104 audio, q105 video). Video near-dup differs from
  * both in the FAILURE MODE it must survive: a re-uploaded video is
  * typically TRIMMED (intro/outro cut) and re-encoded, so any
  * whole-file fingerprint — q17's content hash, or a single q104-style
  * temporal envelope — shifts wholesale when frames are dropped. The
  * published copy-detection shape is therefore per-FRAME fingerprints
  * plus a FRAME-VOTE pairing: hash each (sampled) frame independently,
  * join videos on shared frame hashes, and call a pair a near-dup when
  * enough distinct frames agree ([[graft.operators.Dedup.videoNearDup]]
  * — q105). Trimming only removes votes; it cannot move the surviving
  * ones, and a few corrupted frames are outvoted.
  *
  * Two input forms:
  *  - [[GrayDHash]]: a decoded grayscale frame (luma plane bytes +
  *    width/height — [[graft.multimodal.Media.Y4mCodec]]'s per-frame
  *    output) → the same published 7×9 block-mean gradient dHash as
  *    q87's [[ImageHash]] (identical grid so the two legs share
  *    `dhash56`), integer-exact: block sums of unsigned bytes are
  *    non-negative, so truncating division equals floor. This is the
  *    REAL video leg; MediaSpec proves a trimmed + frame-noised Y4M
  *    re-encode pairs with its original through the vote.
  *  - the ORACLE-EXPRESSIBLE form needs no custom expression at all:
  *    q105 builds per-"frame" hashes from a float vector with pure
  *    built-in higher-order functions (quantize floor(x·1024), then
  *    the rolling-pair mix h_k = q_k·2^21 + pmod(q_{k+1}, 2^21) —
  *    injective on the pair, so frame-hash equality IS frame
  *    equality), plants a TRIMMED + partially-corrupted copy of every
  *    video, and the vote join must recover exactly the planted pairs.
  *    DuckDB replays the arithmetic bit-for-bit.
  *
  * The frame-vote join's scale hazard is the HUB FRAME (black frames,
  * title cards) fattening the frame-hash bucket — the same viral-key
  * exposure as q18's LSH bands, guarded the same way: a document-
  * frequency cap drops frame hashes shared by more than
  * [[graft.operators.Dedup.VideoDfCap]] videos before the self-join
  * (a frame that common carries no pairing evidence anyway).
  */
object VideoHash {
  /** q82's float→integer bridge: floor(x · 1024). */
  val Quant = 1024
  /** Rolling-pair mix modulus: h = q_k·2^21 + pmod(q_{k+1}, 2^21) —
    * injective on (q_k, q_{k+1} mod 2^21), so hash equality is frame
    * equality up to a 1-in-2^21 aliasing of the second component. */
  val PairMod: Long = 1L << 21
  /** Planted copy drops this many leading frames (the trimmed intro). */
  val Trim = 3
  /** Planted copy corrupts every 7th frame (phase 3) by +1 — the
    * "re-encode damaged a few fingerprints" leg the vote must absorb. */
  val CorruptEvery = 7
  val CorruptPhase = 3
  /** Minimum vector length for the oracled leg (videos shorter than
    * this can't clear the vote threshold and are filtered up front). */
  val MinDims = 32

  // Same 7×9 grid as ImageHash so both legs share dhash56's packing.
  private val GridRows = ImageHash.GridRows
  private val GridCols = ImageHash.GridCols

  /** Gray-frame dHash worker (interpreted eval AND generated code):
    * w×h luma bytes → 7×9 block means (unsigned bytes, sums
    * non-negative, so `/` is floor) → 56 gradient bits. Long.MinValue
    * when the frame is smaller than the grid or the payload is short
    * (caller maps it to SQL null). */
  def grayDhashOrMin(payload: Array[Byte], w: Int, h: Int): Long = {
    if (w < GridCols || h < GridRows || payload.length < w.toLong * h) return Long.MinValue
    val g = new Array[Long](GridRows * GridCols)
    var r = 0
    while (r < GridRows) {
      val rs = h.toLong * r / GridRows
      val re = h.toLong * (r + 1) / GridRows
      var c = 0
      while (c < GridCols) {
        val cs = w.toLong * c / GridCols
        val ce = w.toLong * (c + 1) / GridCols
        var sum = 0L
        var y = rs
        while (y < re) {
          val row = y * w
          var x = cs
          while (x < ce) {
            sum += payload((row + x).toInt) & 0xff
            x += 1
          }
          y += 1
        }
        g(r * GridCols + c) = sum / ((re - rs) * (ce - cs))
        c += 1
      }
      r += 1
    }
    ImageHash.dhash56(g)
  }

  /** Column form of [[GrayDHash]]. */
  def grayDhash(payload: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      GrayDHash(org.apache.spark.sql.GraftSqlBridge.expression(payload),
        org.apache.spark.sql.GraftSqlBridge.expression(w),
        org.apache.spark.sql.GraftSqlBridge.expression(h)))
}

/** 56-bit dHash of a grayscale frame (luma bytes + dims — see
  * [[VideoHash]]). Null when the frame is smaller than the 7×9 grid. */
case class GrayDHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gray_dhash requires (binary, int, int), got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def nullSafeEval(p: Any, w: Any, h: Any): Any = {
    val v = VideoHash.grayDhashOrMin(
      p.asInstanceOf[Array[Byte]], w.asInstanceOf[Int], h.asInstanceOf[Int])
    if (v == Long.MinValue) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, w, h) => {
      val tmp = ctx.freshName("gdh")
      s"""
         |long $tmp = graft.functions.VideoHash.grayDhashOrMin($p, $w, $h);
         |if ($tmp == Long.MIN_VALUE) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GrayDHash =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "gray_dhash"
}
