package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two dimension keys — the data-layout
  * primitive behind multi-dimensional file skipping: rows sorted by
  * z-value cluster BOTH dimensions into every file, so a parquet
  * min/max footer prunes 2-D box predicates where a linear sort only
  * prunes its leading column. (The same curve Delta Lake's OPTIMIZE
  * ZORDER BY and Iceberg's sort orders use; layout is a *write-side*
  * operator — the read side needs no new machinery, just the stats
  * already in every footer.)
  *
  * Inputs are pre-quantized bucket ids in [0, 2^bits); out-of-range
  * ids are clamped, nulls propagate. Bit i of each input lands at
  * output bit 2i / 2i+1 — even bits x, odd bits y, so lexicographic
  * z-value order is the standard Morton curve. One codegen'd shift
  * loop per row; no shuffle, no lookup table.
  */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  private def clamp(v: Long): Long =
    if (v < 0L) 0L else if (v > (1L << bits) - 1) (1L << bits) - 1 else v

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = clamp(l.asInstanceOf[Long])
    val y = clamp(r.asInstanceOf[Long])
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val z = ctx.freshName("z"); val i = ctx.freshName("i")
      val max = (1L << bits) - 1
      s"""
         |long $x = $l < 0L ? 0L : ($l > ${max}L ? ${max}L : $l);
         |long $y = $r < 0L ? 0L : ($r > ${max}L ? ${max}L : $r);
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValue =
    copy(left = l, right = r)
  override def prettyName: String = "z_value"
}

object ZOrder {
  def zValue(x: Column, y: Column, bits: Int): Column =
    GraftSqlBridge.column(ZValue(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(y), bits))

  /** Write-side clustering: range-partition by z-value into `nFiles`
    * output partitions and sort within each — every file then covers a
    * contiguous z-range, i.e. a tight box in BOTH dimensions, which is
    * exactly what makes its footer min/max stats selective for 2-D
    * predicates. `repartitionByRange` samples the z distribution, so
    * skewed dimension keys still yield balanced files. */
  def layoutByZ(df: org.apache.spark.sql.DataFrame, x: Column, y: Column,
      bits: Int, nFiles: Int): org.apache.spark.sql.DataFrame = {
    val withZ = df.withColumn("zv", zValue(x, y, bits))
    withZ.repartitionByRange(nFiles, org.apache.spark.sql.functions.col("zv"))
      .sortWithinPartitions(org.apache.spark.sql.functions.col("zv"))
  }
}
