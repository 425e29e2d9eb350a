package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{
  ArrayType, DataType, FloatType, IntegerType, LongType, StructField, StructType}

/** Single-pass kernels for the FIXED-POINT clustering family
  * (q124-q127, q129, the semantic gate, the two-level ladder).
  *
  * The HOF formulations — `transform(x, v -> floor(v·2^20))` for the
  * quantizer, `aggregate(zip_with(x, cv, (a,b) -> (a-b)²), 0, +)` for
  * every distance, the transform-over-centroids argmin, and q126's
  * nested transform-of-slices — are CodegenFallback lambdas costing
  * one interpreted call per ELEMENT per row: 64 per distance, k·64
  * per assignment, d²/2 per Gram row, millions of pairs after the
  * cell-blocked join. These expressions run the identical integer
  * arithmetic as tight codegen'd loops — same ascending iteration
  * order, same truncating semantics — so results are BIT-EXACT and
  * the DuckDB oracles keep their unrolled formulations
  * (ClusteringSpec pins kernel ≡ HOF; KernelDualModeSpec pins
  * doGenCode ≡ nullSafeEval).
  *
  * Null semantics follow the [[DotProduct]] precedent: a null INPUT
  * is null (nullSafeEval), and a null ELEMENT or length mismatch
  * yields null — stricter than the HOFs' element-wise null
  * propagation, identical on the non-null fixture vectors (the spec
  * equivalence is asserted on non-null data, where both definitions
  * coincide).
  */
object FixedPointOps {

  /** `transform(c, v -> CAST(floor(CAST(v AS DOUBLE) * scale) AS BIGINT))`
    * as one codegen'd scan. */
  def quantizeFixed(c: Column, scale: Long): Column =
    GraftSqlBridge.column(QuantizeFixed(GraftSqlBridge.expression(c), scale))

  /** `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, +)` as one
    * codegen'd scan. */
  def sqDistL2(a: Column, b: Column): Column =
    GraftSqlBridge.column(SqDistL2(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** `array_min(transform(cents, (cv, ci) -> struct(d2(x, cv), ci)))`
    * as one codegen'd scan: struct(dist, cid), min distance, ties to
    * the smaller cid. `cents` is a COLUMN of array<array<bigint>> —
    * a plan literal for flat models, `element_at(finesLit, ccl+1)`
    * for the two-level fine probe. */
  def nearestOfL2(x: Column, cents: Column): Column =
    GraftSqlBridge.column(NearestOfL2(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(cents)))

  /** Top-2 nearest centroids by squared L2 in ONE codegen'd scan:
    * struct(dist1, cid1, dist2, cid2) ordered by (dist, cid) — the
    * multi-probe coarse step (IVF nprobe=2) without a second pass
    * over the centroid list. Null when fewer than two centroids. */
  def nearest2OfL2(x: Column, cents: Column): Column =
    GraftSqlBridge.column(Nearest2OfL2(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(cents)))

  /** q126's pair generator — the d(d+1)/2 upper-triangle products of
    * one vector as array<struct(i, j, p)>, row-major ascending (i, j):
    * the nested transform-of-slices flattened into one codegen'd
    * double loop (no per-gram slice copies, no interpreted lambdas). */
  def upperTriProducts(x: Column): Column =
    GraftSqlBridge.column(UpperTriProducts(GraftSqlBridge.expression(x)))
}

/** Fixed-point quantizer: floor(double(v) · scale) per element.
  * float→double widening is exact; floor of an exact double is
  * deterministic on any IEEE engine (the Clustering.Scale contract). */
case class QuantizeFixed(child: Expression, scale: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  /** Accept array<float> (the fixture schema) or array<double> (the
    * widened form) — float→double widening is exact either way. */
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val dv = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = math.floor(dv * scale).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |boolean $bad = false;
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  $out[$i] = (long) java.lang.Math.floor($get * ${scale}L);
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QuantizeFixed =
    copy(child = c)
  override def prettyName: String = "quantize_fixed"
}

/** Σ(a−b)² over two bigint arrays, ascending fold — the one distance
  * every fixed-point surface shares. Null on length mismatch. */
case class SqDistL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $b.numElements() != $n;
         |long $acc = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistL2 =
    copy(left = l, right = r)
  override def prettyName: String = "sq_dist_l2"
}

/** Nearest centroid by squared L2 over a per-row centroid LIST column:
  * struct(dist, cid) with min distance, ties to the smaller cid
  * (strict `<` over ascending cid — exactly `array_min` on the
  * (dist, cid) structs). Null if the list is empty or any centroid's
  * length mismatches the vector. */
case class NearestOfL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val cents = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    val k = cents.numElements()
    if (k == 0) return null
    var bestDist = Long.MaxValue
    var bestCid = -1
    var j = 0
    while (j < k) {
      if (cents.isNullAt(j)) return null
      val cv = cents.getArray(j)
      if (cv.numElements() != n) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || cv.isNullAt(i)) return null
        val d = x.getLong(i) - cv.getLong(i)
        acc += d * d
        i += 1
      }
      if (acc < bestDist) { bestDist = acc; bestCid = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestDist, bestCid))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cents) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val cv = ctx.freshName("cv")
      val bestDist = ctx.freshName("bestDist")
      val bestCid = ctx.freshName("bestCid")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $x.numElements();
         |int $k = $cents.numElements();
         |boolean $bad = $k == 0;
         |long $bestDist = Long.MAX_VALUE;
         |int $bestCid = -1;
         |for (int $j = 0; !$bad && $j < $k; $j++) {
         |  if ($cents.isNullAt($j)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cents.getArray($j);
         |  if ($cv.numElements() != $n) { $bad = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $cv.isNullAt($i)) { $bad = true; break; }
         |    long $d = $x.getLong($i) - $cv.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if ($bad) break;
         |  if ($acc < $bestDist) { $bestDist = $acc; $bestCid = $j; }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $bestDist, $bestCid });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestOfL2 =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_of_l2"
}

/** Top-2 nearest centroids by squared L2 over a per-row centroid LIST
  * column: struct(dist1, cid1, dist2, cid2), candidates ordered by
  * (dist, cid) — strict `<` against each held slot keeps the
  * smaller cid on equal distance, exactly the first two rows of
  * `ORDER BY dist, cid` over the candidate set. Null when the list
  * has fewer than two centroids (a one-cell model has no second
  * probe) or any centroid's length mismatches the vector. */
case class Nearest2OfL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dist1", LongType, nullable = false),
    StructField("cid1", IntegerType, nullable = false),
    StructField("dist2", LongType, nullable = false),
    StructField("cid2", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val cents = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    val k = cents.numElements()
    if (k < 2) return null
    var d1 = Long.MaxValue
    var c1 = -1
    var d2 = Long.MaxValue
    var c2 = -1
    var j = 0
    while (j < k) {
      if (cents.isNullAt(j)) return null
      val cv = cents.getArray(j)
      if (cv.numElements() != n) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || cv.isNullAt(i)) return null
        val d = x.getLong(i) - cv.getLong(i)
        acc += d * d
        i += 1
      }
      if (acc < d1) { d2 = d1; c2 = c1; d1 = acc; c1 = j }
      else if (acc < d2) { d2 = acc; c2 = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](d1, c1, d2, c2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cents) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val cv = ctx.freshName("cv")
      val d1 = ctx.freshName("d1")
      val c1 = ctx.freshName("c1")
      val d2 = ctx.freshName("d2")
      val c2 = ctx.freshName("c2")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $x.numElements();
         |int $k = $cents.numElements();
         |boolean $bad = $k < 2;
         |long $d1 = Long.MAX_VALUE; int $c1 = -1;
         |long $d2 = Long.MAX_VALUE; int $c2 = -1;
         |for (int $j = 0; !$bad && $j < $k; $j++) {
         |  if ($cents.isNullAt($j)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cents.getArray($j);
         |  if ($cv.numElements() != $n) { $bad = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $cv.isNullAt($i)) { $bad = true; break; }
         |    long $d = $x.getLong($i) - $cv.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if ($bad) break;
         |  if ($acc < $d1) { $d2 = $d1; $c2 = $c1; $d1 = $acc; $c1 = $j; }
         |  else if ($acc < $d2) { $d2 = $acc; $c2 = $j; }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $d1, $c1, $d2, $c2 });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Nearest2OfL2 =
    copy(left = l, right = r)
  override def prettyName: String = "nearest2_of_l2"
}

/** All d(d+1)/2 upper-triangle products xᵢ·xⱼ (j ≥ i) of one bigint
  * vector as array<struct(i, j, p)>, row-major ascending — q126's
  * per-row expansion without the nested transform's O(d²) slice
  * copies or interpreted lambdas. Dimension-agnostic. */
case class UpperTriProducts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("p", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xi = x.getLong(i)
      var j = i
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](i, j, xi * x.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xi = ctx.freshName("xi")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $x.numElements();
         |boolean $bad = false;
         |Object[] $out = new Object[$n * ($n + 1) / 2];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { $bad = true; break; }
         |  long $xi = $x.getLong($i);
         |  for (int $j = $i; $j < $n; $j++) {
         |    $out[$k++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{ $i, $j, $xi * $x.getLong($j) });
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): UpperTriProducts =
    copy(child = c)
  override def prettyName: String = "upper_tri_products"
}
