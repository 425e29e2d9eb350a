package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Single-pass vector kernels for the similarity family (q21/q22/q35).
  *
  * The HOF formulations (`aggregate(zip_with(a, b, *), 0.0, +)` and
  * the per-bit hyperplane fold) cost one interpreted lambda call per
  * element per row — 128 invocations per candidate pair, millions of
  * pairs after the LSH bucket join. These expressions run the same
  * folds as tight codegen'd loops. CRITICALLY, the summation order is
  * identical to the HOFs (ascending i, one accumulator per bit), so
  * results are BIT-EXACT: the DuckDB oracles keep their list_reduce
  * formulations and the driver's hash compare proves the equivalence
  * end-to-end. VectorOpsSpec additionally pins expression ≡ HOF
  * in-engine.
  */

/** Left-to-right dot product of two double arrays. Mirrors
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc+x)`
  * exactly, including null semantics: a null element or a length
  * mismatch (zip_with pads with null) yields null. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $b.numElements() != $n;
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Sign-bit LSH bucket over `bits` LCG-derived hyperplanes: bit j is
  * set iff Σ_i e(i)·plane(j,i) > 0, with plane(j,i) =
  * ((1103515245·(j·stride+i) + 12345) mod 2^31) / 2^31 − 0.5 — the
  * same public-LCG derivation the DuckDB oracle computes (q22/q35).
  * One pass over the array maintains all `bits` accumulators; each
  * accumulator adds in ascending i, matching the HOF fold order, so
  * buckets are bit-identical to the declarative form. A null element
  * nulls every dot (HOF semantics), making every CASE fall to 0 —
  * bucket 0. */
case class HyperplaneBucket(child: Expression, bits: Int, stride: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val e = v.asInstanceOf[ArrayData]
    val n = e.numElements()
    val acc = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (e.isNullAt(i)) return 0 // null element → every dot null → all bits 0
      val x = e.getDouble(i)
      var j = 0
      while (j < bits) {
        val h = (1103515245L * (j.toLong * stride + i) + 12345L) % 2147483648L
        acc(j) += x * (h.toDouble / 2147483648.0 - 0.5)
        j += 1
      }
      i += 1
    }
    var bucket = 0
    var j = 0
    while (j < bits) {
      if (acc(j) > 0) bucket |= 1 << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val nullEl = ctx.freshName("nullEl")
      s"""
         |int $n = $e.numElements();
         |double[] $acc = new double[$bits];
         |boolean $nullEl = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($e.isNullAt($i)) { $nullEl = true; break; }
         |  double $x = $e.getDouble($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    long $h = (1103515245L * ((long) $j * $stride + $i) + 12345L) % 2147483648L;
         |    $acc[$j] += $x * ((double) $h / 2147483648.0D - 0.5D);
         |  }
         |}
         |int $bucket = 0;
         |if (!$nullEl) {
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ($acc[$j] > 0.0D) $bucket |= 1 << $j;
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
    copy(child = c)
  override def prettyName: String = "hyperplane_bucket"
}

/** IVF coarse-quantizer assignment: the id of the centroid with the
  * highest cosine similarity to the row's vector (q44). Centroids are
  * driver-resident by design — that is what an IVF index IS (nlist ≈
  * √n; at 100 TB ~1e5 centroids × 64 dims × 8 B ≈ 50 MB, broadcast
  * territory) — and the whole corpus assignment is a narrow map stage:
  * no shuffle, no per-vector join against the centroid table.
  *
  * FP-parity contract with the DuckDB oracle (which computes the same
  * argmax relationally with `row_number() OVER (ORDER BY sim DESC,
  * c_id)`): dots fold ascending i; sim = dot / (nrm · cnrm); strict
  * `>` while scanning centroids in ascending-id order keeps the
  * LOWEST id on exact ties — exactly the window's tie-break. Inputs
  * must be non-zero vectors (a zero norm makes sim NaN, whose sort
  * position is engine-specific; the fixture guarantees this and
  * IvfSpec asserts it).
  */
case class NearestCell(
    left: Expression,
    right: Expression,
    centIds: Array[Long],
    centVecs: Array[Array[Double]],
    centNrms: Array[Double])
    extends BinaryExpression {

  require(centIds.nonEmpty && centIds.length == centVecs.length &&
    centIds.length == centNrms.length, "centroid arrays must align and be non-empty")

  // Array fields get reference equality from the synthesized case-class
  // equals, so two semantically identical NearestCells would never
  // compare equal — defeating plan canonicalization (exchange reuse,
  // cached-plan lookup). Deep-compare the quantizer instead; the hash
  // folds in only the ids (cheap, and id-set equality is the
  // discriminating part of a quantizer in practice).
  override def equals(other: Any): Boolean = other match {
    case n: NearestCell =>
      left == n.left && right == n.right &&
        java.util.Arrays.equals(centIds, n.centIds) &&
        java.util.Arrays.equals(centNrms, n.centNrms) &&
        centVecs.length == n.centVecs.length &&
        centVecs.indices.forall(i => java.util.Arrays.equals(centVecs(i), n.centVecs(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right,
      Integer.valueOf(java.util.Arrays.hashCode(centIds)))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val e = l.asInstanceOf[ArrayData]
    val nrm = r.asInstanceOf[Double]
    val n = e.numElements()
    var bestSim = Double.NegativeInfinity
    var bestId = centIds(0)
    var j = 0
    while (j < centIds.length) {
      val cv = centVecs(j)
      if (cv.length != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (e.isNullAt(i)) return null
        acc += e.getDouble(i) * cv(i)
        i += 1
      }
      val sim = acc / (nrm * centNrms(j))
      if (sim > bestSim) { bestSim = sim; bestId = centIds(j) }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
    val vecs = ctx.addReferenceObj("centVecs", centVecs, "double[][]")
    val nrms = ctx.addReferenceObj("centNrms", centNrms, "double[]")
    nullSafeCodeGen(ctx, ev, (e, nrm) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val sim = ctx.freshName("sim")
      val cv = ctx.freshName("cv")
      val bestSim = ctx.freshName("bestSim")
      val bestId = ctx.freshName("bestId")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $e.numElements();
         |double $bestSim = Double.NEGATIVE_INFINITY;
         |long $bestId = $ids[0];
         |boolean $bad = false;
         |for (int $j = 0; $j < $ids.length && !$bad; $j++) {
         |  double[] $cv = $vecs[$j];
         |  if ($cv.length != $n) { $bad = true; break; }
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($e.isNullAt($i)) { $bad = true; break; }
         |    $acc += $e.getDouble($i) * $cv[$i];
         |  }
         |  if ($bad) break;
         |  double $sim = $acc / ($nrm * $nrms[$j]);
         |  if ($sim > $bestSim) { $bestSim = $sim; $bestId = $ids[$j]; }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $bestId; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCell =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_cell"
}

/** PCA projection kernel: rank-r matrix-vector product against a
  * driver-resident (means, basis) model — r·d multiplies per row as
  * one tight loop instead of r·d interpreted lambda calls (the
  * aggregate-over-zip_with-per-basis-row HOF ladder). Accepts
  * array<float> (the fixture embedding schema — widened exactly) or
  * array<double>. Null on length mismatch or null element, the
  * [[DotProduct]] precedent. Fold order is ascending i per component,
  * so results are bit-identical to the HOF form (ClusteringSpec pins
  * it). */
case class MatVecCentered(
    child: Expression,
    means: Array[Double],
    basis: Array[Array[Double]])
    extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, FloatType}

  require(basis.forall(_.length == means.length),
    "every basis row must have the means' dimensionality")

  // deep equality for the array fields — the NearestCell plan-
  // canonicalization lesson
  override def equals(other: Any): Boolean = other match {
    case m: MatVecCentered =>
      child == m.child && java.util.Arrays.equals(means, m.means) &&
        basis.length == m.basis.length &&
        basis.indices.forall(i => java.util.Arrays.equals(basis(i), m.basis(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(means)),
      Integer.valueOf(basis.length))

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != means.length) return null
    val cx = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val dv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      cx(i) = dv - means(i)
      i += 1
    }
    val out = new Array[Double](basis.length)
    var c = 0
    while (c < basis.length) {
      val bv = basis(c)
      var acc = 0.0
      i = 0
      while (i < n) { acc += cx(i) * bv(i); i += 1 }
      out(c) = acc
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meansRef = ctx.addReferenceObj("means", means, "double[]")
    val basisRef = ctx.addReferenceObj("basis", basis, "double[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val cx = ctx.freshName("cx")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val bv = ctx.freshName("bv")
      val bad = ctx.freshName("bad")
      val get = if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |boolean $bad = $n != $meansRef.length;
         |double[] $cx = $bad ? null : new double[$n];
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { $bad = true; break; }
         |  $cx[$i] = $get - $meansRef[$i];
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else {
         |  double[] $out = new double[$basisRef.length];
         |  for (int $c = 0; $c < $basisRef.length; $c++) {
         |    double[] $bv = $basisRef[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $acc += $cx[$i] * $bv[$i]; }
         |    $out[$c] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MatVecCentered =
    copy(child = c)
  override def prettyName: String = "mat_vec_centered"
}

/** Feature-hashing embedder (the "hashing trick" of the public
  * literature): maps a bag of token hashes to a dense `dim`-vector by
  * summing one deterministic LCG-derived unit pattern per token —
  * v(j) = Σ_h lcgUnit(h·dim + j), lcgUnit(x) = ((1103515245·x +
  * 12345) wrap-mod 2³¹)/2³¹ − 0.5. Documents sharing tokens get
  * correlated vectors (cosine ≈ bag overlap under random projection),
  * which is exactly what a cheap 100 TB near-dup/retrieval pass
  * needs — no model, no network, one codegen'd scan per row.
  *
  * Arithmetic note: 1103515245·(h·dim+j) intentionally WRAPS in
  * 64-bit (Java semantics) before the 2³¹ mod — deterministic and
  * identical across partitions/executors, but not oracle-portable
  * (DuckDB raises on bigint overflow), so the embedder is a library
  * capability with spec coverage, not an oracle-checked query.
  * Summation folds ascending i — one accumulator per dimension. */
case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {
  import org.apache.spark.sql.types._

  require(dim >= 1, "embedding dim must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val acc = new Array[Double](dim)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i)
      var j = 0
      while (j < dim) {
        val x = 1103515245L * (h * dim + j) + 12345L // wraps: see scaladoc
        val m = ((x % 2147483648L) + 2147483648L) % 2147483648L
        acc(j) += m.toDouble / 2147483648.0 - 0.5
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val x = ctx.freshName("x"); val m = ctx.freshName("m")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $hs.numElements();
         |double[] $acc = new double[$dim];
         |boolean $bad = false;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($hs.isNullAt($i)) { $bad = true; break; }
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < $dim; $j++) {
         |    long $x = 1103515245L * ($h * $dim + $j) + 12345L;
         |    long $m = (($x % 2147483648L) + 2147483648L) % 2147483648L;
         |    $acc[$j] += (double) $m / 2147483648.0D - 0.5D;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HashEmbed = copy(child = c)
  override def prettyName: String = "hash_embed"
}

/** Per-element integer quantization of a double array: element x →
  * floor(x·scale), emitted as DOUBLE so the result feeds [[DotProduct]]
  * directly. The point is CROSS-ENGINE EXACT similarity arithmetic
  * (q96): quantized elements are integers, so dot products and norms
  * over them are exact integer values carried in doubles (|x|·scale up
  * to ~2²³ ⇒ 64-dim dot ≤ 2⁵² < 2⁵³, below the double mantissa), and
  * the downstream sqrt/divide/floor are correctly-rounded IEEE ops on
  * IDENTICAL inputs in both engines — so floor(1e6·sim) hash-matches
  * where raw float cosine cannot (sum order varies). Same role as
  * [[graft.functions.ImageHash]]'s floor(x·1024) leg, exposed as a
  * general kernel. */
case class QuantizeVec(child: Expression, scale: Long) extends UnaryExpression {
  import org.apache.spark.sql.types._

  require(scale >= 1, "scale must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = math.floor(a.getDouble(i) * scale)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  $out[$i] = java.lang.Math.floor($a.getDouble($i) * ${scale}L);
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QuantizeVec = copy(child = c)
  override def prettyName: String = "quantize_vec"
}

/** Product-quantization encoder: splits the input vector into
  * `m = codebooks.length` contiguous subspaces of `dsub =
  * codebooks(0)(0).length` dims and emits, per subspace, the index of
  * the L2-nearest codeword (`<` while scanning ascending keeps the
  * LOWEST index on exact ties — deterministic). Returns array<int>
  * of length m: the 100 TB storage form (m bytes-worth of codes vs
  * 4·d float bytes; 32× for 64-dim float32 at m=8).
  *
  * One codegen'd pass: m·k·dsub multiply-adds per row, no lambda, no
  * shuffle. A null element or a length mismatch yields null (the
  * DotProduct contract). Codebooks are plan-time literals (the
  * NearestCell precedent) with deep equality so canonicalization
  * still works.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty) &&
    codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
    "codebooks must be a non-empty m x k x dsub array")

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val dsub = codebooks(0)(0).length

  override def equals(other: Any): Boolean = other match {
    case p: PqEncode =>
      child == p.child && m == p.m && k == p.k && dsub == p.dsub &&
        codebooks.indices.forall(j => codebooks(j).indices.forall(c =>
          java.util.Arrays.equals(codebooks(j)(c), p.codebooks(j)(c))))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m), Integer.valueOf(k),
      Integer.valueOf(dsub))

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    if (e.numElements() != m * dsub) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        val cw = codebooks(j)(c)
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          if (e.isNullAt(j * dsub + d)) return null
          val diff = e.getDouble(j * dsub + d) - cw(d)
          acc += diff * diff
          d += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, e => {
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val acc = ctx.freshName("acc"); val diff = ctx.freshName("diff")
      s"""
         |boolean $bad = $e.numElements() != ${m * dsub};
         |int[] $out = new int[$m];
         |for (int $j = 0; !$bad && $j < $m; $j++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; !$bad && $c < $k; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      if ($e.isNullAt($j * $dsub + $d)) { $bad = true; break; }
         |      double $diff = $e.getDouble($j * $dsub + $d) - $cb[$j][$c][$d];
         |      $acc += $diff * $diff;
         |    }
         |    if (!$bad && $acc < $best) { $best = $acc; $bestC = $c; }
         |  }
         |  $out[$j] = $bestC;
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** Asymmetric-distance (ADC) lookup: approximate squared L2 between a
  * query and a PQ-coded vector as Σ_j table[j·k + codes(j)], where
  * `table` is the query's flattened m×k matrix of exact
  * subspace-to-codeword distances. 8 array reads + adds per pair —
  * the PQ-scan inner loop that replaces a d-dim float walk.
  * Ascending-j accumulation keeps the sum deterministic. */
case class AdcScore(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val table = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (table.numElements() != m * k) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= k || table.isNullAt(j * k + c)) return null
      acc += table.getDouble(j * k + c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $codes.numElements();
         |boolean $bad = $table.numElements() != $m * $k;
         |double $acc = 0.0;
         |for (int $j = 0; !$bad && $j < $m; $j++) {
         |  if ($codes.isNullAt($j)) { $bad = true; break; }
         |  int $c = $codes.getInt($j);
         |  if ($c < 0 || $c >= $k || $table.isNullAt($j * $k + $c)) { $bad = true; break; }
         |  $acc += $table.getDouble($j * $k + $c);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
  override def prettyName: String = "adc_score"
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** y[c] = Σᵢ (x[i] − means[i]) · basis[c][i] — the PCA
    * projection's matrix-vector product as one codegen'd scan
    * (means/basis ride as reference objects, the NearestCell model
    * pattern). Pass all-zero `means` for the UNcentered rotation
    * (the ANN leg). Ascending-i fold per component — bit-identical
    * to the aggregate(zip_with(...)) HOF ladder it replaces. */
  def matVecCentered(x: Column, means: Array[Double],
      basis: Array[Array[Double]]): Column =
    GraftSqlBridge.column(MatVecCentered(
      GraftSqlBridge.expression(x), means, basis))

  def hyperplaneBucket(e: Column, bits: Int, stride: Int): Column =
    GraftSqlBridge.column(HyperplaneBucket(GraftSqlBridge.expression(e), bits, stride))

  def hashEmbed(hashes: Column, dim: Int): Column =
    GraftSqlBridge.column(HashEmbed(GraftSqlBridge.expression(hashes), dim))

  def quantizeVec(e: Column, scale: Long): Column =
    GraftSqlBridge.column(QuantizeVec(GraftSqlBridge.expression(e), scale))

  /** `cents` = (id, vector, norm) in ascending-id order (the tie-break
    * contract of [[NearestCell]]). */
  def nearestCell(e: Column, nrm: Column, cents: Seq[(Long, Array[Double], Double)]): Column =
    GraftSqlBridge.column(NearestCell(
      GraftSqlBridge.expression(e), GraftSqlBridge.expression(nrm),
      cents.map(_._1).toArray, cents.map(_._2).toArray, cents.map(_._3).toArray))

  def pqEncode(e: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(e), codebooks))

  def adcScore(codes: Column, table: Column, k: Int): Column =
    GraftSqlBridge.column(AdcScore(
      GraftSqlBridge.expression(codes), GraftSqlBridge.expression(table), k))
}
