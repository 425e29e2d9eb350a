package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial string hash — the shared hashing contract
  * of the text-dedup/fingerprint operators (SURVEY §7.1 M6):
  *
  *   h = fold(0; h, c → (h * 31 + c) mod 1_000_000_007) over bytes
  *
  * Chosen over Spark's murmur `hash()` because the DuckDB oracle must
  * compute the IDENTICAL value with portable SQL
  * (`list_reduce(list_prepend(0, list_transform(generate_series(1,
  * length(s)), i -> ascii(substr(s,i,1)))), (h,c) -> (h*31+c) %
  * 1000000007)`). Byte fold ≡ code-point fold on ASCII input (the
  * fixture corpus is ASCII; the contract is documented as
  * ASCII-exact).
  *
  * Implemented as a native Catalyst expression WITH `doGenCode` so the
  * hot dedup path stays inside whole-stage codegen — no UDF
  * serialization, no boxing. `PolyHashSpec` proves it equal to the
  * pure-built-in HOF formulation.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash requires a string argument, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % PolyHash.Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xFF)) % ${PolyHash.Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
  override def prettyName: String = "polyhash"
}

object PolyHash {
  val Mod = 1000000007L
}

/** Single-pass rolling-hash document fingerprint (the optimized form
  * of the q25 kernel): computes min(polyhash(gram)) over all k-char
  * grams AND min over the h ≡ 0 (mod 8) winnowing sample in ONE scan
  * of the string — no gram array materialization, no per-gram lambda
  * invocation (the HOF formulation costs one closure call per gram;
  * at 100 TB that's the difference between scan-bound and
  * interpreter-bound).
  *
  * Rolling update in the same modular field as PolyHash:
  *   h' = ((h − c_out·31^(k−1)) mod P)·31 + c_in  (mod P)
  * so every gram hash is EXACTLY the PolyHash of its substring —
  * equivalence pinned in TextAnalysisSpec.
  *
  * Output: struct(n_grams int, fp_min bigint, fp_sel bigint?) —
  * null when length(s) < k / no gram hits the sample. */
case class GramFingerprint(child: Expression, k: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType),
    StructField("fp_min", LongType),
    StructField("fp_sel", LongType)))
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return null
    val P = PolyHash.Mod
    // 31^(k-1) mod P
    var pow = 1L
    var t = 0
    while (t < k - 1) { pow = pow * 31L % P; t += 1 }
    // initial gram
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 31L + (bytes(i) & 0xff)) % P; i += 1 }
    var fpMin = h
    var fpSel = if (h % 8 == 0) h else Long.MaxValue
    // roll
    i = k
    while (i < n) {
      val out = (bytes(i - k) & 0xff).toLong
      h = (((h - out * pow % P) % P + P) % P * 31L + (bytes(i) & 0xff)) % P
      if (h < fpMin) fpMin = h
      if (h % 8 == 0 && h < fpSel) fpSel = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      n - k + 1, fpMin, if (fpSel == Long.MaxValue) null else fpSel))
  }

  /** The same rolling scan emitted as Java (mirrors nullSafeEval
    * statement-for-statement; TextAnalysisSpec pins gram hashes to
    * PolyHash of the substrings, which exercises this path through
    * the codegen'd q25 plan). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b"); val n = ctx.freshName("n")
      val pow = ctx.freshName("pow"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      val fpMin = ctx.freshName("fpMin"); val fpSel = ctx.freshName("fpSel")
      val outv = ctx.freshName("outv")
      val P = s"${PolyHash.Mod}L"
      s"""
         |${ev.isNull} = true;
         |byte[] $b = $c.getBytes();
         |int $n = $b.length;
         |if ($n >= $k) {
         |  long $pow = 1L;
         |  for (int $t = 0; $t < $k - 1; $t++) { $pow = $pow * 31L % $P; }
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) { $h = ($h * 31L + ($b[$i] & 0xFF)) % $P; }
         |  long $fpMin = $h;
         |  long $fpSel = ($h % 8L == 0L) ? $h : Long.MAX_VALUE;
         |  for (int $i = $k; $i < $n; $i++) {
         |    long $outv = (long) ($b[$i - $k] & 0xFF);
         |    $h = ((($h - $outv * $pow % $P) % $P + $P) % $P * 31L + ($b[$i] & 0xFF)) % $P;
         |    if ($h < $fpMin) $fpMin = $h;
         |    if ($h % 8L == 0L && $h < $fpSel) $fpSel = $h;
         |  }
         |  ${ev.isNull} = false;
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] {
         |      Integer.valueOf($n - $k + 1),
         |      Long.valueOf($fpMin),
         |      $fpSel == Long.MAX_VALUE ? null : (Object) Long.valueOf($fpSel) });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): GramFingerprint = copy(child = c)
  override def prettyName: String = "gram_fingerprint"
}

/** q86's rolling anchor scan: ALL k-char-gram polyhashes with
  * h ≡ 0 (mod p), in scan order, from ONE pass over the string —
  * the [[GramFingerprint]] recurrence
  *   h' = ((h − c_out·31^(k−1)) mod P)·31 + c_in  (mod P)
  * so every emitted hash is EXACTLY the PolyHash of its gram
  * substring (DedupSpec pins kernel ≡ the substring+polyhash explode
  * form). Replaces the O(n·k) rehash-per-position plan with O(n), and
  * emits only the 1/p sample — the explode downstream generates
  * anchors, never positions.
  *
  * WINDOW-UNIT CONTRACT: k counts UTF-8 BYTES (PolyHash hashes
  * bytes, so only byte windows keep "emitted hash = PolyHash of the
  * window" exact). On ASCII text byte windows ≡ char windows, which
  * is the corpus contract the char-windowed oracles rely on; on
  * multibyte text the kernel is still well-defined and
  * shift-invariant over byte windows (DedupSpec pins it), but
  * char-windowed references diverge by design. Callers must gate
  * admission on octet_length, not length. Returns null below k
  * BYTES; an anchor-free doc returns the empty array (explodes to
  * nothing, like the positional form). */
case class WinnowAnchors(child: Expression, k: Int, p: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return null
    val P = PolyHash.Mod
    var pow = 1L
    var t = 0
    while (t < k - 1) { pow = pow * 31L % P; t += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * 31L + (bytes(i) & 0xff)) % P; i += 1 }
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    if (h % p == 0) out += h
    i = k
    while (i < n) {
      val c = (bytes(i - k) & 0xff).toLong
      h = (((h - c * pow % P) % P + P) % P * 31L + (bytes(i) & 0xff)) % P
      if (h % p == 0) out += h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b"); val n = ctx.freshName("n")
      val pow = ctx.freshName("pow"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      val acc = ctx.freshName("acc"); val cnt = ctx.freshName("cnt")
      val outv = ctx.freshName("outv"); val arr = ctx.freshName("arr")
      val P = s"${PolyHash.Mod}L"
      s"""
         |${ev.isNull} = true;
         |byte[] $b = $c.getBytes();
         |int $n = $b.length;
         |if ($n >= $k) {
         |  long $pow = 1L;
         |  for (int $t = 0; $t < $k - 1; $t++) { $pow = $pow * 31L % $P; }
         |  long[] $acc = new long[$n - $k + 1];
         |  int $cnt = 0;
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) { $h = ($h * 31L + ($b[$i] & 0xFF)) % $P; }
         |  if ($h % ${p}L == 0L) { $acc[$cnt++] = $h; }
         |  for (int $i = $k; $i < $n; $i++) {
         |    long $outv = (long) ($b[$i - $k] & 0xFF);
         |    $h = ((($h - $outv * $pow % $P) % $P + $P) % $P * 31L + ($b[$i] & 0xFF)) % $P;
         |    if ($h % ${p}L == 0L) { $acc[$cnt++] = $h; }
         |  }
         |  long[] $arr = new long[$cnt];
         |  System.arraycopy($acc, 0, $arr, 0, $cnt);
         |  ${ev.isNull} = false;
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WinnowAnchors = copy(child = c)
  override def prettyName: String = "winnow_anchors"
}

/** Single-pass SimHash over a pre-hashed token array (optimized form
  * of the q20 kernel): one scan of the hashes maintains all `bits`
  * counters — the HOF formulation re-walks the token array once per
  * bit (30×). Bit j of token hash h votes ±1 via (h >> j) & 1; bit j
  * of the result is set iff the vote sum is positive. Identical to
  * the nested-aggregate spec for non-negative h (pinned in
  * DedupSpec). */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |int[] $votes = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($votes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
  override def prettyName: String = "simhash"
}

/** Single-pass word n-gram hasher (optimized form of the q18/q19
  * shingle and q52 decontamination kernels): for a token array t,
  * emits polyhash(concat_ws(' ', t[i], …, t[i+n-1])) for every window
  * i — WITHOUT materializing the gram strings and WITHOUT the
  * interpreted per-gram HOF lambda (`transform(sequence…, i ->
  * polyhash(concat_ws(…)))` walks a ~10-node expression tree per gram
  * per row; this folds token bytes directly into the modular hash).
  * Each element is EXACTLY the PolyHash of the joined gram string —
  * including concat_ws's skip-null semantics (a null token contributes
  * neither bytes nor a separator) — pinned ≡ the HOF form in
  * DedupSpec. Returns an empty array when size(t) < n (the HOF form
  * is undefined there: `sequence(1, size-n+1)` runs DESCENDING when
  * size < n — callers filter first; the kernel makes the edge total).
  */
case class WordNGramHashes(child: Expression, n: Int, step: Int = 1)
    extends UnaryExpression {
  import org.apache.spark.sql.types._

  require(n >= 1, "gram size must be >= 1")
  require(step >= 1, "step must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val ts = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = ts.numElements()
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val P = PolyHash.Mod
    val out = new Array[Long]((m - n) / step + 1)
    var w = 0
    while (w < out.length) {
      val i = w * step
      var h = 0L
      var emitted = false
      var j = 0
      while (j < n) {
        if (!ts.isNullAt(i + j)) {
          if (emitted) h = (h * 31L + 0x20L) % P
          val bytes = ts.getUTF8String(i + j).getBytes
          var b = 0
          while (b < bytes.length) {
            h = (h * 31L + (bytes(b) & 0xff)) % P
            b += 1
          }
          emitted = true
        }
        j += 1
      }
      out(w) = h
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ts => {
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val w = ctx.freshName("w"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val bytes = ctx.freshName("bytes"); val emitted = ctx.freshName("emitted")
      val P = s"${PolyHash.Mod}L"
      s"""
         |int $m = $ts.numElements();
         |long[] $out = new long[$m < $n ? 0 : ($m - $n) / $step + 1];
         |for (int $w = 0; $w < $out.length; $w++) {
         |  int $i = $w * $step;
         |  long $h = 0L;
         |  boolean $emitted = false;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$ts.isNullAt($i + $j)) {
         |      if ($emitted) $h = ($h * 31L + 0x20L) % $P;
         |      byte[] $bytes = $ts.getUTF8String($i + $j).getBytes();
         |      for (int $b = 0; $b < $bytes.length; $b++) {
         |        $h = ($h * 31L + ($bytes[$b] & 0xFF)) % $P;
         |      }
         |      $emitted = true;
         |    }
         |  }
         |  $out[$w] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WordNGramHashes = copy(child = c)
  override def prettyName: String = "word_ngram_hashes"
}

/** Single-pass K-permutation MinHash signature (optimized form of the
  * q18 kernel): one scan of the hashed-shingle array maintains all K
  * minima — the HOF formulation (`transform(sequence(0, K-1), k ->
  * array_min(transform(hh, h -> ((2k+1)·h + 7919k) mod P)))`) re-walks
  * the array K times through interpreted lambdas. Identical values:
  * min is order-independent and (2k+1)·h + 7919k ≤ ~2.5e10 fits a
  * long, so the arithmetic is exact on both paths (pinned ≡ in
  * DedupSpec). Empty input → null (the HOF yields an array of null
  * mins; neither shape can produce a band key that joins, and the
  * operators filter empty docs upstream — divergence documented, not
  * load-bearing). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  import org.apache.spark.sql.types._

  require(k >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val P = PolyHash.Mod
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val hv = ((2L * j + 1L) * h + 7919L * j) % P
        if (hv < mins(j)) mins(j) = hv
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val hv = ctx.freshName("hv")
      val P = s"${PolyHash.Mod}L"
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $hv = ((2L * $j + 1L) * $h + 7919L * $j) % $P;
         |      if ($hv < $mins[$j]) $mins[$j] = $hv;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Session-level registration so `polyhash(...)` is usable inside SQL
  * higher-order-function lambdas (transform/aggregate), where Column
  * composition can't reach. Idempotent per session. */
object TextHash {
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftSqlBridge.registerTempFunction(
      spark, "polyhash", exprs => PolyHash(exprs.head))

  /** Column form of [[MinHashSig]]. */
  def minhashSig(hh: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinHashSig(org.apache.spark.sql.GraftSqlBridge.expression(hh), k))

  /** Column form of [[PolyHash]]. */
  def polyhash(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PolyHash(org.apache.spark.sql.GraftSqlBridge.expression(s)))

  /** Column form of [[WinnowAnchors]]. */
  def winnowAnchors(s: org.apache.spark.sql.Column, k: Int, p: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      WinnowAnchors(org.apache.spark.sql.GraftSqlBridge.expression(s), k, p))

  /** Column form of [[WordNGramHashes]]: polyhashes of the word
    * n-grams of a token-array column, window start advancing by
    * `step` (1 = every window; q55 chunks use step = stride so the
    * kernel never hashes windows the chunker would drop). */
  def wordNGramHashes(tokens: org.apache.spark.sql.Column, n: Int,
      step: Int = 1): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      WordNGramHashes(org.apache.spark.sql.GraftSqlBridge.expression(tokens), n, step))

  /** The equivalent pure-built-in formula (the contract the DuckDB
    * oracle mirrors); used by PolyHashSpec to pin semantics. */
  val hofFormulaSql: String =
    """aggregate(
      |  transform(sequence(1, length(%s)), i -> CAST(ascii(substring(%s, i, 1)) AS BIGINT)),
      |  CAST(0 AS BIGINT),
      |  (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin
}
