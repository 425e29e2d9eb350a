package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition statistics — the Gopher-style quality
  * signals (Rae et al. 2021, "Scaling Language Models", §A.1.1:
  * documents dominated by one token or by repeated n-grams are
  * low-quality) computed in ONE scan of the raw bytes, like
  * [[TokenStats]]. The declarative formulation (distinct/filter HOF
  * chain, kept as the executable spec in TextAnalysisSpec and as the
  * DuckDB oracle) is O(types·tokens) per row AND interpreted — this
  * expression is O(tokens) and codegen'd.
  *
  * Semantics pinned to the SQL spec:
  *  - tokens = split on every single ' ' (empty tokens count, exactly
  *    like Spark's split and DuckDB's string_split);
  *  - top_count = occurrences of the most frequent DISTINCT token
  *    string (exact — a hash map over token slices, not hashes);
  *  - trigram i = tokens i..i+2. Because rejoining with single
  *    spaces exactly inverts single-space splitting, the trigram
  *    string t[i]||' '||t[i+1]||' '||t[i+2] IS the contiguous byte
  *    slice of the original text from start(i) to end(i+2) — so
  *    distinct trigrams are counted over zero-copy slices;
  *  - n_trigrams = max(n_tokens − 2, 0).
  *
  * Output: struct(n_tokens, top_count, n_trigrams, n_tri_distinct — all bigint).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType),
    StructField("top_count", LongType),
    StructField("n_trigrams", LongType),
    StructField("n_tri_distinct", LongType)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_stats requires a string argument, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val counts = new java.util.HashMap[Object, Array[Long]]()
    val tris = new java.util.HashSet[Object]()
    var nTokens = 0L
    var s2 = 0 // start of token (current − 2); valid once nTokens ≥ 2
    var s1 = 0 // start of token (current − 1); valid once nTokens ≥ 1
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
        nTokens += 1
        if (nTokens >= 3) tris.add(UTF8String.fromBytes(bytes, s2, i - s2))
        s2 = s1; s1 = start; start = i + 1
      }
      i += 1
    }
    var top = 0L
    val it = counts.values.iterator
    while (it.hasNext) { val c = it.next()(0); if (c > top) top = c }
    new GenericInternalRow(Array[Any](
      nTokens, top, math.max(nTokens - 2, 0L), tris.size.toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val counts = ctx.freshName("counts"); val tris = ctx.freshName("tris")
      val nTokens = ctx.freshName("nTokens"); val s2 = ctx.freshName("s2")
      val s1 = ctx.freshName("s1"); val start = ctx.freshName("start")
      val i = ctx.freshName("i"); val tok = ctx.freshName("tok")
      val cnt = ctx.freshName("cnt"); val top = ctx.freshName("top")
      val it = ctx.freshName("it"); val cv = ctx.freshName("cv")
      val out = ctx.freshName("out")
      s"""
         |byte[] $bytes = $c.getBytes();
         |java.util.HashMap $counts = new java.util.HashMap();
         |java.util.HashSet<Object> $tris = new java.util.HashSet<Object>();
         |long $nTokens = 0L;
         |int $s2 = 0; int $s1 = 0; int $start = 0;
         |for (int $i = 0; $i <= $bytes.length; $i++) {
         |  if ($i == $bytes.length || $bytes[$i] == 32) {
         |    Object $tok = org.apache.spark.unsafe.types.UTF8String.fromBytes($bytes, $start, $i - $start);
         |    long[] $cnt = (long[]) $counts.get($tok);
         |    if ($cnt == null) { $counts.put($tok, new long[]{1L}); } else { $cnt[0]++; }
         |    $nTokens++;
         |    if ($nTokens >= 3) {
         |      $tris.add(org.apache.spark.unsafe.types.UTF8String.fromBytes($bytes, $s2, $i - $s2));
         |    }
         |    $s2 = $s1; $s1 = $start; $start = $i + 1;
         |  }
         |}
         |long $top = 0L;
         |for (java.util.Iterator $it = $counts.values().iterator(); $it.hasNext(); ) {
         |  long $cv = ((long[]) $it.next())[0];
         |  if ($cv > $top) $top = $cv;
         |}
         |Object[] $out = new Object[4];
         |$out[0] = Long.valueOf($nTokens);
         |$out[1] = Long.valueOf($top);
         |$out[2] = Long.valueOf(Math.max($nTokens - 2L, 0L));
         |$out[3] = Long.valueOf((long) $tris.size());
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
  override def prettyName: String = "repetition_stats"
}
