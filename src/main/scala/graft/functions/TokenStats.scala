package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics — the codegen'd engine form of the
  * q23/q24 token scans (same playbook as TrigramLangScores: the
  * declarative formulation `size(filter(split(text, " "), x -> x IN
  * (...)))` is a higher-order function, which Spark evaluates
  * INTERPRETED — one closure call per token per list; this expression
  * does all of it in one scan of the raw bytes).
  *
  * Semantics pinned to the SQL spec (TextAnalysisSpec proves ≡):
  *  - tokens = split on every single ' ' (consecutive/leading/trailing
  *    spaces produce empty tokens, exactly like Spark's regex split
  *    with limit -1 and DuckDB's string_split);
  *  - n_types counts DISTINCT token strings exactly (a hash SET of
  *    token slices, not hashes — no collision miscounts);
  *  - n_chars = codepoint length (continuation bytes don't count);
  *  - counts(i) = tokens matching word-list i. List words must be
  *    ASCII and ≤ 8 bytes, so each token packs into one long and
  *    membership is a binary search; a token with non-ASCII bytes
  *    packs to a key no ASCII word can equal, and UTF-8 guarantees
  *    the ' ' byte never occurs inside a multibyte sequence, so
  *    byte-splitting IS codepoint-splitting.
  *
  * Output: struct(n_tokens, n_types, n_chars bigint, counts array<bigint>).
  */
case class TokenStats(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression {

  lists.flatten.foreach { w =>
    require(w.nonEmpty && w.length <= 8 && w.forall(_ < 128),
      s"TokenStats list words must be 1-8 ASCII chars: '$w'")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType),
    StructField("n_types", LongType),
    StructField("n_chars", LongType),
    StructField("counts", ArrayType(LongType, containsNull = false))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_stats requires a string argument, got ${child.dataType.catalogString}")
    }

  private def nLists = lists.length

  /** Sorted packed-word keys + per-key membership vector (a word may
    * sit in several lists). */
  @transient private lazy val (keys: Array[Long], flat: Array[Int]) =
    TokenStats.pack(lists)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val ks = keys
    val fl = flat
    val n = nLists
    var nTokens = 0L
    var nChars = 0L
    val counts = new Array[Long](n)
    val types = new java.util.HashSet[Object]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      val end = i == bytes.length
      val b = if (end) 0 else bytes(i)
      if (!end && (b & 0xc0) != 0x80) nChars += 1
      if (end || b == ' ') {
        val len = i - start
        nTokens += 1
        types.add(UTF8String.fromBytes(bytes, start, len))
        if (len >= 1 && len <= 8) {
          var key = 0L
          var j = start
          while (j < i) { key = (key << 8) | (bytes(j) & 0xff); j += 1 }
          var lo = 0
          var hi = ks.length - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val k = ks(mid)
            if (k == key) {
              var l = 0
              while (l < n) { counts(l) += fl(mid * n + l); l += 1 }
              lo = hi + 2
            } else if (k < key) lo = mid + 1
            else hi = mid - 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nTokens, types.size.toLong, nChars, UnsafeArrayData.fromPrimitiveArray(counts)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ksRef = ctx.addReferenceObj("tokKeys", keys, "long[]")
      val flRef = ctx.addReferenceObj("tokFlat", flat, "int[]")
      val n = nLists
      val bytes = ctx.freshName("bytes")
      val nTokens = ctx.freshName("nTokens"); val nChars = ctx.freshName("nChars")
      val counts = ctx.freshName("counts"); val types = ctx.freshName("types")
      val start = ctx.freshName("start"); val i = ctx.freshName("i")
      val endv = ctx.freshName("end"); val b = ctx.freshName("b")
      val len = ctx.freshName("len"); val key = ctx.freshName("key")
      val j = ctx.freshName("j"); val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi"); val mid = ctx.freshName("mid")
      val k = ctx.freshName("k"); val l = ctx.freshName("l")
      val out = ctx.freshName("out")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $nTokens = 0L; long $nChars = 0L;
         |long[] $counts = new long[$n];
         |java.util.HashSet<Object> $types = new java.util.HashSet<Object>();
         |int $start = 0;
         |for (int $i = 0; $i <= $bytes.length; $i++) {
         |  boolean $endv = ($i == $bytes.length);
         |  byte $b = $endv ? (byte) 0 : $bytes[$i];
         |  if (!$endv && ($b & 0xC0) != 0x80) $nChars++;
         |  if ($endv || $b == 32) {
         |    int $len = $i - $start;
         |    $nTokens++;
         |    $types.add(org.apache.spark.unsafe.types.UTF8String.fromBytes($bytes, $start, $len));
         |    if ($len >= 1 && $len <= 8) {
         |      long $key = 0L;
         |      for (int $j = $start; $j < $i; $j++) { $key = ($key << 8) | ($bytes[$j] & 0xFF); }
         |      int $lo = 0; int $hi = $ksRef.length - 1;
         |      while ($lo <= $hi) {
         |        int $mid = ($lo + $hi) >>> 1;
         |        long $k = $ksRef[$mid];
         |        if ($k == $key) {
         |          for (int $l = 0; $l < $n; $l++) $counts[$l] += $flRef[$mid * $n + $l];
         |          $lo = $hi + 2;
         |        } else if ($k < $key) $lo = $mid + 1;
         |        else $hi = $mid - 1;
         |      }
         |    }
         |    $start = $i + 1;
         |  }
         |}
         |Object[] $out = new Object[4];
         |$out[0] = Long.valueOf($nTokens);
         |$out[1] = Long.valueOf((long) $types.size());
         |$out[2] = Long.valueOf($nChars);
         |$out[3] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($counts);
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TokenStats = copy(child = c)
  override def prettyName: String = "token_stats"
}

object TokenStats {
  /** Pack word lists into a sorted key table + flat membership rows. */
  private[functions] def pack(lists: Seq[Seq[String]]): (Array[Long], Array[Int]) = {
    val n = lists.length
    val acc = scala.collection.mutable.LinkedHashMap[Long, Array[Int]]()
    lists.zipWithIndex.foreach { case (ws, li) =>
      ws.foreach { w =>
        val key = w.foldLeft(0L)((k, ch) => (k << 8) | ch.toLong)
        acc.getOrElseUpdate(key, new Array[Int](n))(li) += 1
      }
    }
    val sorted = acc.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.flatMap(_._2))
  }
}
