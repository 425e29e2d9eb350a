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

/** Single-pass per-token class statistics over an ALREADY-tokenized
  * array<string> column — the codegen'd engine form of q45's per-class
  * HOF scans (`size(filter(tk, t -> ascii(t) BETWEEN …))` ×3 plus the
  * `aggregate(tk, 0, (a,t) -> a + length(t))` length fold — five
  * interpreted walks of the token array become one).
  *
  * Semantics pinned to the HOF spec (TextAnalysisSpec proves ≡):
  *  - class of a token = codepoint of its FIRST character (ascii()):
  *    alpha [65,90]∪[97,122], num [48,57], sym otherwise (empty
  *    string → ascii 0 → sym, as in the HOF);
  *  - a null token is dropped by every filter (lambda yields null) but
  *    nulls the aggregate's accumulator — so n_token_chars is null iff
  *    any token is null, exactly like the HOF fold;
  *  - lengths are codepoint counts (`length()` semantics).
  *
  * Output: struct(n_alpha, n_num, n_sym bigint, n_token_chars bigint?).
  */
case class TokenClassStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_alpha", LongType),
    StructField("n_num", LongType),
    StructField("n_sym", LongType),
    StructField("n_token_chars", LongType)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_class_stats requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val ts = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = ts.numElements()
    var alpha = 0L; var num = 0L; var sym = 0L; var chars = 0L
    var charsNull = false
    var i = 0
    while (i < n) {
      if (ts.isNullAt(i)) {
        charsNull = true // null token nulls the length fold, filters skip it
      } else {
        val t = ts.getUTF8String(i)
        val c = if (t.numChars() == 0) 0 else TokenClassStats.firstCodePoint(t)
        if ((c >= 65 && c <= 90) || (c >= 97 && c <= 122)) alpha += 1
        else if (c >= 48 && c <= 57) num += 1
        else sym += 1
        chars += t.numChars()
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](alpha, num, sym,
      if (charsNull) null else chars))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ts => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val alpha = ctx.freshName("alpha"); val num = ctx.freshName("num")
      val sym = ctx.freshName("sym"); val chars = ctx.freshName("chars")
      val charsNull = ctx.freshName("charsNull")
      val t = ctx.freshName("t"); val c = ctx.freshName("c")
      s"""
         |int $n = $ts.numElements();
         |long $alpha = 0L; long $num = 0L; long $sym = 0L; long $chars = 0L;
         |boolean $charsNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($ts.isNullAt($i)) {
         |    $charsNull = true;
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $t = $ts.getUTF8String($i);
         |    int $c = $t.numChars() == 0 ? 0
         |      : graft.functions.TokenClassStats.firstCodePoint($t);
         |    if (($c >= 65 && $c <= 90) || ($c >= 97 && $c <= 122)) $alpha++;
         |    else if ($c >= 48 && $c <= 57) $num++;
         |    else $sym++;
         |    $chars += $t.numChars();
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { Long.valueOf($alpha), Long.valueOf($num), Long.valueOf($sym),
         |    $charsNull ? null : (Object) Long.valueOf($chars) });
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TokenClassStats = copy(child = c)
  override def prettyName: String = "token_class_stats"
}

object TokenClassStats {
  /** Codepoint of the first character (ascii() semantics): the first
    * byte when ASCII, else the decoded codepoint. */
  def firstCodePoint(s: UTF8String): Int = {
    val b0 = s.getByte(0) & 0xff
    if (b0 < 0x80) b0 else s.toString.codePointAt(0)
  }
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
