package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Language-profile data for the char-trigram classifier (q43).
  * Rank-weighted boundary-inclusive trigrams per language, all public
  * orthographic frequency knowledge (Cavnar-Trenkle style). ASCII-only
  * by contract — that is what makes the byte-window scan in
  * [[TrigramLangScores]] exactly equivalent to the codepoint-window
  * SQL specification (see there).
  */
object TrigramProfiles {

  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", "and", " an", "nd ", "ing", "ng ",
      " of", "of ", "ed ", " to", "to ", "er ", " in", "in ", "ion",
      "on ", "is ", " is", "at ", "es ", "ent", " be", "hat", " he",
      "tha", " it", "it ", " co"),
    "de" -> Seq("en ", "er ", "der", " de", "ie ", "die", " di", "und",
      " un", "ein", " ei", "ich", " ic", "ch ", "sch", "che", "cht",
      "ung", "gen", "nde", " ge", "das", " da", "ten", "ine", "ber",
      "ens", "ist", " is", "ne "),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", " el", "el ", "que",
      " qu", "ue ", " en", "en ", "as ", "ar ", " co", "con", " se",
      "es ", " es", "ado", "do ", "nte", " po", "por", "ra ", "cio",
      "ion", " un", "una", "los"),
    "fr" -> Seq(" de", "de ", "es ", " le", "le ", "ent", "nt ", " la",
      "la ", "et ", " et", "ion", "on ", "re ", "ne ", "que", " qu",
      "ue ", " pa", "par", " co", "our", "les", "ous", "eur", "ur ",
      "ait", "ais", " un", "une"),
    "zh" -> Seq("ng ", "ang", "eng", "ian", "ong", "shi", "hi ", "wo ",
      " wo", "ni ", " ni", "hao", "ao ", " zh", "zh ", "de ", " de",
      "ta ", " ta", "men", "en ", "bu ", " bu", "yi ", " yi", "ma ",
      " ma", "ai ", "uo ", "an "),
  )

  val langs: Seq[String] = profiles.map(_._1)
  val nLangs: Int = langs.length

  /** 3 ASCII bytes packed big-endian into a 24-bit key. */
  private def keyOf(g: String): Int = {
    require(g.length == 3 && g.forall(_ < 128), s"profile trigram must be 3 ASCII chars: '$g'")
    (g.charAt(0) << 16) | (g.charAt(1) << 8) | g.charAt(2)
  }

  /** Sorted key table + weight rows aligned by index (a trigram shared
    * by several languages — " de" is German, Spanish AND French — gets
    * one row carrying each language's weight). */
  val (keys: Array[Int], flatWeights: Array[Int]) = {
    val acc = scala.collection.mutable.LinkedHashMap[Int, Array[Int]]()
    profiles.zipWithIndex.foreach { case ((_, ws), li) =>
      ws.zipWithIndex.foreach { case (g, rank) =>
        acc.getOrElseUpdate(keyOf(g), new Array[Int](nLangs))(li) = ws.length - rank
      }
    }
    val sorted = acc.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.flatMap(_._2))
  }
}

/** Single-pass trigram language scorer: one scan of the (already
  * lowercased, space-padded) input summing every language's profile
  * weight per 3-byte window → array<bigint> in profile order.
  *
  * This is the codegen'd replacement for the 5-language HOF
  * formulation (`aggregate(sequence(...), CASE substr(...) ...)` per
  * language), which runs INTERPRETED — higher-order functions have no
  * codegen — and cost ~230 s for q43 at sf0.1 (5 languages × 30-branch
  * string CASE × every character × closure per step). One fused scan
  * with an 8-step binary search per window is scan-bound again; the
  * HOF form stays in LangIdSpec as the executable specification, and
  * the DuckDB oracle keeps the declarative form so the driver
  * hash-compare re-proves equivalence end-to-end.
  *
  * Byte windows vs the spec's codepoint windows: profile keys are 3
  * ASCII bytes; in UTF-8, ASCII bytes never occur inside a multibyte
  * sequence, so 3 consecutive ASCII bytes ARE 3 consecutive
  * codepoints — byte-window matching of ASCII patterns is exactly
  * codepoint-window matching, and non-ASCII windows match nothing on
  * either side. */
case class TrigramLangScores(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"trigram_lang_scores requires a string argument, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val keys = TrigramProfiles.keys
    val w = TrigramProfiles.flatWeights
    val nLangs = TrigramProfiles.nLangs
    val scores = new Array[Long](nLangs)
    var i = 0
    while (i + 2 < bytes.length) {
      val key = ((bytes(i) & 0xff) << 16) | ((bytes(i + 1) & 0xff) << 8) | (bytes(i + 2) & 0xff)
      var lo = 0
      var hi = keys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = keys(mid)
        if (k == key) {
          var l = 0
          while (l < nLangs) { scores(l) += w(mid * nLangs + l); l += 1 }
          lo = hi + 2 // found: exit
        } else if (k < key) lo = mid + 1
        else hi = mid - 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(scores)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val keysRef = ctx.addReferenceObj("triKeys", TrigramProfiles.keys, "int[]")
      val wRef = ctx.addReferenceObj("triWeights", TrigramProfiles.flatWeights, "int[]")
      val nLangs = TrigramProfiles.nLangs
      val bytes = ctx.freshName("bytes")
      val scores = ctx.freshName("scores")
      val i = ctx.freshName("i")
      val key = ctx.freshName("key")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val k = ctx.freshName("k")
      val l = ctx.freshName("l")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long[] $scores = new long[$nLangs];
         |for (int $i = 0; $i + 2 < $bytes.length; $i++) {
         |  int $key = (($bytes[$i] & 0xFF) << 16) | (($bytes[$i + 1] & 0xFF) << 8) | ($bytes[$i + 2] & 0xFF);
         |  int $lo = 0; int $hi = $keysRef.length - 1;
         |  while ($lo <= $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    int $k = $keysRef[$mid];
         |    if ($k == $key) {
         |      for (int $l = 0; $l < $nLangs; $l++) $scores[$l] += $wRef[$mid * $nLangs + $l];
         |      $lo = $hi + 2;
         |    } else if ($k < $key) $lo = $mid + 1;
         |    else $hi = $mid - 1;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($scores);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TrigramLangScores = copy(child = c)
  override def prettyName: String = "trigram_lang_scores"
}
