package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** BPE merge-table training (the spec IS the oracle here — iterative
  * training is not reasonably SQL-expressible, the k-means/IVF
  * precedent): the distributed trainer must reproduce an INDEPENDENT
  * textbook replay (Sennrich's algorithm run directly over the raw
  * word list, no DataFrames) merge for merge, and hand-computed
  * merges on a crafted corpus pin the exact count-then-lexicographic
  * tie-break contract. */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Independent reference: the published algorithm, straight off the
    * raw words. Same tie-break contract (max count, then smallest
    * (left, right)); leftmost-first fusing. */
  private def referenceBpe(words: Seq[String], nMerges: Int,
      minPair: Long): Seq[(String, String)] = {
    var ws: Seq[(List[String], Long)] = words.groupBy(identity).toSeq
      .map { case (w, g) => (w.map(_.toString).toList, g.size.toLong) }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var go = true
    while (go && out.size < nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- ws; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      val ranked = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
      ranked.headOption match {
        case Some(((a, b), c)) if c >= minPair =>
          out += ((a, b))
          def fuse(s: List[String]): List[String] = s match {
            case x :: y :: rest if x == a && y == b => (a + b) :: fuse(rest)
            case x :: rest => x :: fuse(rest)
            case Nil => Nil
          }
          ws = ws.map { case (syms, c0) => (fuse(syms), c0) }
        case _ => go = false
      }
    }
    out.toSeq
  }

  test("crafted corpus: the first merges and the tie-break are exactly the " +
      "hand-computed ones") {
    import spark.implicits._
    // low x5, lower x2, newest x6 — hand-computed:
    //   (w,e):8 wins round 1; (l,o):7 round 2; round 3 is a 6-6-6-6 tie
    //   among (e,we),(n,e),(s,t),(we,s) → lexicographic min (e,we)
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpe(docs, nMerges = 3)
    assert(merges == Seq(("w", "e"), ("l", "o"), ("e", "we")),
      s"hand-computed merge order violated: $merges")
    // the encode half applies the same merges in order, leftmost-first
    assert(TextAnalysis.bpeEncode("lowest", merges) == Seq("lo", "we", "s", "t"))
    assert(TextAnalysis.bpeEncode("low", merges) == Seq("lo", "w"))
    assert(TextAnalysis.bpeEncode("xyz", merges) == Seq("x", "y", "z"),
      "symbols never seen in training stay single")
  }

  test("distributed trainer ≡ independent textbook replay on the fixture corpus " +
      "(40 merges), and merges compress what they were trained on") {
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val rawWords = docsDf.collect()
      .flatMap(_.getString(1).split(" ")).filter(_.nonEmpty).toSeq
    val expected = referenceBpe(rawWords, nMerges = 40, minPair = 2L)
    val got = TextAnalysis.trainBpe(docsDf, nMerges = 40)
    assert(got == expected,
      s"trainer diverged from the reference replay at merge " +
        s"${got.zip(expected).indexWhere(p => p._1 != p._2)}: $got vs $expected")
    // the merge table does its job: encoding the training vocabulary
    // with it needs strictly fewer symbols than character splitting
    val vocab = rawWords.distinct
    val before = vocab.map(_.length).sum
    val after = vocab.map(w => TextAnalysis.bpeEncode(w, got).size).sum
    assert(after < before,
      s"40 merges must compress the training vocab ($after vs $before symbols)")
  }

  test("early stop: a corpus whose pairs are all singletons learns nothing at " +
      "minPairCount 2") {
    import spark.implicits._
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    assert(TextAnalysis.trainBpe(docs, nMerges = 10).isEmpty)
  }

  test("distributed encode: per-doc token counts under the trained merges equal " +
      "a word-by-word driver replay; zero merges degenerate to char counts") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val merges = TextAnalysis.trainBpe(docs, nMerges = 40)
    assert(merges.nonEmpty, "fixture must actually learn merges")
    val got = TextAnalysis.bpeTokenCountsOf(docs, merges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("bpe_tokens"),
          r.getAs[Long]("pieces_per_word_x100"))).toMap
    val want = docs.collect().map { r =>
      val words = r.getAs[String]("text").split(" ").filter(_.nonEmpty)
      val pieces = words.map(w => TextAnalysis.bpeEncode(w, merges).length.toLong).sum
      r.getAs[Long]("doc_id") -> ((words.length.toLong, pieces,
        100L * pieces / words.length))
    }.toMap
    assert(got == want, {
      val bad = want.keys.filter(k => got.get(k) != want.get(k)).take(3)
      s"first diffs: ${bad.map(k => s"$k got ${got.get(k)} want ${want.get(k)}")}"
    })
    // merges only ever REDUCE the piece count; zero merges = chars
    val noMerge = TextAnalysis.bpeTokenCountsOf(docs, Nil).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bpe_tokens")).toMap
    want.foreach { case (id, (_, pieces, _)) =>
      assert(pieces <= noMerge(id), s"doc $id: merges must not add pieces")
    }
    val chars = docs.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").filter(_.nonEmpty).map(_.length.toLong).sum
    }.toMap
    assert(noMerge == chars, "the un-merged encode is exactly the character count")
  }

  test("bounded type collect: a 1e5-type corpus under a 256-type driver cap " +
      "yields counts identical to the unbounded form (distributed tail path)") {
    import spark.implicits._
    // web-noise shape: a small Zipf head of real words plus a long tail
    // of unique junk types (hex-ish ids) — the regime where collecting
    // every distinct type would OOM a real driver
    val nDocs = 2000
    // 50 unique tail types per doc → 1e5 distinct types corpus-wide
    val cols = Seq(lit("the"), lit("quick"), lit("brown"), lit("fox")) ++
      (0 until 50).map(j =>
        concat(lit("x"), md5(concat(col("id"), lit(s"_$j")))))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", cols: _*).as("text"))
    val merges = Seq(("t", "h"), ("th", "e"), ("q", "u"))
    val capped = TextAnalysis.bpeTokenCountsOf(docs, merges, maxDriverTypes = 256)
    // the head cap shows up in the plan as a TakeOrdered limit — the
    // driver provably holds at most 256 types
    val bounded = capped.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("bpe_tokens"))).toMap
    assert(bounded.size == nDocs)
    // equality with the unbounded form on a sampled subset replay
    // (full driver replay of 1e5 md5 types would just re-test bpeEncode)
    val sample = docs.filter(col("doc_id") < 20).collect()
    sample.foreach { r =>
      val words = r.getAs[String]("text").split(" ").filter(_.nonEmpty)
      val pieces = words.map(w => TextAnalysis.bpeEncode(w, merges).length.toLong).sum
      val (nw, bt) = bounded(r.getAs[Long]("doc_id"))
      assert(nw == words.length.toLong && bt == pieces,
        s"doc ${r.getAs[Long]("doc_id")}: capped encode diverged from replay")
    }
    // every doc shares the same shape here, so the whole corpus must
    // agree with doc 0's replay values — a full-corpus equality check
    // without a 1e5-word driver loop
    val (nw0, bt0) = bounded(0L)
    assert(bounded.values.forall { case (nw, bt) => nw == nw0 && bt == bt0 },
      "uniform-shape corpus must yield uniform counts")
  }

  test("bounded trainer: a 1.6e4-singleton-type tail is pruned before the collect " +
      "and the merge table is EQUAL to the unbounded train; dropped mass audited") {
    import spark.implicits._
    // head: a small corpus whose merges are all the training can learn
    val head = Seq.fill(8)("low lower lowest") ++ Seq.fill(5)("new newer newest")
    val headDocs = head.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // tail: 128² = 16384 word TYPES, each occurring ONCE, each a
    // unique 2-char word over the high-latin alphabet chr(128..255) —
    // disjoint from the head's ascii, and every tail-only pair has
    // weighted count 1 < minPairCount, so no tail pair can ever win a
    // merge. (chr() wraps mod 256, so the alphabet must stay ≤ 255.)
    // This is the planted long tail: under the floor these types
    // never reach the driver; unbounded they ride along without
    // changing any merge.
    val nTail = 16384L
    val tailDocs = spark.range(nTail).select(
      (col("id") + 1000L).as("doc_id"),
      concat(chr(lit(128) + floor(col("id") / 128)),
        chr(lit(128) + col("id") % 128)).as("text"))
    val docs = headDocs.toDF("doc_id", "text").unionByName(tailDocs)
    // the floor prunes 5e4 types BEFORE the collect (distributed
    // filter); the driver dict is head-sized
    val keptTypes = TextAnalysis.bpeWordCounts(docs).filter(col("n") >= 2L).count()
    assert(keptTypes <= 10, s"floored dict must be head-sized, got $keptTypes")
    val bounded = TextAnalysis.trainBpe(docs, nMerges = 30, minTypeCount = 2L)
    val unbounded = TextAnalysis.trainBpe(docs, nMerges = 30)
    assert(bounded.nonEmpty, "head corpus must learn merges")
    assert(bounded == unbounded,
      s"floored merge table must equal the unbounded train:\n$bounded\n$unbounded")
    // the audit: each dropped 2-char type carries exactly one pair
    assert(TextAnalysis.bpeDroppedPairMass(docs, 2L) == nTail,
      "dropped pair mass == one pair per singleton tail type")
    assert(TextAnalysis.bpeDroppedPairMass(docs, 1L) == 0L,
      "floor 1 drops nothing")
  }

  test("q161 oracled form: the distributed fixed-R trainer learns the SAME " +
      "merge table as trainBpe on the fixture (1-char words carry no pairs, " +
      "so the stricter word filter changes nothing), and the two-pass " +
      "replace convention is pinned on a planted same-symbol run") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextAnalysis.bpeMergesOf(docs, 4).collect().sortBy(_.getInt(0))
    assert(rows.length == 4)
    val gotMerges = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    val want = TextAnalysis.trainBpe(docs, nMerges = 4, minPairCount = 1L)
    assert(gotMerges == want,
      s"q161 merge table must equal trainBpe's: $gotMerges vs $want")
    // the compression trajectory is monotone: each merge can only
    // reduce the weighted symbol count (by exactly the number of
    // fused occurrences)
    val toks = rows.map(_.getLong(5))
    assert(toks.zip(toks.tail).forall { case (a, b) => b < a },
      s"corpus_tokens_after must strictly decrease: ${toks.toSeq}")
    // planted run-of-5: merge table and counts agree with canonical
    // BPE; the SEGMENTATION convention (two-pass replace: 'aa a aa')
    // differs from leftmost-first ('aa aa a') — same symbol count
    // here, documented in the q161 scaladoc
    val run = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMergesOf(run, 1).collect()(0)
    assert((m.getString(1), m.getString(2), m.getLong(4)) == ("a", "a", 4L),
      s"run-of-5 pair count: $m")
    assert(m.getLong(5) == 3L, "aaaaa fuses to 3 symbols under either convention")
    assert(TextAnalysis.trainBpe(run, 1, minPairCount = 1L) == Seq(("a", "a")))
  }

  test("q162 rework (r17): the chain-projection encode — no vocab-sized " +
      "collect, the R merges re-applied per word as one codegen'd replace " +
      "chain — equals the type-table-join encode it replaced (piece counts " +
      "read off the training table's final symbol column)") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val (_, syms) = TextAnalysis.bpeMergeRounds(docs, 4)
    val types = syms.select(col("w"),
      size(split(trim(col("s")), " ")).cast("long").as("n_pieces"))
    val old = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
      .join(broadcast(types), Seq("w"), "left")
      .withColumn("n_pieces",
        coalesce(col("n_pieces"), length(col("w")).cast("long")))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"), sum(col("n") * col("n_pieces")).as("bpe_tokens"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    syms.unpersist()
    val got = TextAnalysis.bpeTokenCounts(spark, dir).collect()
    assert(got.nonEmpty && got.length == old.size)
    got.foreach { r =>
      val (nw, bt) = old(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == nw && r.getAs[Long]("bpe_tokens") == bt,
        s"doc ${r.getAs[Long]("doc_id")}: chain projection vs type-table join")
    }
  }

  test("r19 encode head/tail seam: the trained head-type broadcast (pieces " +
      "read off the training table) equals the pure chain projection, " +
      "including under a 4-type cap that forces tail words onto the chain") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val (rows, syms) = TextAnalysis.bpeMergeRounds(docs, 4)
    val merges = rows.map(r => (r._2, r._3, r._4))
    def counts(types: Option[org.apache.spark.sql.DataFrame]) =
      TextAnalysis.bpeTokenCountsChain(docs, merges, types).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_words"), r.getAs[Long]("bpe_tokens"),
            r.getAs[Long]("pieces_per_word_x100"))).toMap
    val chainOnly = counts(None)
    val fullHead = counts(Some(TextAnalysis.bpeHeadTypes(syms)))
    val cappedHead = counts(Some(TextAnalysis.bpeHeadTypes(syms, maxDriverTypes = 4)))
    syms.unpersist()
    assert(chainOnly.nonEmpty)
    assert(fullHead == chainOnly, "full head-type join diverged from the chain")
    assert(cappedHead == chainOnly, "capped head (tail via chain) diverged")
  }

  test("q161 degenerate corpus: training past pair exhaustion fails fast " +
      "with the documented message instead of an IndexOutOfBounds (r17 advice)") {
    import spark.implicits._
    // one qualifying 2-char word type: round 1 fuses it to a single
    // symbol, round 2 has no adjacent pair anywhere
    val run = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeMergesOf(run, 2)
    }
    assert(e.getMessage.contains("corpus exhausted"), e.getMessage)
  }

  test("q162 encode under the trained merges: per-doc token counts equal an " +
      "INDEPENDENT driver replay (plain java String.replace two-pass per " +
      "word — the same pinned convention) of the q161 merge table over raw text") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val merges = TextAnalysis.bpeMergesOf(docs, 4).collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    def pieces(w: String): Long =
      if (!w.matches("^[a-z0-9]{2,}$")) w.length.toLong
      else {
        var s = " " + w.flatMap(c => s"$c ")
        merges.foreach { case (a, b) =>
          val p = s" $a $b "; val f = s" $a$b "
          s = s.replace(p, f).replace(p, f)
        }
        s.trim.split(" ").length.toLong
      }
    val want = docs.select(col("doc_id"), col("text")).collect().flatMap { r =>
      val ws = r.getString(1).split(" ").filter(_.nonEmpty)
      if (ws.isEmpty) None
      else Some(r.getLong(0) -> (ws.length.toLong, ws.map(pieces).sum))
    }.toMap
    val got = TextAnalysis.bpeTokenCounts(spark, dir).collect()
    assert(got.nonEmpty && got.length == want.size)
    got.foreach { r =>
      val (nw, bt) = want(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == nw && r.getAs[Long]("bpe_tokens") == bt,
        s"doc ${r.getAs[Long]("doc_id")}: engine vs replay mismatch")
      assert(r.getAs[Long]("pieces_per_word_x100") == 100L * bt / nw)
    }
  }

  test("q166 tokenizer drift: the frozen trained merges apply to holdout " +
      "words UNSEEN in training (pure-function chain projection), and the " +
      "per-source masses and integer ppw/drift columns match a hand-computed " +
      "planted corpus") {
    import spark.implicits._
    // train split (doc_id % 4 != 3): three docs of "abcde abcde" — the
    // four learned merges are a+b, ab+c, abc+d, abcd+e (equal counts,
    // lexicographic tie-break at every round), so "abcde" encodes to 1
    // piece. holdout (doc_id 3): "abcdz xy" — "abcdz" never seen in
    // training, but the frozen chain still fuses its abcd prefix (2
    // pieces, not 5 chars); "xy" has no trained pair (2 pieces via
    // padding — symbols x y stay apart)
    val docs = Seq(
      (0L, "s", "abcde abcde"), (1L, "s", "abcde abcde"),
      (2L, "s", "abcde abcde"), (3L, "s", "abcdz xy"))
      .toDF("doc_id", "source", "text")
    val train = docs.filter(col("doc_id") % 4 =!= 3)
    val merges = TextAnalysis.bpeMergesOf(train, 4).collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(merges == Seq(("a", "b", "ab"), ("ab", "c", "abc"),
      ("abc", "d", "abcd"), ("abcd", "e", "abcde")))
    val row = TextAnalysis.tokenizerDriftOf(docs, col("doc_id") % 4 === 3, merges)
      .collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getAs[Long]("train_words") == 6 && r.getAs[Long]("train_tokens") == 6)
    // holdout: abcdz -> [abcd, z] = 2 pieces; xy -> [x, y] = 2 pieces
    assert(r.getAs[Long]("holdout_words") == 2 && r.getAs[Long]("holdout_tokens") == 4)
    assert(r.getAs[Long]("train_ppw_x100") == 100)
    assert(r.getAs[Long]("holdout_ppw_x100") == 200)
    assert(r.getAs[Long]("drift_x100") == 100)
  }
}
