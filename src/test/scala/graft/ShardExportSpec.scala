package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.pipeline.ShardExport

/** End-to-end training-shard export (q164 + ShardExport): the
  * conservation contract — no token and no document is lost or
  * duplicated between the corpus-side encode and the PUBLISHED shard
  * files — checked three ways: the pipeline's own observe-metric
  * hard gate, a fresh-session re-read of the manifest-committed
  * output re-aggregated to the q164 manifest, and the manifest's
  * totals against an independently computed corpus token mass. */
class ShardExportSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("shard export publishes every doc exactly once, conserves token " +
      "mass end-to-end, and a FRESH session re-reading the published " +
      "shards re-aggregates them to the oracled q164 manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft-shard-spec").toString
    val stages = ShardExport.run(spark, dir, out)
    val enc = stages.find(_.stage == "corpus_encode").get
    val pub = stages.find(_.stage == "published").get
    assert(enc.docs > 0 && enc.docs == pub.docs && enc.tokens == pub.tokens)

    // independent corpus mass: q162's oracled per-doc counts (the
    // chain encode), summed — the manifest totals must match
    val q162 = TextAnalysis.bpeTokenCounts(spark, dir)
      .agg(count(lit(1)), sum(col("bpe_tokens"))).collect()(0)
    assert(q162.getLong(0) == enc.docs && q162.getLong(1) == enc.tokens,
      "pipeline encode mass != the oracled q162 per-doc counts")

    // fresh session: nothing trained or cached here — the published
    // files alone must reconstruct the manifest
    val fresh = spark.newSession()
    val readBack = fresh.read.format("graft.sources.ManifestSink")
      .option("path", out).load()
    assert(readBack.select(col("doc_id")).distinct().count() == enc.docs,
      "published shards must carry every doc exactly once")
    val gotManifest = readBack
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bpe_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))
    val wantManifest = TextAnalysis.shardManifest(spark, dir)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))
    assert(gotManifest.nonEmpty && gotManifest == wantManifest,
      "fresh-session re-aggregation of published shards != the q164 manifest")

    // shard invariants: every shard holds a contiguous doc_id span
    // within its source, and every shard except a source's last is
    // filled past the budget boundary it started before (the
    // start-offset rule: a shard closes only when a doc STARTS past
    // its boundary, so fill can exceed the budget by the straddling
    // doc, never undershoot to zero)
    val manifest = wantManifest.map(r => (r(0).asInstanceOf[String],
      r(1).asInstanceOf[Long], r(2).asInstanceOf[Long], r(3).asInstanceOf[Long]))
    manifest.groupBy(_._1).foreach { case (_, shards) =>
      val ordered = shards.sortBy(_._2)
      assert(ordered.map(_._2) == ordered.indices.map(_.toLong),
        "shard ids within a source must be dense from 0")
      ordered.dropRight(1).foreach { case (src, sid, _, tokens) =>
        assert(tokens >= 1, s"$src shard $sid is empty")
      }
    }
  }

  test("incremental admission: two monotone-id batches encoded under the " +
      "STORED merge table (no retrain) reproduce the one-shot export over " +
      "the concatenated corpus EXACTLY — same shards, same offsets — and " +
      "an out-of-order batch is refused before anything publishes") {
    val out = java.nio.file.Files.createTempDirectory("graft-shard-inc").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-shard-idx").toString
    val all = Tables.documents(spark, dir)
    val base = all.filter(col("doc_id") < 30)
    val b1 = all.filter(col("doc_id") >= 30 && col("doc_id") < 40)
    val b2 = all.filter(col("doc_id") >= 40)

    // build trains the tokenizer on the PREFIX corpus only — the
    // frozen-model contract: later batches encode under these merges
    val s0 = ShardExport.buildOf(base, out, idx)
    assert(s0.head.docs == base.count())
    val s1 = ShardExport.admit(spark, idx, out, b1)
    val s2 = ShardExport.admit(spark, idx, out, b2)
    assert(s1.head.docs == b1.count() && s2.head.docs == b2.count())
    assert(s0.head.docs > 0 && s1.head.docs > 0 && s2.head.docs > 0)

    // one-shot reference: the SAME stored merges over the full corpus
    val merges = ShardExport.loadMerges(spark, idx)
    val want = TextAnalysis.shardManifestOf(all, merges)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))
    val fresh = spark.newSession()
    val got = fresh.read.format("graft.sources.ManifestSink")
      .option("path", out).load()
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bpe_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))
    assert(got.nonEmpty && got == want,
      "incremental shards != one-shot export under the same frozen merges")

    // tails survived the delta chain: a third admission continues from
    // the merged state, and re-admitting already-packed ids is refused
    val e = intercept[IllegalArgumentException] {
      ShardExport.admit(spark, idx, out, b1)
    }
    assert(e.getMessage.contains("out-of-order admission"), e.getMessage)
  }

  test("retraction: a takedown of published docs is a FILE-GRANULAR delete — " +
      "a fresh session re-reads the table to exactly the q167 oracle form " +
      "(original shard ids, underfull shards, no repack), untouched files " +
      "survive by name, and a later admission still appends at the stored " +
      "tail (retraction commutes with admission)", Slow) {
    import graft.sources.ManifestSink
    val out = java.nio.file.Files.createTempDirectory("graft-shard-ret").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-shard-ridx").toString
    val all = Tables.documents(spark, dir)
    val base = all.filter(col("doc_id") < 40)
    val mid = all.filter(col("doc_id") >= 40 && col("doc_id") < 60)
    val rest = all.filter(col("doc_id") >= 60)
    // three separate commits = at least three distinct published
    // files, so a takedown confined to ONE batch leaves the other
    // commits' files provably untouched
    ShardExport.buildOf(base, out, idx)
    val baseFiles = ManifestSink.filesOf(
      ManifestSink.sortedManifests(new java.io.File(out))).toSet
    ShardExport.admit(spark, idx, out, mid)
    val merges = ShardExport.loadMerges(spark, idx)
    def committed(): Set[String] = ManifestSink.filesOf(
      ManifestSink.sortedManifests(new java.io.File(out))).toSet
    def manifestOf(session: SparkSession) =
      session.read.format("graft.sources.ManifestSink").option("path", out).load()
        .groupBy(col("source"), col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("bpe_tokens")).as("shard_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))

    // takedown of docs that live only in the MID commit's files
    val ids = Seq(43L, 47L, 59L)
    assert(ShardExport.retract(spark, out, ids) == 3)
    assert(baseFiles.subsetOf(committed()),
      "files holding no retracted row must be adopted untouched, by name")

    val retractedP = col("doc_id").isin(ids: _*)
    val want = TextAnalysis.retractedShardManifestOf(
        all.filter(col("doc_id") < 60), retractedP, merges)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))
    val got = manifestOf(spark.newSession())
    assert(got.nonEmpty && got == want,
      "post-retraction table != the q167 oracle form over the same corpus")

    // admission after retraction: tails were NOT rewound, so the
    // combined state is the full-corpus pack minus the retracted docs
    ShardExport.admit(spark, idx, out, rest)
    val want2 = TextAnalysis.retractedShardManifestOf(all, retractedP, merges)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))
    assert(manifestOf(spark.newSession()) == want2,
      "retraction and admission must commute through the published offsets")
  }

  test("q168 sequence manifest: the concat-and-cut loader view conserves " +
      "token mass exactly, every interior sequence holds exactly SeqLen " +
      "tokens (only each source's LAST may be short), sequence ids are " +
      "dense from 0, and doc boundaries agree with the pack offsets") {
    val docs = Tables.documents(spark, dir)
    val merges = TextAnalysis.bpeMergesOf(docs, 4).collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    val seqs = TextAnalysis.sequenceManifestOf(docs, merges).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("seq_tokens")))
    assert(seqs.nonEmpty)
    val corpusTokens = TextAnalysis.bpeTokenCountsChain(docs, merges)
      .agg(sum(col("bpe_tokens"))).collect()(0).getLong(0)
    assert(seqs.map(_._4).sum == corpusTokens,
      "sequence cut must conserve the corpus token mass exactly")
    seqs.groupBy(_._1).foreach { case (src, ss) =>
      val ordered = ss.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong),
        s"$src: sequence ids must be dense from 0")
      ordered.dropRight(1).foreach { case (_, sid, _, tok) =>
        assert(tok == 2048L, s"$src seq $sid: interior sequence holds $tok tokens")
      }
      assert(ordered.last._4 <= 2048L && ordered.last._4 >= 1L)
      assert(ordered.forall(_._3 >= 1))
    }
  }

  test("streaming shard admission: micro-batches driven through foreachBatch " +
      "feed ShardExport.admit under the streaming runtime — the frozen " +
      "tokenizer and stored tails carry across epochs, and the published " +
      "table equals the one-shot export over everything that arrived", Slow) {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-shard-stream").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-shard-sidx").toString
    val all = Tables.documents(spark, dir)
    ShardExport.buildOf(all.filter(col("doc_id") < 30), out, idx)

    val arrivals = all.filter(col("doc_id") >= 30)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val (wave1, wave2) = arrivals.splitAt(arrivals.length / 2)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "source", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val st = ShardExport.admit(batch.sparkSession, idx, out, batch)
          assert(st.find(_.stage == "corpus_encode").get.tokens ==
            st.find(_.stage == "published").get.tokens)
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-shard-ckpt").toString)
      .start()
    try {
      input.addData(wave1.toIndexedSeq)
      q.processAllAvailable()
      input.addData(wave2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val merges = ShardExport.loadMerges(spark, idx)
    val want = TextAnalysis.shardManifestOf(all, merges)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))
    val got = spark.newSession().read.format("graft.sources.ManifestSink")
      .option("path", out).load()
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bpe_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString(" "))
    assert(got.nonEmpty && got == want,
      "streamed admissions != the one-shot export under the same frozen merges")
  }

  test("range-partitioned publish: the published files cover pairwise " +
      "DISJOINT doc_id spans, so an id-targeted retraction's skip-scan " +
      "touches only the files actually holding the ids") {
    import graft.sources.ManifestSink
    val out = java.nio.file.Files.createTempDirectory("graft-shard-rng").toString
    ShardExport.run(spark, dir, out)
    val entries = ManifestSink.entriesOf(
      ManifestSink.sortedManifests(new java.io.File(out)))
    // doc_id is field 0 of the published schema
    val spans = entries.flatMap(e => ManifestSink.statsOfEntry(e)
      .collectFirst { case (0, mn, mx) => (mn.toLong, mx.toLong) })
    assert(spans.size == entries.size, "every published file must carry doc_id stats")
    val sorted = spans.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping file spans: $sorted")
      case _ => ()
    }
  }
}
