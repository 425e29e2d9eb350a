package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusPipeline

/** End-to-end corpus curation: the M6 operators composed into the
  * funnel a training-data pipeline runs, published through the
  * manifest-committed sink. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("funnel runs, is monotone, and publishes a readable cured corpus") {
    val out = Files.createTempDirectory("graft_corpus").toString
    val funnel = CorpusPipeline.run(spark, sf, out)
    assert(funnel.map(_.stage) ===
      Seq("input", "quality_gate", "exact_dedup", "near_dedup"))
    // each stage can only remove documents
    funnel.sliding(2).foreach { case Seq(a, b) =>
      assert(b.rows <= a.rows, s"${b.stage} grew: ${a.rows} -> ${b.rows}")
    }
    assert(funnel.last.rows > 0, "the fixture corpus must survive curation")

    val cured = spark.read.format("graft.sources.ManifestSink")
      .option("path", out).load()
    assert(cured.count() === funnel.last.rows)

    // invariant: no two kept documents share a content hash
    val dupHashes = cured.groupBy(md5(col("text"))).count().filter(col("count") > 1)
    assert(dupHashes.count() === 0, "exact duplicates must not survive")

    // invariant: no kept document is the dropped side of a near-dup pair
    val losers = graft.operators.Dedup.minhashLsh(spark, sf)
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    val keptIds = cured.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(losers).isEmpty, "near-dup losers must not survive")

    // every kept row carries a valid split assignment
    val splits = cured.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
  }

  test("connected components: chains, middleman links, and multi-component graphs") {
    import spark.implicits._
    import graft.operators.Components
    // chain 1-2-3-4, separate pair 10-11, middleman 20-22 & 21-22,
    // isolated-by-duplicate-edge 30-31 (both directions + dup rows)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 22L), (21L, 22L),
      (31L, 30L), (30L, 31L), (30L, 31L))
      .toDF("a_id", "b_id")
    val comps = Components.minLabelComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L))
    // the middleman case is where the old pairwise policy differed:
    // pairwise dropped only {22} (the b-side), keeping both 20 and 21
    // of one component; components keep exactly the minimum
    val dropped = Components.nonRepresentatives(edges)
      .collect().map(_.getLong(0)).toSet
    assert(dropped === Set(2L, 3L, 4L, 11L, 21L, 22L, 31L))
  }

  test("long-chain convergence: pointer jumping resolves a 64-node path inside default rounds") {
    import spark.implicits._
    import graft.operators.Components
    // a 64-node path whose ids are shuffled so the global minimum sits
    // at one END of the path (worst case for plain min-propagation:
    // O(n) rounds; pointer jumping needs O(log n))
    val ids = (2L to 64L).toArray ++ Array(1L) // path: 2-3-...-64-1
    val edges = ids.sliding(2).map(a => (a(0), a(1))).toSeq.toDF("a_id", "b_id")
    val comps = Components.minLabelComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size === 64)
    assert(comps.values.toSet === Set(1L),
      s"all 64 chain nodes must collapse to representative 1; got reps ${comps.values.toSet}")
  }

  test("property: distributed components ≡ driver-side union-find on random graphs", Slow) {
    import spark.implicits._
    import graft.operators.Components
    (0 until 3).foreach { round =>
      val rnd = new scala.util.Random(1234 + round)
      val n = 200
      val edges = (0 until 240).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (x, y) => x != y }
      // driver-side union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (x, y) =>
        val (rx, ry) = (find(x.toInt), find(y.toInt))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min id per component among TOUCHED nodes (isolated ids absent)
      val minOf = touched.groupBy(id => find(id.toInt)).map { case (_, ids) => ids.min -> ids }
      val expected = minOf.flatMap { case (m, ids) => ids.map(_ -> m) }.toMap
      val got = Components.connectedComponents(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"round $round diverged from union-find")
    }
  }

  test("funnel with a synthetic (1,2),(2,3),(3,4) chain keeps exactly one representative", Slow) {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_corpus_chain").toString
    // find four doc_ids that certainly survive quality gate + exact
    // dedup (run the funnel with NO near-dup edges), then chain them
    // as synthetic near-dup edges
    val exactSurvivorIds = {
      val tmp = Files.createTempDirectory("graft_corpus_ids").toString
      CorpusPipeline.run(spark, sf, tmp,
        nearDupPairs = Some(Seq.empty[(Long, Long)].toDF("a_id", "b_id")))
      spark.read.format("graft.sources.ManifestSink").option("path", tmp)
        .load().select("doc_id").orderBy("doc_id")
        .limit(4).collect().map(_.getLong(0))
    }
    val Array(d1, d2, d3, d4) = exactSurvivorIds
    val chain = Seq((d1, d2), (d2, d3), (d3, d4)).toDF("a_id", "b_id")
    val funnel = CorpusPipeline.run(spark, sf, out, nearDupPairs = Some(chain))
    val exactCount = funnel.find(_.stage == "exact_dedup").get.rows
    val nearCount = funnel.find(_.stage == "near_dedup").get.rows
    assert(nearCount === exactCount - 3,
      "a 4-document chain must lose exactly 3 documents (one representative kept)")
    val kept = spark.read.format("graft.sources.ManifestSink")
      .option("path", out).load().select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(d1) && !kept.contains(d2) && !kept.contains(d3) && !kept.contains(d4),
      "the minimum id of the chain is the surviving representative")
  }

  test("the funnel is idempotent on its own output semantics (re-run appends identically)") {
    val out = Files.createTempDirectory("graft_corpus2").toString
    val f1 = CorpusPipeline.run(spark, sf, out)
    val f2 = CorpusPipeline.run(spark, sf, out)
    assert(f1 === f2, "deterministic stages must produce an identical funnel")
    val cured = spark.read.format("graft.sources.ManifestSink")
      .option("path", out).load()
    // two appends of the same deterministic result: exactly 2 copies
    assert(cured.count() === 2 * f1.last.rows)
    val perDoc = cured.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("q123 report ≡ run(): the oracled funnel table and the Observation-metric " +
      "pipeline agree stage by stage; retention is monotone", Slow) {
    CacheRegistry.releaseAll()
    val out = java.nio.file.Files.createTempDirectory("graft-funnel-q123").toString
    val fromRun = CorpusPipeline.run(spark, sf, s"$out/corpus")
      .map(s => s.stage -> s.rows).toMap
    val report = CorpusPipeline.curationFunnel(spark, sf).collect()
      .sortBy(_.getAs[Int]("stage_id"))
    assert(report.map(_.getAs[String]("stage")).toSeq ==
      Seq("input", "quality_gate", "exact_dedup", "near_dedup"))
    report.foreach { r =>
      assert(r.getAs[Long]("n_docs") == fromRun(r.getAs[String]("stage")),
        s"stage ${r.getAs[String]("stage")}: the report and the Observation " +
          "metrics are two implementations of one funnel")
    }
    val docs = report.map(_.getAs[Long]("n_docs"))
    val toks = report.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a }, "docs monotone")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a }, "tokens monotone")
    assert(report.head.getAs[Long]("doc_retention_ppm") == 1000000L)
    assert(report.last.getAs[Long]("token_retention_ppm") < 1000000L,
      "the fixture corpus must actually lose mass through the funnel")
  }
}
