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
}
