package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Similarity-search invariants on sf0.001 (500 vectors, 64-dim). */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("cosine top-k: 5 ranked neighbors per query, sims in [-1,1] descending") {
    val rows = Similarity.cosineTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q should have exactly 5 neighbors")
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"descending sims for $q")
      sims.foreach(s => assert(s >= -1.0001 && s <= 1.0001))
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q), "self excluded")
    }
  }

  test("ANN bucket join produces a subset of brute-force sims with identical values") {
    val brute = Similarity.cosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("sim"))
      .toMap
    val ann = Similarity.annTopK(spark, sf).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      // when an ANN result pair is also in the brute-force top-5, the
      // exact-rerank sim must be the identical double
      brute.get(key).foreach(s => assert(s == r.getAs[Double]("sim"), s"sim mismatch at $key"))
    }
  }

  test("ANN recall@1: the nearest neighbor is found for a reasonable share of queries") {
    // 4 sign bits ⇒ P(bucket match) ≈ (1 − θ/π)^4; planted near-dups
    // (cos ≈ 0.99) collide with high probability. This is a statistical
    // bound, deliberately loose — the correctness contract is the
    // deterministic bucketing (oracle-checked), not recall.
    val top1 = Similarity.cosineTopK(spark, sf).filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("neighbor_id")).toMap
    val annByQ = Similarity.annTopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val hits = top1.count { case (q, nn) => annByQ.getOrElse(q, Set.empty).contains(nn) }
    val recall = hits.toDouble / top1.size
    assert(recall >= 0.2, s"ANN recall@1 collapsed: $recall")
  }

  test("ANN plan is an equi-join on bucket (no cartesian against the corpus)") {
    val plan = Similarity.annTopK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "bucket equi-join should plan as a broadcast HASH join, not nested-loop")
  }
}
