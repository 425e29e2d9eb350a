package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextHash, VectorOps}
import graft.pipeline.RagPipeline

/** chunk → feature-hash embed → IVF retrieve, end to end on sf0.001. */
class RagPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("hash embedder: overlapping token bags are closer than disjoint ones") {
    import spark.implicits._
    val docs = Seq(
      ("alpha beta gamma delta epsilon zeta", "a"),
      ("alpha beta gamma delta epsilon eta", "b"), // 5/6 shared with a
      ("one two three four five six", "c")) // disjoint
      .toDF("text", "tag")
      .select(col("tag"),
        VectorOps.hashEmbed(
          TextHash.wordNGramHashes(split(col("text"), " "), 1), 64).as("e"))
      .withColumn("nrm", sqrt(VectorOps.dot(col("e"), col("e"))))
    val m = docs.collect().map(r => r.getString(0) ->
      (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
    def cos(x: String, y: String): Double = {
      val ((a, na), (b, nb)) = (m(x), m(y))
      a.zip(b).map { case (p, q) => p * q }.sum / (na * nb)
    }
    assert(cos("a", "b") > 0.6, s"5/6 token overlap should be close: ${cos("a", "b")}")
    assert(cos("a", "b") > cos("a", "c") + 0.3,
      s"overlap ${cos("a", "b")} must dominate disjoint ${cos("a", "c")}")
  }

  test("retrieval: deterministic, k ranked neighbors per query, sims descend") {
    val out = RagPipeline.retrieve(spark, sf).collect()
    val again = RagPipeline.retrieve(spark, sf).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val ranked = rows.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length))
      val sims = ranked.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"q=$q sims not descending")
    }
  }

  test("IVF retrieval recall@1 vs brute-force cosine over the same chunk vectors") {
    val vecs = RagPipeline.chunkVectors(spark, sf)
    val q = vecs.filter(expr("vec_id % 101 = 0"))
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    val brute = vecs.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("sim", VectorOps.dot(col("qe"), col("e")) / (col("qn") * col("nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("vec_id").as("top1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = RagPipeline.retrieve(spark, sf, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(brute.nonEmpty && ivf.keySet == brute.keySet)
    val hits = brute.count { case (qid, t1) => ivf.get(qid).contains(t1) }
    val recall = hits.toDouble / brute.size
    // nprobe=3 over a ~1/31 quantizer: imperfect by design, but the
    // probe set must find the true neighbor for most queries
    assert(recall >= 0.6, s"IVF recall@1 $recall over ${brute.size} queries")
  }
}
