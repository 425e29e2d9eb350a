package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** IVF ANN (q44) invariants: result shape, exact-rerank sim parity
  * with brute force, NearestCell ≡ the relational argmax, the
  * recall/nprobe trade, and the no-shuffle assignment plan.
  */
class IvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("ivf top-k: ≤k ranked neighbors per query, sims descending, self excluded") {
    val rows = Similarity.ivfTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 3, s"query $q must have at most k=3 neighbors")
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"descending sims for $q")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q), "self excluded")
    }
  }

  test("ivf exact-rerank sims are bit-identical to brute force on shared pairs") {
    val brute = Similarity.cosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("sim"))
      .toMap
    val ivf = Similarity.ivfTopK(spark, sf).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(s => assert(s == r.getAs[Double]("sim"), s"sim mismatch at $key"))
    }
  }

  test("NearestCell assignment ≡ relational argmax (window over corpus×centroids)") {
    val corpus = Similarity.withNorms(
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")))
    // non-zero-vector precondition of the expression
    assert(corpus.filter(col("nrm") === 0.0).count() == 0)
    val cents = corpus.filter(expr("vec_id % 31 = 7"))
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1).toSeq
    val viaExpr = corpus
      .withColumn("cell", graft.functions.VectorOps.nearestCell(col("e"), col("nrm"), cents))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // relational form — the oracle's shape: argmax(sim) with (sim DESC, c_id ASC)
    import spark.implicits._
    val centDf = cents.map { case (id, v, nm) => (id, v.toSeq, nm) }.toDF("c_id", "ce", "cn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("c_id"))
    val viaWindow = corpus.crossJoin(broadcast(centDf))
      .withColumn("sim",
        graft.functions.VectorOps.dot(col("e"), col("ce")) / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaWindow, "codegen'd argmax must equal the relational argmax")
  }

  /** Deterministic clustered corpus (same integer-hash recipe as
    * SimilaritySpec's): 3000 vectors, 16-dim, 30 cluster centers. */
  private def clusteredCorpus = {
    import spark.implicits._
    val dim = 16
    def center(k: Int, d: Int): Double =
      (((k * 31 + d) * 2654435761L) % 1000).toDouble / 1000.0 - 0.5
    def noise(i: Int, d: Int): Double =
      (((i * 97L + d) * 40503L) % 100).toDouble / 100.0 * 0.05
    (0 until 3000).map { i =>
      val k = i % 30
      (i.toLong, (0 until dim).map(d => (center(k, d) + noise(i, d)).toFloat).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("nprobe trades recall for candidates on the clustered corpus") {
    val corpus = Similarity.withNorms(clusteredCorpus)
    val qPred = expr("vec_id % 50 = 0") // 60 queries
    // centroid stride 31 is coprime to the 30-cluster layout, so the
    // quantizer samples across clusters instead of one of them
    val cPred = expr("vec_id % 31 = 7")

    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val top1 = vecs.keys.filter(_ % 50 == 0).map { q =>
      q -> vecs.keys.filter(_ != q).map(n => (n, cos(vecs(q), vecs(n))))
        .minBy { case (n, s) => (-s, n) }._1
    }.toMap

    def recallAt(nprobe: Int): Double = {
      val got = Similarity.ivfTopKWith(corpus, qPred, cPred, nprobe, 3).collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
      top1.count { case (q, nn) => got.getOrElse(q, Set.empty).contains(nn) }.toDouble / top1.size
    }
    val r1 = recallAt(1)
    val r3 = recallAt(3)
    assert(r3 >= r1, f"recall must not shrink with nprobe: r1=$r1%.2f r3=$r3%.2f")
    assert(r3 >= 0.5, f"clustered-corpus recall collapsed: r3=$r3%.2f")

    val cands = Similarity.ivfCandidateCounts(corpus, qPred, cPred, 3).collect()
    val mean = cands.map(_.getAs[Long]("n_candidates")).sum.toDouble / top1.size
    assert(mean < 1500, s"IVF candidates failed to prune: mean=$mean of 3000")
  }

  test("Lloyd refinement improves assignment quality monotonically (clustered corpus)") {
    val corpus = Similarity.withNorms(clusteredCorpus)
    val seed = corpus.filter(expr("vec_id % 31 = 7"))
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1).toSeq
    val q0 = Similarity.assignmentQuality(corpus, seed)
    val c1 = Similarity.refineCentroids(corpus, seed, 1)
    val q1 = Similarity.assignmentQuality(corpus, c1)
    val c2 = Similarity.refineCentroids(corpus, c1, 1)
    val q2 = Similarity.assignmentQuality(corpus, c2)
    // Lloyd never decreases the objective (mean member→centroid sim);
    // tiny FP tolerance for the non-associative mean summation
    assert(q1 >= q0 - 1e-9, f"iteration 1 must not degrade: $q0%.4f -> $q1%.4f")
    assert(q2 >= q1 - 1e-9, f"iteration 2 must not degrade: $q1%.4f -> $q2%.4f")
    assert(q1 > q0 + 1e-4, f"sampled->trained must actually improve: $q0%.4f -> $q1%.4f")
    // ids/count preserved; empty-cluster rule keeps the set aligned
    assert(c2.map(_._1) == seed.map(_._1))
  }

  test("NearestCell codegen ≡ interpreted eval (both execution modes, fallback disabled)") {
    val corpus = Similarity.withNorms(
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")))
    val cents = corpus.filter(expr("vec_id % 31 = 7"))
      .select(col("vec_id"), col("e"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1).toSeq
    def assignAll(): Map[Long, Long] = corpus
      .withColumn("cell", graft.functions.VectorOps.nearestCell(col("e"), col("nrm"), cents))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val saved = Seq("spark.sql.codegen.fallback", "spark.sql.codegen.wholeStage",
      "spark.sql.codegen.factoryMode").map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false") // Janino errors must throw
      val viaCodegen = assignAll()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val viaInterpreter = assignAll()
      assert(viaCodegen == viaInterpreter, "doGenCode and nullSafeEval must agree")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("NearestCell null/mismatch semantics: null element or ragged dims yield null") {
    import spark.implicits._
    val cents = Seq((5L, Array(1.0, 0.0), 1.0), (9L, Array(0.0, 1.0), 1.0))
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 0.1)),      // clean → cell 5
      (2L, Seq[java.lang.Double](0.1, 1.0)),      // clean → cell 9
      (3L, Seq[java.lang.Double](1.0, null)),     // null element → null
      (4L, Seq[java.lang.Double](1.0, 0.0, 0.0)) // dim mismatch → null
    ).toDF("id", "e")
      .select(col("id"), col("e").cast("array<double>").as("e"), lit(1.0).as("nrm"))
      .withColumn("cell", graft.functions.VectorOps.nearestCell(col("e"), col("nrm"), cents))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(r.fieldIndex("cell"))) None else Some(r.getLong(r.fieldIndex("cell"))))).toMap
    assert(got == Map(1L -> Some(5L), 2L -> Some(9L), 3L -> None, 4L -> None), got.toString)
  }

  test("assignment is a narrow map stage and the probe join broadcasts") {
    val plan = Similarity.ivfTopK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "cell probe join should be a broadcast hash join")
    val corpus = Similarity.withNorms(
      Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")))
    val cents = Seq((7L, Array.fill(64)(0.1), 0.8))
    val assignPlan = corpus
      .withColumn("cell", graft.functions.VectorOps.nearestCell(col("e"), col("nrm"), cents))
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange"),
      "corpus→cell assignment must not shuffle")
  }

  test("the nearest_cell kernel is evaluated once per corpus row, not re-derived in a pushed filter") {
    // without the non-null coalesce the inner probe join infers
    // isnotnull(cell) and pushes it into the parquet scan, running the
    // most expensive kernel of the query twice per row
    val plan = Similarity.ivfTopK(spark, sf).queryExecution.executedPlan.toString
    val mentions = "nearest_cell".r.findAllIn(plan).length
    assert(mentions == 1, s"nearest_cell must appear exactly once (the projection), saw $mentions:\n$plan")
  }
}
