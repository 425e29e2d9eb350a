package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.functions.VectorOps

/** Product quantization: the storage tier below q61's scalar codes —
  * m small ints per vector + an asymmetric-distance scan that never
  * decodes the corpus. Spec-verified like refineCentroids (k-means is
  * not oracle-expressible); determinism, codegen/interpreter parity,
  * Lloyd improvement, and neighbor recall are each pinned. */
class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val M = 16
  private val K = 128

  private lazy val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
  private lazy val raw: Map[Long, Array[Double]] = corpus.collect()
    .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def mse(cb: Array[Array[Array[Double]]]): Double = {
    val dsub = cb(0)(0).length
    raw.values.map { v =>
      (0 until M).map { j =>
        val sub = v.slice(j * dsub, (j + 1) * dsub)
        cb(j).map(cw => sub.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    }.sum / raw.size
  }

  test("training is deterministic and Lloyd rounds do not worsen quantization error") {
    val nrm = corpus.withColumn("nrm", sqrt(VectorOps.dot(col("e"), col("e"))))
    val cb0 = Similarity.trainPq(nrm, M, K, iters = 0)
    val cb2 = Similarity.trainPq(nrm, M, K, iters = 2)
    val cb2b = Similarity.trainPq(nrm, M, K, iters = 2)
    assert(cb2.flatten.flatten.toSeq == cb2b.flatten.flatten.toSeq,
      "identical input + seeds must reproduce identical codebooks")
    assert(mse(cb2) <= mse(cb0), s"Lloyd worsened MSE: ${mse(cb0)} -> ${mse(cb2)}")
    assert(mse(cb2) < mse(cb0) * 0.95, "two Lloyd rounds should visibly tighten the codebook")
  }

  test("PqEncode/AdcScore: codegen == interpreter, codes bounded, ADC matches driver arithmetic") {
    val nrm = corpus.withColumn("nrm", sqrt(VectorOps.dot(col("e"), col("e"))))
    val cb = Similarity.trainPq(nrm, M, K, iters = 1)
    val dsub = cb(0)(0).length
    def codesOf(): Array[(Long, Seq[Int])] = corpus
      .select(col("vec_id"), VectorOps.pqEncode(col("e"), cb).as("c"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    val saved = Seq("spark.sql.codegen.fallback", "spark.sql.codegen.wholeStage",
      "spark.sql.codegen.factoryMode").map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val viaCodegen = codesOf()
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val viaInterp = codesOf()
      assert(viaCodegen.toSeq == viaInterp.toSeq, "PqEncode codegen != interpreter")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    val codes = codesOf()
    codes.foreach { case (id, cs) =>
      assert(cs.length == M && cs.forall(c => c >= 0 && c < K), s"bad codes for $id")
      // the assigned codeword is genuinely the argmin for each subspace
      val v = raw(id)
      cs.zipWithIndex.foreach { case (c, j) =>
        val sub = v.slice(j * dsub, (j + 1) * dsub)
        val dists = cb(j).map(cw => sub.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum)
        assert(dists(c) == dists.min, s"vec $id subspace $j: code $c not argmin")
      }
    }
  }

  test("PQ-ADC top-5 recalls most exact-L2 neighbors at 16x compression") {
    val got = Similarity.pqTopK(spark, sf, M, K, iters = 2, topK = 5).collect()
    val byQ = got.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    def exactTop5(qid: Long): Set[Long] = {
      val qv = raw(qid)
      raw.iterator.filter(_._1 != qid).map { case (id, v) =>
        (id, qv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.toSeq.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }
    val overlaps = byQ.map { case (q, rows) =>
      assert(rows.length == 5, s"query $q must get 5 ranked neighbors")
      val dists = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b }, s"ascending adist for $q")
      rows.map(_.getAs[Long]("neighbor_id")).toSet.intersect(exactTop5(q)).size
    }
    val recall = overlaps.sum.toDouble / (overlaps.size * 5)
    assert(recall >= 0.4, s"PQ top-5 recall $recall below 0.4 — codebook quality regressed")
  }

  test("shortlist architecture: the exact nearest neighbor survives into the ADC top-20") {
    // production PQ is shortlist-then-rerank: ADC narrows to R
    // candidates, exact distances re-rank them. The property that
    // makes that correct is nearest-neighbor containment in the
    // shortlist, not ADC's own top-5 fidelity.
    val shortlist = Similarity.pqTopK(spark, sf, M, K, iters = 2, topK = 20).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }
    def exactTop1(qid: Long): Long = {
      val qv = raw(qid)
      raw.iterator.filter(_._1 != qid).map { case (id, v) =>
        (id, qv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.minBy { case (id, d) => (d, id) }._1
    }
    val hit = shortlist.count { case (q, ids) => ids.contains(exactTop1(q)) }
    val rate = hit.toDouble / shortlist.size
    assert(rate >= 0.8, s"exact NN reached the ADC top-20 for only $rate of queries")
  }

  test("composed IVF+PQ+rerank: the cell-restricted cosine NN survives to the final top-5") {
    // driver-side replay of the IVF restriction (q44's contract:
    // centroids = vec_id % 31 = 7, cosine argmax with lowest-id
    // tie-break, nprobe=3): the composition's own contribution — ADC
    // shortlist + exact rerank INSIDE the probed cells — is what this
    // test isolates; IVF recall itself is IvfSpec's property.
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cents = raw.filter(_._1 % 31 == 7).toSeq.sortBy(_._1)
    def cellOf(v: Array[Double]): Long =
      cents.foldLeft((Long.MinValue, Double.NegativeInfinity)) { case ((bid, bs), (cid, cv)) =>
        val s = cos(v, cv); if (s > bs) (cid, s) else (bid, bs)
      }._1
    val cellIndex: Map[Long, Long] = raw.map { case (id, v) => id -> cellOf(v) }
    val queries = raw.keys.filter(_ % 25 == 0).toSeq
    def probed(q: Long): Set[Long] = cents
      .map { case (cid, cv) => (cid, cos(raw(q), cv)) }
      .sortBy { case (cid, s) => (-s, cid) }.take(3).map(_._1).toSet

    val got = Similarity.ivfPqTopK(spark, sf, M, K, iters = 2).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) => q -> rows.sortBy(_.getAs[Int]("rank")) }
    assert(got.keySet == queries.toSet, "every query must be answered")
    val hits = queries.count { q =>
      val cells = probed(q)
      val restricted = raw.iterator
        .filter { case (id, _) => id != q && cells.contains(cellIndex(id)) }
        .map { case (id, v) => (id, cos(raw(q), v)) }.toSeq
      restricted.nonEmpty && {
        val nn = restricted.minBy { case (id, s) => (-s, id) }._1
        val rows = got(q)
        val sims = rows.map(_.getAs[Double]("sim"))
        assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
          s"query $q: rerank must order by descending exact cosine")
        rows.map(_.getAs[Long]("neighbor_id")).contains(nn)
      }
    }
    val rate = hits.toDouble / queries.size
    assert(rate >= 0.75,
      s"cell-restricted NN reached the reranked top-5 for only $rate of queries")
  }

  test("composed IVF+SQ8+rerank (q149): the cell-restricted exact-L2 NN " +
      "survives to the final top-5, and the rerank orders by ascending " +
      "exact squared L2") {
    // driver-side replay of the IVF restriction (q44's contract), L2
    // flavor: the composition's own contribution — SQ8 shortlist +
    // exact rerank INSIDE the probed cells — is what this isolates;
    // SQ8 fidelity itself is q148's recall audit.
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cents = raw.filter(_._1 % 31 == 7).toSeq.sortBy(_._1)
    def cellOf(v: Array[Double]): Long =
      cents.foldLeft((Long.MinValue, Double.NegativeInfinity)) { case ((bid, bs), (cid, cv)) =>
        val s = cos(v, cv); if (s > bs) (cid, s) else (bid, bs)
      }._1
    val cellIndex: Map[Long, Long] = raw.map { case (id, v) => id -> cellOf(v) }
    val queries = raw.keys.filter(_ % 25 == 0).toSeq
    def probed(q: Long): Set[Long] = cents
      .map { case (cid, cv) => (cid, cos(raw(q), cv)) }
      .sortBy { case (cid, s) => (-s, cid) }.take(3).map(_._1).toSet

    CacheRegistry.releaseAll()
    val got = Similarity.ivfSq8TopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) => q -> rows.sortBy(_.getAs[Int]("rank")) }
    assert(got.keySet == queries.toSet, "every query must be answered")
    val hits = queries.count { q =>
      val cells = probed(q)
      val restricted = raw.iterator
        .filter { case (id, _) => id != q && cells.contains(cellIndex(id)) }
        .map { case (id, v) => (id, l2(raw(q), v)) }.toSeq
      restricted.nonEmpty && {
        val nn = restricted.minBy { case (id, d) => (d, id) }._1
        val rows = got(q)
        val dists = rows.map(_.getAs[Double]("dist"))
        assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
          s"query $q: rerank must order by ascending exact squared L2")
        rows.map(_.getAs[Long]("neighbor_id")).contains(nn)
      }
    }
    val rate = hits.toDouble / queries.size
    // the rerank is EXACT, so the NN reaches the top-5 iff the SQ8
    // shortlist caught it — int8 decode error is tiny, expect ~all
    assert(rate >= 0.9,
      s"cell-restricted exact NN reached the reranked top-5 for only $rate")
    CacheRegistry.releaseAll()
  }

  test("oracled q82 (seed-codebook integer ADC) equals a full driver-side replay") {
    // independent reimplementation of the whole q82 pipeline in plain
    // Scala integer arithmetic — the same role check_oracle's DuckDB
    // run plays, but exercised in-suite at sf0.001
    val m = 8; val k = 16
    val ints: Map[Long, Array[Long]] =
      raw.map { case (id, v) => id -> v.map(x => math.floor(x * 1024.0).toLong) }
    val dsub = ints.head._2.length / m
    val seeds = ints.keys.toSeq
      .sortBy(id => ((id * 2654435761L) % 4294967296L, id)).take(k)
      .map(ints)
    val cb = Array.tabulate(m, k)((j, c) => seeds(c).slice(j * dsub, (j + 1) * dsub))
    def subDist(v: Array[Long], j: Int, c: Int): Long = {
      var acc = 0L; var i = 0
      while (i < dsub) { val d = v(j * dsub + i) - cb(j)(c)(i); acc += d * d; i += 1 }
      acc
    }
    def codesOf(v: Array[Long]): Array[Int] =
      Array.tabulate(m)(j => (0 until k).minBy(c => (subDist(v, j, c), c)))
    val codes = ints.map { case (id, v) => id -> codesOf(v) }
    val queries = ints.keys.filter(_ % 25 == 0).toSeq.sorted
    val expected = queries.flatMap { q =>
      val qv = ints(q)
      ints.keys.filter(_ != q).toSeq
        .map(x => (x, (0 until m).map(j => subDist(qv, j, codes(x)(j))).sum))
        .sortBy { case (x, a) => (a, x) }.take(5).zipWithIndex
        .map { case ((x, a), i) => (q, i + 1, x, a) }
    }.toSet
    val got = Similarity.pqAdcTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"q82 diverged from the driver replay: ${(got -- expected).take(3)} vs ${(expected -- got).take(3)}")
  }
}
