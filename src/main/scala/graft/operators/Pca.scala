package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PCA over the embedding corpus — the dim-reduction leg of the
  * embedding-ops ladder (q61 int8-quantizes, q82/q44 PQ/IVF-code;
  * this ROTATES): train a d×d orthonormal basis from the exact
  * covariance sufficient statistic (q126's Gram pass), then project
  * the corpus onto the top-r components as a map-only pass. The
  * standard uses in a training-data pipeline: cheaper ANN (project
  * then index — r·4 bytes/vec instead of d·4), whitening before
  * cosine, and redundant-dimension diagnosis (q118 per-dim; this is
  * the rotated view where redundancy concentrates in trailing
  * eigenvalues).
  *
  * Scale split — the same train/serve contract as the IVF/PQ tiers:
  *  - FIT is driver-sized: the only corpus-sized work is q126's
  *    single Gram pass (shuffle = #partitions · d²/2 rows); the d×d
  *    eigensolve (cyclic Jacobi, the textbook symmetric-matrix
  *    routine) runs on 64×64 doubles on the driver — model-sized,
  *    like the PQ codebook k-means.
  *  - PROJECT is map-only: means and basis ride the plan as literals;
  *    each row costs r dot products; no shuffle, no join
  *    (ClusteringSpec pins the Exchange-free plan).
  *
  * Floats (eigvecs) are engine-specific, so PCA is spec-verified
  * (ClusteringSpec: orthonormality, eigval/trace identity, component
  * variances ≈ eigvals, reconstruction-error ladder), not oracled —
  * the q41 sketch rule. The exact INPUT statistic (q126) is the
  * hash-matched part.
  */
object Pca {

  /** means/eigvals in original (un-fixed-point) units; `basis` rows
    * are the top-d principal axes, descending eigenvalue. */
  final case class PcaModel(
      n: Long,
      means: Array[Double],
      eigvals: Array[Double],
      basis: Array[Array[Double]]) {
    def varianceExplained(r: Int): Double = {
      val tot = eigvals.sum
      if (tot == 0.0) 0.0 else eigvals.take(r).sum / tot
    }
  }

  /** Fit from q126's exact covariance numerators: cov = (n·G − SᵢSⱼ)
    * / (n·(n−1)) descaled by Scale². The d²/2-row collect is the
    * model-sized driver load (2080 rows at d=64). */
  def fit(spark: SparkSession, dir: String): PcaModel = {
    val gm = Clustering.gramMatrixDecimal(spark, dir).collect()
    require(gm.nonEmpty, "empty corpus: no Gram statistic to fit PCA from")
    // the SAME cached per-dim (s, n) frame the Gram pass joined — the
    // means and n here cost zero extra corpus passes
    val ds = Clustering.dimStats(spark, dir).collect()
    val d = ds.iterator.map(_.getInt(0)).max + 1
    val n = ds.head.getLong(2)
    require(n >= 2, s"PCA covariance needs n >= 2 vectors, got $n")
    val s2 = Clustering.Scale.toDouble * Clustering.Scale.toDouble
    val cov = Array.ofDim[Double](d, d)
    gm.foreach { r =>
      val (i, j) = (r.getInt(1), r.getInt(0)) match {
        case (a, b) => (math.min(a, b), math.max(a, b))
      }
      val c = r.getDecimal(3).doubleValue() / (n.toDouble * (n - 1.0)) / s2
      cov(i)(j) = c; cov(j)(i) = c
    }
    val means = Array.ofDim[Double](d)
    ds.foreach(r => means(r.getInt(0)) =
      r.getDecimal(1).doubleValue() / n / Clustering.Scale)
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.zipWithIndex.sortBy(-_._1).map(_._2)
    PcaModel(n, means,
      order.map(vals(_)),
      order.map(k => Array.tabulate(d)(i => vecs(i)(k))))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix (Golub & Van
    * Loan §8.5) — rotations zero each off-diagonal pair until the
    * off-diagonal Frobenius mass is negligible. O(d³) per sweep,
    * ~8 sweeps at d=64: microseconds of driver time. Returns
    * (eigenvalues, eigenvector columns). */
  def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    val tol = 1e-22 * (0 until d).map(i => a(i)(i) * a(i)(i)).sum.max(1e-300)
    while (off() > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Map-only projection: (vec_id, y array<double> of length r).
    * Means and basis ride as model references inside the codegen'd
    * [[graft.functions.MatVecCentered]] kernel — one tight r·d loop
    * per row instead of r·d interpreted lambda calls; the fold order
    * is the same ascending i, so results are bit-identical to the
    * HOF ladder ([[projectHof]], the spec form ClusteringSpec pins). */
  def project(emb: DataFrame, model: PcaModel, r: Int): DataFrame =
    emb.select(col("vec_id"),
      graft.functions.VectorOps.matVecCentered(
        col("embedding"), model.means, model.basis.take(r)).as("y"))

  /** The declarative HOF spec of [[project]]. */
  private[graft] def projectHof(emb: DataFrame, model: PcaModel, r: Int): DataFrame = {
    val meansLit = typedLit(model.means.toSeq)
    val basisLit = typedLit(model.basis.take(r).map(_.toSeq).toSeq)
    emb
      .withColumn("xd", expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
      .withColumn("cx", zip_with(col("xd"), meansLit, (a, b) => a - b))
      .withColumn("y", transform(basisLit, bv =>
        aggregate(zip_with(col("cx"), bv, (a, b) => a * b),
          lit(0.0), (acc, p) => acc + p)))
      .select(col("vec_id"), col("y"))
  }

  // ------------------------------------------------- stored lifecycle

  /** Persist the fitted model as a [[FpIndex]] flat table — the same
    * manifest/generation-append/pinned-reader contract as every other
    * trained artifact (IVF quantizer, PQ codebook, centroids). Doubles
    * are stored as their IEEE-754 bit patterns (`doubleToRawLongBits`)
    * so the round-trip is BIT-exact — a served projection is therefore
    * byte-identical to the in-session one, not merely close. Layout
    * (kind, i, j, v): kind 0 = n; kind 1 = means (i=dim); kind 2 =
    * eigvals (i=rank); kind 3 = basis (i=rank, j=dim). d² + 2d + 1
    * rows at d=64: model-sized, like the PQ codebook. */
  def saveModel(spark: SparkSession, path: String, m: PcaModel): Unit = {
    import spark.implicits._
    def bits(x: Double): Long = java.lang.Double.doubleToRawLongBits(x)
    val rows =
      Seq((0, 0, 0, m.n)) ++
      m.means.indices.map(i => (1, i, 0, bits(m.means(i)))) ++
      m.eigvals.indices.map(i => (2, i, 0, bits(m.eigvals(i)))) ++
      m.basis.indices.flatMap(i =>
        m.basis(i).indices.map(j => (3, i, j, bits(m.basis(i)(j)))))
    FpIndex.saveOrRebuildFlat(spark, path,
      rows.toDF("kind", "i", "j", "v").repartition(1))
  }

  /** Reload the stored model (optionally pinned `asOf` a manifest
    * version — the interleaved-reader contract under a concurrent
    * nightly rebuild). */
  def loadModel(spark: SparkSession, path: String,
      asOf: Option[Int] = None): PcaModel = {
    val rows = FpIndex.loadFlat(spark, path, asOf)
      .select(col("kind"), col("i"), col("j"), col("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    require(rows.nonEmpty, s"no PCA model stored at $path")
    def of(kind: Int) = rows.filter(_._1 == kind)
    def dbl(v: Long): Double = java.lang.Double.longBitsToDouble(v)
    val n = of(0).head._4
    val means = of(1).sortBy(_._2).map(r => dbl(r._4))
    val eigvals = of(2).sortBy(_._2).map(r => dbl(r._4))
    val basis = of(3).groupBy(_._2).toArray.sortBy(_._1)
      .map { case (_, dims) => dims.sortBy(_._3).map(r => dbl(r._4)) }
    PcaModel(n, means, eigvals, basis)
  }

  /** Serve-side projection: reload the stored model and project the
    * ARRIVAL frame map-only (means/basis become plan literals, exactly
    * the in-session [[project]] plan) — zero corpus-sized work; the
    * nightly [[graft.pipeline.IndexBuild]] job paid the Gram pass. */
  def projectStored(spark: SparkSession, path: String, emb: DataFrame,
      r: Int, asOf: Option[Int] = None): DataFrame =
    project(emb, loadModel(spark, path, asOf), r)

  // ------------------------------------------------ the ANN consumer

  /** The ROTATED corpus in [[Similarity]]'s (vec_id, e, nrm) vector
    * shape — rank-r doubles instead of the 64 input dims. Deliberately
    * NOT centered: an orthogonal rotation preserves dot products and
    * norms exactly, so at r = d the rotated index reproduces full-dim
    * cosine ranking bit-for-near-bit, and truncating to r < d
    * approximates it with error bounded by the discarded spectral
    * mass. (Centering — the [[project]] surface, right for
    * MSE/whitening — SHIFTS cosine and would make the projected index
    * chase different neighbors than the full-dim truth.) Zero-norm
    * rows are dropped, [[graft.functions.NearestCell]]'s non-NaN
    * precondition. */
  def projectedVectors(emb: DataFrame, model: PcaModel, r: Int): DataFrame =
    emb.select(col("vec_id"),
        graft.functions.VectorOps.matVecCentered(col("embedding"),
          Array.fill(model.means.length)(0.0), model.basis.take(r)).as("e"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorOps.dot(col("e"), col("e"))))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), col("e"), col("nrm"))

  /** CHEAPER ANN, measured — the claim in this file's header made a
    * number: project to rank r, then run the SAME IVF plan
    * ([[Similarity.ivfTopKWith]]: quantizer from the projected
    * corpus, cell-probed candidates, exact re-rank in r-dim space)
    * and score its top-k against the FULL-dim exact top-k
    * ([[Similarity.cosineTopK]]). Each row of the result is one rank:
    * (r, n_hits, n_exact, recall_ppm). The serving win is linear in
    * d/r — every distance in assignment, probe, and re-rank costs r
    * multiplies instead of d — so recall vs r IS the cost/quality
    * frontier of the projected index. */
  def pcaIvfRecall(spark: SparkSession, dir: String, model: PcaModel,
      ranks: Seq[Int], nprobe: Int = 3, k: Int = 3): DataFrame = {
    val exact = graft.CacheRegistry.getOrCache(spark, s"similarity.exactTopk:$dir")(
        Similarity.cosineTopK(spark, dir)
          .select(col("q_id"), col("rank"), col("neighbor_id")))
      .filter(col("rank") <= k).select(col("q_id"), col("neighbor_id"))
    val emb = Tables.embeddings(spark, dir)
    ranks.map { r =>
      val tier = Similarity.ivfTopKWith(projectedVectors(emb, model, r),
        expr("vec_id % 25 = 0"), expr("vec_id % 31 = 7"), nprobe, k)
      val hits = tier.select(col("q_id"), col("neighbor_id"))
        .join(exact, Seq("q_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      val denom = exact.agg(count(lit(1)).as("n_exact"))
      hits.crossJoin(denom).select(
        lit(r).as("r"), col("n_hits"), col("n_exact"),
        expr("n_hits * 1000000 div n_exact").as("recall_ppm"))
    }.reduce(_ unionAll _)
  }

  /** Distributed reconstruction MSE at rank r — the end-to-end audit
    * that the basis really is the least-squares-optimal rank-r
    * subspace: mean over the corpus of ‖x − (μ + Vᵀy)‖². One
    * map-only pass (project + reconstruct fused), one scalar agg. */
  def reconstructionMse(emb: DataFrame, model: PcaModel, r: Int): Double = {
    val meansLit = typedLit(model.means.toSeq)
    val basisLit = typedLit(model.basis.take(r).map(_.toSeq).toSeq)
    emb
      .withColumn("basis_l", basisLit)
      .withColumn("xd", expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
      .withColumn("cx", zip_with(col("xd"), meansLit, (a, b) => a - b))
      .withColumn("y", transform(col("basis_l"), bv =>
        aggregate(zip_with(col("cx"), bv, (a, b) => a * b),
          lit(0.0), (acc, p) => acc + p)))
      // residual = cx - Σ_c y_c · basis_c, accumulated component-wise
      .withColumn("res", expr(
        """aggregate(
          |  zip_with(y, basis_l, (yc, bv) -> transform(bv, e -> yc * e)),
          |  cx,
          |  (acc, contrib) -> zip_with(acc, contrib, (a, b) -> a - b))""".stripMargin))
      .withColumn("err", aggregate(col("res"), lit(0.0), (acc, e) => acc + e * e))
      .agg(avg(col("err")).as("mse"))
      .collect()(0).getDouble(0)
  }
}
