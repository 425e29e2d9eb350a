package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding-space CLUSTERING for corpus curation — the family the
  * ladder was missing between per-pair dedup (q35/q57) and global
  * monitors (q89/q118): partition the corpus into k geometric cells
  * once, then use the cells as the blocking structure for
  * cluster-local work (SemDeDup-style pruning, diversity sampling,
  * per-cluster profiling).
  *
  * Everything here is ENGINE-PORTABLE by construction, the same
  * discipline as the KMV/CMS sketches (Extended.scala): embeddings
  * are quantized to FIXED-POINT BIGINT (`floor(x · 2^20)` — float→
  * double widening is exact and `floor` of an exact double is
  * deterministic on any IEEE engine), so every distance, centroid
  * sum, and floor-divided centroid component is integer arithmetic
  * with identical results in Spark and DuckDB — k-means, normally
  * hopeless to oracle across engines (float summation order), becomes
  * hash-matchable. Integer `div`/`%` truncate toward zero in both
  * engines (verified: DuckDB `-7 // 2 = -3`, Spark `-7 div 2 = -3`),
  * so the quantized-centroid update `s div n` is portable too.
  *
  * Scale shape (the 100 TB contract):
  *  - ASSIGNMENT is map-only: the k centroids ride the plan as an
  *    array literal (model-sized, the driver-resident-quantizer
  *    pattern of [[Similarity]]'s IVF tier), so each Lloyd pass is
  *    one projection over the corpus — no join, no shuffle.
  *  - The UPDATE step shuffles only k·d partially-aggregated rows
  *    per partition (groupBy(cluster, dim) with map-side combine),
  *    then collects k·d values (512 here) to the driver — the
  *    model-sized collect every published distributed Lloyd uses.
  *  - Cluster-local pairing (SemDeDup) is an equi-join on the cluster
  *    id — the blocked candidate generator, same family as LSH
  *    banding: k scales with n (k ≈ n / target cell size) so the
  *    per-cell pair count stays bounded; no all-pairs join exists.
  *
  * Literature: Lloyd's algorithm; SemDeDup (Abbas et al. 2023,
  * arXiv:2303.09540) prunes semantic duplicates inside k-means
  * clusters of embedding space exactly this way.
  */
object Clustering {

  /** Fixed-point scale: 2^20. Components are |x| ≲ 0.53, so scaled
    * values are ≲ 6e5, squared ≲ 4e11, and a 64-dim squared distance
    * ≲ 3e13 — comfortably BIGINT at any corpus size (distances are
    * per-pair, not summed over the corpus). */
  val Scale: Long = 1L << 20

  val K = 8
  val Iters = 2

  /** The SemDeDup operating point: k grows with the corpus so the
    * mean cell size stays fixed (Abbas et al. 2023 run 50k clusters
    * over LAION-440M for exactly this reason). With k ≈ n / cell the
    * blocked pair join is Σ|cell|² ≈ n · cell — LINEAR in n at fixed
    * cell size — and the join key has k distinct values, so the
    * exchange fans out with the corpus instead of hot-spotting on a
    * constant number of partitions. The fixtures keep K=8 for the
    * oracle (the unrolled CTE is k-independent only in structure, not
    * cost); scale deployments call the `k`-threaded entry points with
    * this rule. */
  val TargetCellSize = 1000

  def kForCorpus(n: Long, targetCellSize: Int = TargetCellSize): Int =
    // clamp BEFORE the narrowing: n / cell can exceed Int.MaxValue at
    // extreme corpus sizes, where a bare .toInt wraps negative and a
    // downstream trainCentroids would see a nonsense k
    math.max(1, math.min(math.min(n, n / math.max(1, targetCellSize)),
      Int.MaxValue.toLong).toInt)

  /** SemDeDup prune threshold in fixed-point squared-L2 units.
    * Calibrated on the fixture distance distribution: the closest
    * 0.1% of all pairs sit below ~1.37e12 (min 1.07e12, median
    * 2.2e12), so 1.3e12 isolates the genuinely-duplicate tail. */
  val PruneT: Long = 1300000000000L

  /** DuckDB spells the HOF `list_transform`; Spark spells it
    * `transform`. Same lambda body — float→double is exact, floor of
    * an exact double is deterministic — so both produce identical
    * BIGINT vectors. */
  private def fixDuck(inner: String): String =
    s"list_transform($inner, v -> CAST(floor(CAST(v AS DOUBLE) * $Scale) AS BIGINT))"

  /** Column-level fixed-point quantizer — the one definition every
    * entry point (batch, serve, streaming) shares so the integer
    * vectors can never drift between surfaces. Runs the codegen'd
    * [[graft.functions.QuantizeFixed]] kernel; [[quantizeHof]] is the
    * executable HOF spec ClusteringSpec pins it against. */
  def quantize(c: Column): Column =
    graft.functions.FixedPointOps.quantizeFixed(c, Scale)

  /** The declarative spec of [[quantize]] — per-element
    * floor(double(v)·2^20), the formulation the DuckDB oracle runs. */
  private[graft] def quantizeHof(c: Column): Column =
    transform(c, v => floor(v.cast("double") * lit(Scale.toDouble)).cast("long"))

  /** (vec_id, x array<bigint>, label) — the quantized corpus. */
  def fixedPoint(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("x"), col("label"))

  /** Map-only nearest-centroid assignment: the k centroid vectors are
    * an array-of-arrays literal, and the argmin is the codegen'd
    * [[graft.functions.NearestOfL2]] kernel — min dist, ties to the
    * smaller cid, one projection, zero shuffle. (The HOF spec form —
    * `array_min(transform(cents, struct(Σ(a−b)², cid)))` — lives in
    * ClusteringSpec, which pins kernel ≡ HOF; the interpreted lambdas
    * cost k·d calls per ROW, the q43/q52 trap.) */
  def assignWith(v: DataFrame, cents: Seq[Array[Long]]): DataFrame = {
    val cc = typedLit(cents.map(_.toSeq))
    v.withColumn("asg", graft.functions.FixedPointOps.nearestOfL2(col("x"), cc))
      .withColumn("cluster", col("asg.cid"))
      .withColumn("dist", col("asg.dist"))
      .drop("asg")
  }

  /** One Lloyd update: element-wise centroid sums via posexplode →
    * groupBy(cluster, dim) (map-side combined; k·d rows reach the
    * driver), floor-divided to quantized integer centroids; a cluster
    * that lost every member keeps its previous centroid.
    *
    * The component sums run in DECIMAL(38,0): a BIGINT Σxᵢ wraps
    * silently once a cell holds ≳1.5e13 members (|x| ≲ 6e5 scaled) —
    * far beyond tested scale but exactly where an engine must not
    * diverge from an exact-arithmetic oracle (the q126/q101 widening
    * rule). BigInt `/` truncates toward zero like Long `/`, DuckDB
    * `//`, and Spark `div`, so the quantized quotient stays portable. */
  private def updateCentroids(
      assigned: DataFrame, prev: Seq[Array[Long]]): Seq[Array[Long]] = {
    val rows = assigned.select(col("cluster"), posexplode(col("x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("col").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (BigInt(r.getDecimal(2).toBigInteger), r.getLong(3))))
      .toMap
    prev.indices.map { cid =>
      if (rows.contains((cid, 0)))
        prev(cid).indices.map { d =>
          val (s, n) = rows((cid, d))
          (s / n).toLong // BigInt division truncates toward zero == div == //
        }.toArray
      else prev(cid)
    }
  }

  /** Train the k-centroid model with the ID-SEEDED init: the k
    * smallest vec_ids seed — the deterministic init an oracle CTE can
    * reproduce, which is why every oracled query (q124–q134) and the
    * nightly build's stored model use it. It is geometry-blind;
    * production deployments that want a better starting partition use
    * [[trainCentroidsSeeded]] with [[seedsKmeansParallel]] — the
    * derandomized k-means‖ init (identical iteration structure,
    * spec-measured at-or-below this init's inertia on the fixture).
    * Each pass = one map-only assignment + one k·d-row update; the
    * model is k·d longs. */
  def trainCentroids(
      v: DataFrame, k: Int = K, iters: Int = Iters): Seq[Array[Long]] = {
    val seeds = v.orderBy(col("vec_id")).limit(k)
      .select(col("x")).collect()
      .map(_.getSeq[Long](0).toArray).toSeq
    trainCentroidsSeeded(v, seeds, iters)
  }

  /** [[trainCentroids]] over the dir-cached corpus, MEMOIZED per
    * (session, dir, k, iters) in [[graft.ModelRegistry]] — the
    * clustering queries' shared frozen model. Before this seam every
    * flat-model query (q124/q125/q132/q133/q142-q144…) re-ran the
    * identical Lloyd training per invocation; now one query family
    * trains once per release scope. Bit-identical to calling
    * [[trainCentroids]] directly (same corpus frame, same
    * arithmetic) — memoization only removes repetition. The corpus
    * frame is fetched before entering the model memo (the natural
    * data order; since the registries build under per-key latches it
    * is no longer a lock-order requirement). */
  def centroidsFor(spark: SparkSession, dir: String,
      k: Int = K, iters: Int = Iters): Seq[Array[Long]] = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    graft.ModelRegistry.getOrCompute(spark, s"clustering.cents:$dir:$k:$iters")(
      trainCentroids(v, k, iters))
  }

  /** [[trainHierarchical]] over the dir-cached corpus, memoized like
    * [[centroidsFor]] — q130–q141 all train this identical model. */
  def hierModelFor(spark: SparkSession, dir: String,
      k: Int = HierK, iters: Int = Iters): HierModel = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    graft.ModelRegistry.getOrCompute(spark, s"clustering.hier:$dir:$k:$iters")(
      trainHierarchical(v, k, iters))
  }

  /** The Lloyd iteration structure with the init swapped out — the
    * seam [[trainCentroids]] (id seeds, the oracle init) and the
    * k-means‖ production init share, so changing the seeding can
    * never change the update arithmetic. */
  def trainCentroidsSeeded(
      v: DataFrame, seeds: Seq[Array[Long]], iters: Int = Iters): Seq[Array[Long]] = {
    require(seeds.nonEmpty, "empty corpus: no k-means seeds")
    // iters-1 update rounds; the final assignment is the caller's
    (1 until iters).foldLeft(seeds) { (c, _) => updateCentroids(assignWith(v, c), c) }
  }

  /** Deterministic k-means‖ seeding — the PRODUCTION init (Bahmani et
    * al. 2012, arXiv:1203.6402), derandomized: `rounds` oversampling
    * passes each draw `l` candidates with probability ∝ d² to the
    * current seed set, then the candidate set reduces to k on the
    * driver under corpus-mass weights. Every stochastic choice uses
    * the Knuth-hash uniform (the q42/q113 determinism precedent), so
    * seeding is reproducible AND partition-invariant:
    *
    *  - the d²-weighted draw is PRIORITY SAMPLING (q113's estimator):
    *    u = (pmod(hash(vec_id·φ + round), 2²⁰)+1)/2²⁰ ∈ (0,1],
    *    priority = d²/u, take the l largest by (priority, vec_id) —
    *    one TakeOrdered per round, driver-bounded at l rows;
    *  - candidate weights = corpus members nearest each candidate
    *    (one map-only assignment + k-key count — the standard
    *    k-means‖ reduction weights);
    *  - the driver reduction is greedy weighted farthest-first then
    *    `reduceIters` weighted integer Lloyd rounds over the
    *    ≤ 1+rounds·l candidates (BigInt scores — w·d² overflows
    *    Long), truncate-toward-zero means like every other centroid
    *    update here.
    *
    * Cost: rounds+1 map-only corpus passes over ≤ 1+rounds·l
    * centroids — O(n·rounds·l·d), the published k-means‖ shape. The
    * oracled queries keep id seeding ([[trainCentroids]] scaladoc). */
  def seedsKmeansParallel(v: DataFrame, k: Int, rounds: Int = 3,
      oversample: Int = 0): Seq[Array[Long]] = {
    val l = if (oversample > 0) oversample else 2 * k
    val first = v.orderBy(col("vec_id")).limit(1)
      .select(col("x")).collect()
    require(first.nonEmpty, "empty corpus: no k-means|| seeds")
    var cands: Seq[Array[Long]] = Seq(first(0).getSeq[Long](0).toArray)
    for (r <- 1 to rounds) {
      val drawn = assignWith(v, cands)
        .withColumn("u",
          (pmod(hash(col("vec_id") * lit(2654435761L) + lit(r)), lit(1048576)) + 1)
            .cast("double") / lit(1048576.0))
        .withColumn("priority", col("dist").cast("double") / col("u"))
        .orderBy(col("priority").desc, col("vec_id"))
        .limit(l)
        .select(col("x")).collect().map(_.getSeq[Long](0).toArray)
      cands = cands ++ drawn
    }
    // an already-chosen vector has d² = 0 → priority 0, so repeats only
    // arise on degenerate all-duplicate cells — dedup by content
    val uniq = cands.map(_.toSeq).distinct.map(_.toArray)
    val wts = assignWith(v, uniq)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n")).collect()
      .map(row => row.getInt(0) -> row.getLong(1)).toMap
    reduceWeighted(uniq, uniq.indices.map(i => wts.getOrElse(i, 0L)), k)
  }

  /** Driver-side weighted reduction of the k-means‖ candidate set to
    * k: greedy farthest-first (weight-scaled, the k-center warm
    * start) + weighted integer Lloyd over the candidates. All BigInt
    * scoring; deterministic (ties to the smaller candidate index). */
  private def reduceWeighted(cands: Seq[Array[Long]], w: Seq[Long], k: Int,
      reduceIters: Int = 3): Seq[Array[Long]] = {
    if (cands.length <= k) return cands
    def d2l(a: Array[Long], b: Array[Long]): BigInt = {
      var s = BigInt(0); var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += BigInt(d) * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer[Int](
      w.indices.minBy(i => (-w(i), i))) // heaviest candidate, ties to smaller
    while (chosen.size < k) {
      val next = cands.indices.filterNot(chosen.contains)
        .minBy { i =>
          val dmin = chosen.iterator.map(j => d2l(cands(i), cands(j))).min
          (-(dmin * w(i)), i) // max weighted spread, ties to smaller
        }
      chosen += next
    }
    var centers: Seq[Array[Long]] = chosen.map(cands(_)).toSeq
    for (_ <- 1 to reduceIters) {
      val groups = cands.indices.groupBy { i =>
        centers.indices.minBy(c => (d2l(cands(i), centers(c)), c))
      }
      centers = centers.indices.map { c =>
        groups.get(c).filter(_.exists(i => w(i) > 0)) match {
          case Some(members) =>
            val tw = members.map(i => BigInt(w(i))).sum
            cands.head.indices.map { d =>
              (members.map(i => BigInt(w(i)) * cands(i)(d)).sum / tw).toLong
            }.toArray
          case None => centers(c) // keep-if-emptied, as everywhere else
        }
      }
    }
    centers
  }

  // --------------------------------------------------------------- q124

  /** q124: K-MEANS ASSIGNMENT — 2-iteration fixed-point Lloyd, k=8,
    * seeded by the k smallest vec_ids. Output is the per-vector
    * (cluster, squared-distance) map the downstream cluster-local
    * operators (q125, diversity sampling, per-cluster health) key on.
    * Integer-exact end to end, so the DuckDB oracle hash-matches the
    * full unrolled iteration. */
  def kmeansAssign(spark: SparkSession, dir: String): DataFrame =
    kmeansAssignK(spark, dir, K)

  /** The k-threaded assignment entry point — scale deployments pass
    * `k = kForCorpus(n)` so cells stay bounded as the corpus grows;
    * the oracled q124 pins k = [[K]]. */
  def kmeansAssignK(spark: SparkSession, dir: String, k: Int,
      iters: Int = Iters): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val cents = centroidsFor(spark, dir, k, iters)
    assignWith(v, cents).select(col("vec_id"), col("cluster"), col("dist"))
  }

  /** Shared CTE prefix: quantize → seed → assign → update → assign,
    * the same unrolled iteration the Spark side runs. `k`-threaded so
    * the hierarchical oracle (q130) can reuse it as its coarse level. */
  private def kmeansCteK(k: Int): String =
    s"""v AS (
       |  SELECT vec_id, ${fixDuck("embedding")} AS x, label FROM embeddings),
       |seeds AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, x AS cv
       |  FROM (SELECT vec_id, x FROM v ORDER BY vec_id LIMIT $k)),
       |d1 AS (
       |  SELECT v.vec_id, v.x, v.label, s.cid,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(generate_series(1, 64),
       |             i -> (v.x[i] - s.cv[i]) * (v.x[i] - s.cv[i]))),
       |           (a, b) -> a + b) AS dist
       |  FROM v CROSS JOIN seeds s),
       |a1 AS (
       |  SELECT vec_id, x, label, cid, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d1) WHERE rn = 1),
       |u1 AS (
       |  SELECT cid, i, sum(x[i]) AS s, count(*) AS n
       |  FROM a1 CROSS JOIN generate_series(1, 64) AS t(i)
       |  GROUP BY cid, i),
       |c1 AS (
       |  SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY i) AS cv
       |  FROM u1 GROUP BY cid),
       |cf AS (
       |  SELECT s.cid, coalesce(c1.cv, s.cv) AS cv
       |  FROM seeds s LEFT JOIN c1 ON s.cid = c1.cid),
       |d2 AS (
       |  SELECT v.vec_id, v.x, v.label, c.cid,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(generate_series(1, 64),
       |             i -> (v.x[i] - c.cv[i]) * (v.x[i] - c.cv[i]))),
       |           (a, b) -> a + b) AS dist
       |  FROM v CROSS JOIN cf c),
       |a2 AS (
       |  SELECT vec_id, x, label, cid, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d2) WHERE rn = 1)""".stripMargin

  private val kmeansCte: String = kmeansCteK(K)

  val kmeansAssignSql: String =
    s"""WITH $kmeansCte
       |SELECT vec_id, cid AS cluster, dist FROM a2""".stripMargin

  // --------------------------------------------------------------- q125

  /** q125: SEMDEDUP PRUNE — semantic near-duplicate pruning INSIDE
    * k-means cells (Abbas et al. 2023): a vector is pruned when a
    * smaller-id vector in the SAME cluster sits within [[PruneT]]
    * squared-L2. The cluster id is the blocking key — the pair join
    * is an equi-join on `cluster`, so the candidate count is
    * Σ|cell|², bounded by choosing k ≈ n / target cell size, never
    * all-pairs. Output: per-vector verdict (kept + how many
    * smaller-id near-dups were found), so rows are corpus-sized and
    * threshold-independent. */
  def semdedupPrune(spark: SparkSession, dir: String): DataFrame =
    semdedupPruneK(spark, dir, K)

  /** The k-threaded prune — at scale pass `k = kForCorpus(n)` so the
    * blocked pair join stays Σ|cell|² ≈ n · targetCellSize (linear in
    * n; SoakCluster's fixed-cell-size row measures exactly this).
    * The oracled q125 pins k = [[K]]. */
  def semdedupPruneK(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val asg = kmeansAssignK(spark, dir, k)
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    semdedupPruneOf(asg.join(v.select(col("vec_id"), col("x")), Seq("vec_id")))
  }

  /** The prune core over an assigned frame (vec_id, x, cluster) —
    * the seam ClusteringSpec drives with planted duplicates. */
  def semdedupPruneOf(withVec: DataFrame, pruneT: Long = PruneT): DataFrame = {
    val a = withVec.select(col("vec_id").as("a_id"), col("x").as("ax"),
      col("cluster").as("a_cl"))
    val b = withVec.select(col("vec_id").as("b_id"), col("x").as("bx"),
      col("cluster").as("b_cl"))
    val d2 = graft.functions.FixedPointOps.sqDistL2(col("ax"), col("bx"))
    b.join(a,
        col("a_cl") === col("b_cl") && col("a_id") < col("b_id") && d2 < lit(pruneT),
        "left")
      .groupBy(col("b_id").as("vec_id"), col("b_cl").as("cluster"))
      .agg(count(col("a_id")).as("n_close_smaller"))
      .select(col("vec_id"), col("cluster"),
        col("n_close_smaller"),
        (col("n_close_smaller") === 0).cast("int").as("kept"))
  }

  /** HOT-CELL-capped prune — the mega-cell guard every other blocked
    * candidate generator in this library carries (q18/q56's bucket
    * caps, q19's maxDf): a degenerate cluster (all-zero embeddings, a
    * template-collapsed crawl) makes one cell's |cell|² dominate the
    * pair join no matter how k was chosen. Cells whose population
    * exceeds `maxCell` are EXCLUDED from pairing — their members come
    * back kept=1 / n_close_smaller=0 with `cell_capped = 1`, the
    * retention-safe verdict (never false-prune on unadjudicated
    * cells) plus the explicit flag the pipeline escalates on
    * (sub-cluster that cell: train a finer model inside it, the
    * [[trainHierarchical]] fine step applied locally). The cell-size
    * frame is k rows, broadcast. The oracled q125 stays uncapped
    * (fixture cells are bounded by construction); this is the
    * deployment knob, spec-verified with a planted mega-cell.
    *
    * A cap ≤ 0 means EVERY cell is over cap (all rows kept + flagged,
    * nothing paired) — the same verdict the q134 oracle's relational
    * form evaluates to on degenerate input (9n/8k floors to 0 for
    * n < 8k/9), so the engines agree on ALL inputs instead of Spark
    * throwing where DuckDB answers. */
  def semdedupPruneCapped(withVec: DataFrame, maxCell: Int,
      pruneT: Long = PruneT): DataFrame = {
    val sizes = withVec.groupBy(col("cluster")).agg(count(lit(1)).as("cell_n"))
    val flagged = withVec.join(broadcast(sizes), Seq("cluster"))
    val ok = flagged.filter(col("cell_n") <= maxCell)
      .select(col("vec_id"), col("x"), col("cluster"))
    val capped = flagged.filter(col("cell_n") > maxCell)
    semdedupPruneOf(ok, pruneT)
      .withColumn("cell_capped", lit(0))
      .unionByName(capped.select(
        col("vec_id"), col("cluster"),
        lit(0L).as("n_close_smaller"), lit(1).as("kept"),
        lit(1).as("cell_capped")))
  }

  // --------------------------------------------------------------- q134

  /** q134's corpus-relative cap: 112.5% of the MEAN cell (9n/8k,
    * integer floor) — a cell is "hot" when it holds meaningfully more
    * than its fair share, the definition that scales with the corpus
    * instead of hard-coding a fixture size. */
  val CapNum = 9L; val CapDen = 8L

  /** q134: the HOT-CELL-CAPPED prune as an oracled query — the
    * deployment shape of q125 gated end to end: cells above the
    * corpus-relative cap skip pairing (members kept + flagged), cells
    * below prune exactly as q125 does. On the fixture the cap lands
    * between the mean and the top cells, so BOTH branches are
    * exercised and hash-matched. */
  def cappedSemdedup(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val asg = assignWith(v, centroidsFor(spark, dir))
      .select(col("vec_id"), col("x"), col("cluster"))
    val n = v.count() // one count over the cached frame — model-sized
    semdedupPruneCapped(asg, ((CapNum * n) / (CapDen * K)).toInt)
  }

  val cappedSemdedupSql: String =
    s"""WITH $kmeansCte,
       |tot AS (SELECT count(*) AS n FROM v),
       |sz AS (SELECT cid, count(*) AS cell_n FROM a2 GROUP BY cid),
       |ok AS (
       |  SELECT a2.vec_id, a2.x, a2.cid FROM a2
       |  JOIN sz ON sz.cid = a2.cid CROSS JOIN tot
       |  WHERE sz.cell_n <= ($CapNum * tot.n) // ($CapDen * $K)),
       |capped AS (
       |  SELECT a2.vec_id, a2.cid FROM a2
       |  JOIN sz ON sz.cid = a2.cid CROSS JOIN tot
       |  WHERE sz.cell_n > ($CapNum * tot.n) // ($CapDen * $K)),
       |pr AS (
       |  SELECT b.vec_id, b.cid AS cluster, count(a.vec_id) AS n_close_smaller
       |  FROM ok b LEFT JOIN ok a
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |   AND ${fdistDuck("a.x", "b.x")} < $PruneT
       |  GROUP BY b.vec_id, b.cid)
       |SELECT vec_id, cluster, n_close_smaller,
       |       CAST(n_close_smaller = 0 AS INT) AS kept,
       |       CAST(0 AS INT) AS cell_capped
       |FROM pr
       |UNION ALL
       |SELECT vec_id, cid AS cluster, CAST(0 AS BIGINT) AS n_close_smaller,
       |       CAST(1 AS INT) AS kept, CAST(1 AS INT) AS cell_capped
       |FROM capped""".stripMargin

  // --------------------------------------------------------------- q135

  /** q135's hot-cell rank: the cap is the ceil(3k/4)-smallest cell's
    * size (the 75th-percentile cell, ties broken by cluster id). */
  val PctRank: Int = (3 * K + 3) / 4

  /** q135: PERCENTILE-CAPPED SEMDEDUP PRUNE — the fixture-independent
    * companion of q134's mean-relative cap (round-12 verdict ask #4):
    * 9n/8k is the right PRODUCTION rule (a balanced corpus caps
    * nothing — exactly what happens at the sf1 mix, where q134's
    * capped branch is vacuous), but a correctness gate also needs a
    * rule whose BOTH branches run on any non-uniform fixture. The
    * percentile cap delivers that by construction: cells strictly
    * larger than the 75th-percentile cell are hot, so the top ≤ k/4
    * cells are capped whenever cell sizes are not all tied — at every
    * driver sf and at sf1. The cap derivation is a row_number over
    * the k-ROW size frame (model-sized; the single-value collect is
    * the same model-sized fetch as the centroid table). Prune
    * semantics, verdict shape, and the retention-safe capped verdict
    * are exactly q134's ([[semdedupPruneCapped]]). */
  def percentileCappedSemdedup(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val asg = assignWith(v, centroidsFor(spark, dir))
      .select(col("vec_id"), col("x"), col("cluster"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cell_n"), col("cluster"))
    val cap = asg.groupBy(col("cluster")).agg(count(lit(1)).as("cell_n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === PctRank)
      .select(col("cell_n")).collect()(0).getLong(0)
    semdedupPruneCapped(asg, cap.toInt)
  }

  val percentileCappedSemdedupSql: String =
    s"""WITH $kmeansCte,
       |sz AS (SELECT cid, count(*) AS cell_n FROM a2 GROUP BY cid),
       |cap AS (
       |  SELECT cell_n AS cap FROM (
       |    SELECT cell_n, row_number() OVER (ORDER BY cell_n, cid) AS rn FROM sz)
       |  WHERE rn = $PctRank),
       |ok AS (
       |  SELECT a2.vec_id, a2.x, a2.cid FROM a2
       |  JOIN sz ON sz.cid = a2.cid CROSS JOIN cap
       |  WHERE sz.cell_n <= cap.cap),
       |capped AS (
       |  SELECT a2.vec_id, a2.cid FROM a2
       |  JOIN sz ON sz.cid = a2.cid CROSS JOIN cap
       |  WHERE sz.cell_n > cap.cap),
       |pr AS (
       |  SELECT b.vec_id, b.cid AS cluster, count(a.vec_id) AS n_close_smaller
       |  FROM ok b LEFT JOIN ok a
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |   AND ${fdistDuck("a.x", "b.x")} < $PruneT
       |  GROUP BY b.vec_id, b.cid)
       |SELECT vec_id, cluster, n_close_smaller,
       |       CAST(n_close_smaller = 0 AS INT) AS kept,
       |       CAST(0 AS INT) AS cell_capped
       |FROM pr
       |UNION ALL
       |SELECT vec_id, cid AS cluster, CAST(0 AS BIGINT) AS n_close_smaller,
       |       CAST(1 AS INT) AS kept, CAST(1 AS INT) AS cell_capped
       |FROM capped""".stripMargin

  val semdedupPruneSql: String =
    s"""WITH $kmeansCte,
       |pr AS (
       |  SELECT b.vec_id, b.cid AS cluster, count(a.vec_id) AS n_close_smaller
       |  FROM a2 b LEFT JOIN a2 a
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |   AND list_reduce(list_prepend(CAST(0 AS BIGINT),
       |         list_transform(generate_series(1, 64),
       |           i -> (a.x[i] - b.x[i]) * (a.x[i] - b.x[i]))),
       |         (p, q) -> p + q) < $PruneT
       |  GROUP BY b.vec_id, b.cid)
       |SELECT vec_id, cluster, n_close_smaller,
       |       CAST(n_close_smaller = 0 AS INT) AS kept
       |FROM pr""".stripMargin

  // --------------------------------------------------------------- q126

  /** q126: EXACT GRAM / COVARIANCE MATRIX of the embedding corpus —
    * the d×d sufficient statistic behind PCA whitening, dim-reduction
    * for cheaper ANN, and redundant-dimension detection (q118 looks
    * at dims one at a time; this is the pairwise view). Fixed-point
    * BIGINT products summed in DECIMAL(38,0) — exact in any summation
    * order, so the one cross-engine hazard of a Gram matrix (float
    * accumulation order) is gone by construction; DECIMAL(38,0)
    * because at 1e9+ rows the Σxᵢxⱼ entries overflow BIGINT
    * (~3e11/row·n), same widening rule as q101's OLS moments.
    *
    * Scale shape: each row expands to its d(d+1)/2 = 2080
    * upper-triangle products inside ONE projection (nested transform
    * over a slice — no self-join, no explode-join), and the groupBy
    * (i, j) partial-aggregates map-side, so the shuffle is
    * #partitions · 2080 rows regardless of corpus size. The
    * covariance numerator n·G − sᵢsⱼ composes from the same pass plus
    * a 64-row per-dim sum frame. */
  /** Per-dim sufficient statistics (pos, s, n) — ONE posexplode
    * aggregate over the cached corpus, shared by every consumer: the
    * sᵢ/sⱼ joins in [[gramMatrixDecimal]] (aliased twice from this
    * cache entry, computed once), [[Pca.fit]]'s means, and the corpus
    * count n (every pos row carries it, so no separate count() pass
    * exists anywhere in the q126/PCA path). d rows: model-sized. */
  def dimStats(spark: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.getOrCache(spark, s"clustering.dimstats:$dir") {
      graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
          fixedPoint(spark, dir))
        .select(posexplode(col("x")))
        .groupBy(col("pos"))
        .agg(sum(col("col").cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"))
    }

  /** The exact statistic with DECIMAL(38,0) columns — the frame
    * [[Pca.fit]] consumes. Kept internal to the JVM surface: decimal
    * OUTPUT columns defeat the driver's raw-value hash (the q115
    * convention: DECIMAL for intermediates, strings/bounded BIGINT for
    * result surfaces), so the oracled q126 wraps this in a VARCHAR
    * cast ([[gramMatrix]]). */
  def gramMatrixDecimal(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    // the codegen'd UpperTriProducts kernel replaces the nested
    // transform-of-slices HOF (O(d²) slice copies + interpreted
    // lambdas per ROW — the q43/q52 trap); identical (i, j, p) triples
    // in identical row-major order
    val pairs = v.select(explode(
        graft.functions.FixedPointOps.upperTriProducts(col("x"))))
      .select(col("col.i").as("i"), col("col.j").as("j"),
        col("col.p").cast("decimal(38,0)").as("p"))
    val g = pairs.groupBy(col("i"), col("j")).agg(sum(col("p")).as("g"))
    // every dimStats row carries the corpus count, so the sᵢ join
    // delivers n too — no 1-row scalar cross join exists in this plan
    val dims = dimStats(spark, dir)
    g.join(broadcast(dims.select(col("pos").as("i"), col("s").as("si"),
        col("n").cast("decimal(38,0)").as("n"))), Seq("i"))
      .join(broadcast(dims.select(col("pos").as("j"), col("s").as("sj"))), Seq("j"))
      .select(col("i"), col("j"), col("g").cast("decimal(38,0)").as("g"),
        (col("n") * col("g") - col("si") * col("sj"))
          .cast("decimal(38,0)").as("cov_num"))
  }

  /** The oracled q126 surface: [[gramMatrixDecimal]] with the exact
    * integers emitted as STRINGS — DECIMAL(38,0) and DuckDB HUGEINT
    * render identical digit strings, so the values (already bit-exact)
    * also hash identically in the driver's raw-value gate. */
  def gramMatrix(spark: SparkSession, dir: String): DataFrame =
    gramMatrixDecimal(spark, dir)
      .select(col("i"), col("j"),
        col("g").cast("string").as("g"),
        col("cov_num").cast("string").as("cov_num"))

  val gramMatrixSql: String =
    s"""WITH v AS (
       |  SELECT vec_id, ${fixDuck("embedding")} AS x FROM embeddings),
       |g AS (
       |  SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       |         CAST(sum(CAST(v.x[i + 1] AS HUGEINT) * v.x[j + 1]) AS DECIMAL(38,0)) AS g
       |  FROM v
       |  CROSS JOIN generate_series(0, 63) AS ti(i)
       |  CROSS JOIN generate_series(0, 63) AS tj(j)
       |  WHERE j >= i GROUP BY i, j),
       |m AS (
       |  SELECT CAST(i AS INT) AS i, CAST(sum(CAST(x[i + 1] AS HUGEINT)) AS HUGEINT) AS s
       |  FROM v CROSS JOIN generate_series(0, 63) AS ti(i) GROUP BY i),
       |c AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM v)
       |SELECT g.i, g.j, CAST(g.g AS VARCHAR) AS g,
       |       CAST(c.n * CAST(g.g AS HUGEINT) - mi.s * mj.s AS VARCHAR) AS cov_num
       |FROM g CROSS JOIN c
       |JOIN m mi ON mi.i = g.i
       |JOIN m mj ON mj.i = g.j""".stripMargin

  // --------------------------------------------------------------- q127

  /** Per-cluster sample size for q127. */
  val SampleM = 10

  /** q127: CLUSTER-BALANCED DIVERSITY SAMPLE — the subsampling rule a
    * curation pass applies AFTER clustering: keep the m vectors per
    * cluster FARTHEST from their centroid (ties to the smaller id).
    * Equal-per-cell quota preserves coverage of embedding space
    * (cluster-balanced stratification), and ranking by distance keeps
    * the hard/diverse examples while dropping the most prototypical —
    * the SSL-prototypes pruning rule (Sorscher et al. 2022,
    * arXiv:2206.14486: pruning EASY/prototypical examples beats
    * random subsampling when data is abundant).
    *
    * Scale shape: the per-cluster top-m is `row_number ≤ m` over a
    * (cluster) window — Spark's WindowGroupLimit prunes it to a
    * per-partition m-heap before the shuffle (the q112 pattern), so
    * the exchange carries ≤ k·m·#partitions rows. k grows with the
    * corpus (k ≈ n / target cell size), so the window key fans out —
    * this is not a single-partition sort. */
  def diversitySample(spark: SparkSession, dir: String): DataFrame =
    diversitySampleK(spark, dir, K)

  /** k-threaded diversity sample (k = kForCorpus(n) at scale, m per
    * cell) — the oracled q127 pins k = [[K]], m = [[SampleM]]. */
  def diversitySampleK(spark: SparkSession, dir: String, k: Int,
      m: Int = SampleM): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("dist").desc, col("vec_id"))
    kmeansAssignK(spark, dir, k)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col("cluster"), col("rank"), col("vec_id"), col("dist"))
  }

  val diversitySampleSql: String =
    s"""WITH $kmeansCte,
       |r AS (
       |  SELECT cid AS cluster,
       |         CAST(row_number() OVER (PARTITION BY cid ORDER BY dist DESC, vec_id) AS INT) AS rank,
       |         vec_id, dist
       |  FROM a2)
       |SELECT cluster, rank, vec_id, dist FROM r WHERE rank <= $SampleM""".stripMargin

  // --------------------------------------------------------------- q129

  /** q129: CLUSTER PROFILE — the quality audit of the clustering
    * itself: per cell, the member count, the inertia mass (sum of
    * squared distances — which cells are tight vs diffuse), and the
    * dominant ground-truth label with its purity in basis points.
    * High-purity tight cells mean the embedding space (and hence
    * every cell-blocked operator: q125's prune, q127's sample, the
    * semantic ingest gate) respects the label structure; a diffuse
    * low-purity cell is where SemDeDup blocking leaks near-dups
    * across cells. The label contingency is the k-means sibling of
    * q117's kNN confusion audit.
    *
    * Scale: two aggregates over the assignment (k·|labels| and k
    * groups, both map-side combined), one broadcast-sized join. */
  def clusterProfile(spark: SparkSession, dir: String): DataFrame =
    clusterProfileK(spark, dir, K)

  /** k-threaded profile — the oracled q129 pins k = [[K]]. */
  def clusterProfileK(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val asg = assignWith(v, centroidsFor(spark, dir, k))
    val byLabel = asg.groupBy(col("cluster"), col("label")).count()
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("count").desc, col("label"))
    val dom = byLabel.withColumn("rn", row_number().over(wd))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("label").as("dom_label"), col("count").as("dom_n"))
    asg.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("inertia"))
      .join(broadcast(dom), Seq("cluster"))
      .select(col("cluster"), col("n_members"), col("inertia"),
        col("dom_label"), col("dom_n"),
        expr("(10000 * dom_n) div n_members").as("purity_bp"))
  }

  val clusterProfileSql: String =
    s"""WITH $kmeansCte,
       |bl AS (
       |  SELECT cid, label, count(*) AS c FROM a2 GROUP BY cid, label),
       |dom AS (
       |  SELECT cid, label AS dom_label, c AS dom_n FROM (
       |    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY c DESC, label) AS rn
       |    FROM bl) WHERE rn = 1),
       |pr AS (
       |  SELECT cid AS cluster, count(*) AS n_members,
       |         CAST(sum(dist) AS BIGINT) AS inertia
       |  FROM a2 GROUP BY cid)
       |SELECT cluster, n_members, inertia, dom_label, dom_n,
       |       (10000 * dom_n) // n_members AS purity_bp
       |FROM pr JOIN dom ON dom.cid = pr.cluster""".stripMargin

  // ---------------------------------------- two-level (hierarchical)

  /** Fixed-point squared L2 between two vector columns — the one
    * distance every assignment surface shares (codegen'd
    * [[graft.functions.SqDistL2]] kernel). */
  private def d2(x: Column, cv: Column): Column =
    graft.functions.FixedPointOps.sqDistL2(x, cv)

  /** Two-level k-means model: kc ≈ √k coarse centroids, and per
    * coarse cell up to `kf` fine centroids trained on that cell's
    * members alone. Global cell id = ccl · kf + fcl. */
  final case class HierModel(
      coarse: Seq[Array[Long]],
      fine: Seq[Seq[Array[Long]]],
      kf: Int)

  /** TWO-LEVEL Lloyd — the assignment-stage scale path when k grows
    * with the corpus. Flat nearest-centroid assignment costs O(n·k·d)
    * per pass; at the SemDeDup operating point (k ≈ n / cell) that is
    * QUADRATIC in n — the pair join the cells exist to bound stops
    * being the bottleneck and the clustering itself becomes one
    * (SoakCluster's train_assign_flat row measures exactly this).
    * The standard fix (the IVF coarse-quantizer pattern; SemDeDup
    * itself clusters with approximate GPU k-means at scale): train
    * √k coarse centroids on the corpus (O(n·√k)), freeze the coarse
    * partition, then train √k fine centroids INSIDE each coarse cell
    * — one distributed pass per Lloyd round over ALL cells at once
    * (the fine-centroid table rides the plan as a nested literal
    * indexed by the coarse id), Σ|cell|·√k = O(n·√k) total. Probing
    * is coarse-then-fine: 2√k distances per vector instead of k.
    *
    * The resulting cells approximate flat Lloyd (a vector near a
    * coarse boundary may land elsewhere) — which is exactly what
    * cell-BLOCKING consumers (SemDeDup prune, diversity sampling,
    * the semantic gate) need: any geometrically-coherent partition
    * of bounded cell size, not the Lloyd optimum. Everything stays
    * fixed-point integer, so the model is as portable and the
    * assignment as deterministic as the flat path's. */
  def trainHierarchical(v: DataFrame, k: Int = K, iters: Int = Iters): HierModel = {
    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val kf = math.max(1, math.ceil(k.toDouble / kc).toInt)
    val coarse = trainCentroids(v, kc, iters)
    // the coarse partition is FROZEN during fine training — the
    // hierarchical contract that keeps every fine pass one job
    val asgC = assignWith(v, coarse)
      .select(col("vec_id"), col("x"), col("cluster").as("ccl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ccl")).orderBy(col("vec_id"))
    val seedRows = asgC.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= kf)
      .select(col("ccl"), col("rn"), col("x")).collect()
      .map(r => (r.getInt(0), r.getInt(1) - 1, r.getSeq[Long](2).toArray))
    val fine0: Seq[Seq[Array[Long]]] = (0 until kc).map { c =>
      val s = seedRows.filter(_._1 == c).sortBy(_._2).map(_._3).toSeq
      // a coarse cell that captured no member seeds its one fine
      // centroid from the coarse centroid itself
      if (s.nonEmpty) s else Seq(coarse(c))
    }
    val fine = (1 until iters).foldLeft(fine0) { (f, _) => updateFine(asgC, f) }
    HierModel(coarse, fine, kf)
  }

  /** One distributed fine-Lloyd round over every coarse cell at once:
    * nested-literal probe (fines of OWN coarse cell only), then a
    * (ccl, fcl, dim)-keyed map-side-combined update — k·d rows to the
    * driver, the same model-sized collect as the flat update (DECIMAL
    * sums per [[updateCentroids]]'s widening rule). */
  private def updateFine(
      asgC: DataFrame, fine: Seq[Seq[Array[Long]]]): Seq[Seq[Array[Long]]] = {
    val finesLit = typedLit(fine.map(_.map(_.toSeq)))
    val rows = asgC
      .withColumn("fasg", graft.functions.FixedPointOps.nearestOfL2(
        col("x"), element_at(finesLit, col("ccl") + 1)))
      .select(col("ccl"), col("fasg.cid").as("fcl"), posexplode(col("x")))
      .groupBy(col("ccl"), col("fcl"), col("pos"))
      .agg(sum(col("col").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        (BigInt(r.getDecimal(3).toBigInteger), r.getLong(4))))
      .toMap
    fine.zipWithIndex.map { case (cents, c) =>
      cents.indices.map { f =>
        if (rows.contains((c, f, 0)))
          cents(f).indices.map { d =>
            val (s, n) = rows((c, f, d)); (s / n).toLong
          }.toArray
        else cents(f)
      }.toSeq
    }
  }

  /** Coarse-then-fine assignment: 2√k distances per vector (vs k for
    * flat), one projection, zero shuffle — the model rides the plan
    * as two literals. Output matches [[assignWith]]'s shape so every
    * blocking consumer ([[semdedupPruneOf]], the gate's assigned
    * corpus) takes it unchanged. */
  def assignHierarchical(v: DataFrame, m: HierModel): DataFrame = {
    val coarseLit = typedLit(m.coarse.map(_.toSeq))
    val finesLit = typedLit(m.fine.map(_.map(_.toSeq)))
    v.withColumn("casg",
        graft.functions.FixedPointOps.nearestOfL2(col("x"), coarseLit))
      .withColumn("ccl", col("casg.cid"))
      .withColumn("fasg", graft.functions.FixedPointOps.nearestOfL2(
        col("x"), element_at(finesLit, col("ccl") + 1)))
      .withColumn("cluster", col("ccl") * lit(m.kf) + col("fasg.cid"))
      .withColumn("dist", col("fasg.dist"))
      .drop("casg", "ccl", "fasg")
  }

  // ------------------------------------ fine model as DATA (round 13)

  /** Embedding dimensionality of the corpus tables (the 64 every CTE
    * unrolls); the fine-table size heuristics below count k·d longs. */
  val Dim = 64

  /** Ceiling for the fine table travelling as a PLAN LITERAL / driver
    * collect: k·d longs. 2²¹ longs = 16 MB — comfortably inside task
    * serialization. Beyond it the fine table is DATA
    * ([[HierModelDf]]): at the library's own operating point
    * (k = kForCorpus(n) ∝ n) a 10¹⁰-vector corpus makes k·d ≈ 6.4e8
    * longs ≈ 5 GB — a literal that size dies in task serialization
    * long before the compute does, which is why the joined path
    * exists. The COARSE table (√k·d) stays driver-resident at any
    * realistic scale — the IVF driver-resident-quantizer precedent
    * (√k = 8e4 at the 10¹⁰ point → 40 MB). */
  val FineLiteralMaxEntries: Long = 1L << 21

  /** Rows above which the joined path stops HINTING broadcast for the
    * fine table and lets the planner shuffle-join on `ccl` instead:
    * 2²⁰ fine rows ≈ 0.5 GB of (ccl, fcl, fv) — past executor-memory
    * comfort for a broadcast, fine for a shuffle join whose key (the
    * coarse cell id) has √k distinct values fanning out with the
    * corpus. */
  val FineBroadcastMaxRows: Long = 1L << 20

  /** Two-level model with the FINE half as a DataFrame — one row per
    * fine centroid, keyed on the coarse cell: (ccl INT, fcl INT,
    * fv ARRAY<BIGINT>). `kTotal` is the requested k (bounds the fine
    * row count; drives the literal-vs-joined dispatch). The coarse
    * table remains driver-resident ([[FineLiteralMaxEntries]]'s
    * scaladoc: √k·d is model-sized at any scale this library
    * targets). */
  final case class HierModelDf(
      coarse: Seq[Array[Long]],
      fine: DataFrame,
      kf: Int,
      kTotal: Int)

  /** The fine table of a driver-resident model as a frame — interop
    * seam (spec-pins joined ≡ literal on the same model; serve paths
    * that loaded a literal model can switch to the joined probe). */
  def fineFrameOf(spark: SparkSession, m: HierModel): DataFrame = {
    import spark.implicits._
    m.fine.indices.flatMap(c =>
        m.fine(c).indices.map(f => (c, f, m.fine(c)(f).toSeq)))
      .toDF("ccl", "fcl", "fv")
  }

  /** Collect a (bounded) frame model back to the literal form — the
    * threshold dispatch's small-k branch. Callers guard on
    * [[FineLiteralMaxEntries]]; the collect is k·d by construction. */
  def collectHierModel(m: HierModelDf): HierModel = {
    val rows = m.fine.select(col("ccl"), col("fcl"), col("fv")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val byC = rows.groupBy(_._1)
    val fine = m.coarse.indices.map { c =>
      byC.get(c) match {
        case Some(sub) => sub.sortBy(_._2).map(_._3).toSeq
        case None => Seq(m.coarse(c)) // mirror trainHierarchical's fallback
      }
    }
    HierModel(m.coarse, fine, m.kf)
  }

  /** Coarse-then-fine assignment with the fine model as DATA — the
    * scale path past [[FineLiteralMaxEntries]] (verdict r12 `weak`):
    * the coarse argmin stays one map (√k·d literal), then the fine
    * candidates arrive by EQUI-JOIN on the chosen coarse cell —
    * broadcast-hinted while the fine table is small
    * ([[FineBroadcastMaxRows]]), a shuffle join keyed on `ccl` (√k
    * distinct values, fanning out with the corpus) beyond — and ONE
    * argmin aggregate (min over struct(fdist, fcl, …): fdist first,
    * ties to the smaller fcl, exactly the literal path's NearestOfL2
    * rule; the remaining struct fields are carried columns, never
    * consulted because fcl is unique within a candidate set). Output
    * schema and values are IDENTICAL to [[assignHierarchical]]
    * (spec-pinned bit-exact), so every blocking consumer takes either
    * path unchanged. Cost per vector: √k coarse distances map-side +
    * kf candidate rows through one map-side-combined aggregate —
    * O(√k) work and O(√k) shuffled rows, with NO k·d task literal. */
  def assignHierarchicalJoined(v: DataFrame, m: HierModelDf): DataFrame = {
    val carry = v.columns.filterNot(_ == "vec_id")
    val coarseLit = typedLit(m.coarse.map(_.toSeq))
    val asgC = v.withColumn("ccl",
      graft.functions.FixedPointOps.nearestOfL2(col("x"), coarseLit).getField("cid"))
    val f = if (m.kTotal.toLong <= FineBroadcastMaxRows) broadcast(m.fine) else m.fine
    asgC.join(f, Seq("ccl"))
      .withColumn("fdist", d2(col("x"), col("fv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("fdist") +: col("fcl") +: col("ccl") +:
        carry.map(col): _*)).as("m"))
      .select(col("vec_id") +: carry.map(c => col(s"m.$c").as(c)) :+
        (col("m.ccl") * lit(m.kf) + col("m.fcl")).as("cluster") :+
        col("m.fdist").as("dist"): _*)
  }

  /** Threshold-dispatched assignment over a frame model: collect to
    * the zero-shuffle literal path while k·d fits task serialization,
    * the joined path beyond. */
  def assignHier(v: DataFrame, m: HierModelDf): DataFrame =
    if (m.kTotal.toLong * Dim <= FineLiteralMaxEntries)
      assignHierarchical(v, collectHierModel(m))
    else assignHierarchicalJoined(v, m)

  /** TWO-LEVEL Lloyd with the fine model as FRAMES end to end — the
    * training counterpart of [[assignHierarchicalJoined]]: no k·d
    * driver collect and no k·d plan literal anywhere in the fine
    * level. Seeding, every fine-Lloyd round, and the keep-if-emptied
    * rule run as joins/aggregates over the (ccl, fcl, fv) frame;
    * only the COARSE model (√k·d) is driver-resident, trained by the
    * same [[trainCentroids]] as the literal path. Spec-pinned to
    * produce the IDENTICAL model as [[trainHierarchical]] on the
    * fixture (same seeds by construction — first kf members per
    * coarse cell by vec_id, empty-cell fallback to the coarse
    * centroid — same DECIMAL-summed, truncate-toward-zero update).
    *
    * Lineage note: each round chains one join+aggregate onto the fine
    * frame; at the default iters=2 that is one update. Deployments
    * running many rounds should materialize the frame per round
    * (persist/checkpoint) — the frame is k rows, cheap to pin. */
  def trainHierarchicalFrames(v: DataFrame, k: Int = K, iters: Int = Iters): HierModelDf = {
    val spark = v.sparkSession
    import spark.implicits._
    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val kf = math.max(1, math.ceil(k.toDouble / kc).toInt)
    val coarse = trainCentroids(v, kc, iters)
    val asgC = assignWith(v, coarse)
      .select(col("vec_id"), col("x"), col("cluster").as("ccl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ccl")).orderBy(col("vec_id"))
    val seeds = asgC.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= kf)
      .select(col("ccl"), (col("rn") - 1).as("fcl"), col("x").as("fv"))
    // empty-coarse-cell fallback as a frame: cells with no member
    // seed one fine centroid from the coarse centroid itself
    val coarseDf = coarse.zipWithIndex.map { case (cv, ci) => (ci, cv.toSeq) }
      .toDF("ccl", "fv")
    val missing = coarseDf
      .join(seeds.select(col("ccl")).distinct(), Seq("ccl"), "left_anti")
      .select(col("ccl"), lit(0).as("fcl"), col("fv"))
    val fine0 = seeds.unionByName(missing)
    val fine = (1 until iters).foldLeft(fine0) { (f, _) => updateFineFrame(asgC, f) }
    HierModelDf(coarse, fine, kf, k)
  }

  /** One fine-Lloyd round, frames end to end: equi-join fine
    * candidates on the frozen coarse cell, one argmin aggregate, one
    * (ccl, fcl, dim)-keyed map-side-combined update (DECIMAL sums,
    * `div` truncating toward zero — [[updateCentroids]]'s arithmetic
    * exactly), reassembled to arrays and LEFT-joined back so an
    * emptied fine cell keeps its previous centroid. Shuffled rows:
    * n·kf candidates into the argmin, then k·d update rows — nothing
    * model-sized ever reaches the driver. */
  private def updateFineFrame(asgC: DataFrame, fine: DataFrame): DataFrame = {
    val asgF = asgC.join(fine, Seq("ccl"))
      .withColumn("fdist", d2(col("x"), col("fv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("fdist"), col("fcl"), col("ccl"), col("x"))).as("m"))
      .select(col("m.ccl").as("ccl"), col("m.fcl").as("fcl"), col("m.x").as("x"))
    val upd = asgF.select(col("ccl"), col("fcl"), posexplode(col("x")))
      .groupBy(col("ccl"), col("fcl"), col("pos"))
      .agg(sum(col("col").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", expr("CAST(s div n AS BIGINT)"))
      .groupBy(col("ccl"), col("fcl"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), t -> t.c)")
        .as("uv"))
    fine.join(upd, Seq("ccl", "fcl"), "left")
      .select(col("ccl"), col("fcl"), coalesce(col("uv"), col("fv")).as("fv"))
  }

  // --------------------------------------------------------------- q130

  /** q130 pins k=16 → kc=4 coarse × kf=4 fine. */
  val HierK = 16

  /** q130: TWO-LEVEL K-MEANS ASSIGNMENT, oracled — the hierarchical
    * ladder ([[trainHierarchical]]/[[assignHierarchical]]) promoted
    * from spec-verified to HASH-MATCHED: because every step is
    * fixed-point integer arithmetic, the entire two-level pipeline —
    * coarse 2-iteration Lloyd, frozen-coarse fine seeding, one
    * distributed fine update with the keep-if-emptied rule, and the
    * coarse-then-fine final argmin — unrolls into one DuckDB CTE that
    * reproduces Spark bit-for-bit. This is the assignment the scale
    * path actually serves (O(√k) per vector), so its verdicts deserve
    * the same gate as flat q124's.
    *
    * Oracle caveat (spec-asserted): the engine's empty-COARSE-cell
    * fallback (fine list = the coarse centroid) has no CTE mirror;
    * the fixture trains 4 non-empty coarse cells at every driver sf,
    * where both definitions coincide. The fine keep-if-emptied rule
    * IS mirrored (the fcf coalesce). */
  def hierAssign(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    assignHierarchical(v, hierModelFor(spark, dir))
      .select(col("vec_id"), col("cluster"), col("dist"))
  }

  private def fdistDuck(x: String, fv: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(generate_series(1, 64),
       |             i -> ($x[i] - $fv[i]) * ($x[i] - $fv[i]))),
       |           (a, b) -> a + b)""".stripMargin

  /** The q130/q131 shared CTE: [[kmeansCteK]](4) coarse, then the
    * unrolled fine level; `fa2` ends with (vec_id, x, ccl, fcl,
    * fdist) — x retained so the q131 pair join can block on the
    * two-level cells. */
  private val hierCte: String =
    s"""${kmeansCteK(4)},
       |fseed AS (
       |  SELECT cid AS ccl,
       |         CAST(row_number() OVER (PARTITION BY cid ORDER BY vec_id) - 1 AS INT) AS fcl,
       |         x AS fv
       |  FROM a2 QUALIFY row_number() OVER (PARTITION BY cid ORDER BY vec_id) <= 4),
       |fd1 AS (
       |  SELECT a.vec_id, a.x, a.cid AS ccl, f.fcl,
       |         ${fdistDuck("a.x", "f.fv")} AS fdist
       |  FROM a2 a JOIN fseed f ON f.ccl = a.cid),
       |fa1 AS (
       |  SELECT vec_id, x, ccl, fcl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY fdist, fcl) AS rn
       |    FROM fd1) WHERE rn = 1),
       |fu1 AS (
       |  SELECT ccl, fcl, i, sum(x[i]) AS s, count(*) AS n
       |  FROM fa1 CROSS JOIN generate_series(1, 64) AS t(i)
       |  GROUP BY ccl, fcl, i),
       |fc1 AS (
       |  SELECT ccl, fcl, list(CAST(s // n AS BIGINT) ORDER BY i) AS fv
       |  FROM fu1 GROUP BY ccl, fcl),
       |fcf AS (
       |  SELECT f.ccl, f.fcl, coalesce(c.fv, f.fv) AS fv
       |  FROM fseed f LEFT JOIN fc1 c ON c.ccl = f.ccl AND c.fcl = f.fcl),
       |fd2 AS (
       |  SELECT a.vec_id, a.x, a.cid AS ccl, f.fcl,
       |         ${fdistDuck("a.x", "f.fv")} AS fdist
       |  FROM a2 a JOIN fcf f ON f.ccl = a.cid),
       |fa2 AS (
       |  SELECT vec_id, x, ccl, fcl, fdist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY fdist, fcl) AS rn
       |    FROM fd2) WHERE rn = 1)""".stripMargin

  val hierAssignSql: String =
    s"""WITH $hierCte
       |SELECT vec_id, ccl * 4 + fcl AS cluster, fdist AS dist FROM fa2""".stripMargin

  // --------------------------------------------------------------- q131

  /** q131: SEMDEDUP PRUNE OVER THE TWO-LEVEL CELLS — the at-scale
    * composition spelled out end to end and hash-matched: the
    * hierarchical cells (trained O(n·√k), assigned O(√k)/vector,
    * q130's pipeline) serve as the blocking key for the SemDeDup
    * pair join, exactly how the family deploys when k grows with the
    * corpus. Same per-vector verdict shape as flat q125; the prune
    * seam ([[semdedupPruneOf]]) takes the hierarchical frame
    * unchanged — cells are cells. k=16 cells vs q125's 8 also means
    * finer blocking: candidate mass Σ|cell|² roughly halves. */
  def hierSemdedupPrune(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    semdedupPruneOf(
      assignHierarchical(v, hierModelFor(spark, dir))
        .select(col("vec_id"), col("x"), col("cluster")))
  }

  val hierSemdedupPruneSql: String =
    s"""WITH $hierCte,
       |hv AS (SELECT vec_id, x, ccl * 4 + fcl AS cluster FROM fa2),
       |pr AS (
       |  SELECT b.vec_id, b.cluster, count(a.vec_id) AS n_close_smaller
       |  FROM hv b LEFT JOIN hv a
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |   AND ${fdistDuck("a.x", "b.x")} < $PruneT
       |  GROUP BY b.vec_id, b.cluster)
       |SELECT vec_id, cluster, n_close_smaller,
       |       CAST(n_close_smaller = 0 AS INT) AS kept
       |FROM pr""".stripMargin

  // --------------------------------------------------------------- q136

  /** q136: MULTI-PROBE TWO-LEVEL ASSIGNMENT (IVF nprobe = 2) — the
    * quality knob the greedy hierarchical path lacks: coarse-argmin
    * then fine-argmin (q130) can miss the globally nearest fine
    * centroid when a vector sits near a coarse boundary (its true
    * cell lives in the SECOND-nearest coarse partition — the exact
    * error IVF systems bound by probing nprobe > 1 lists). This
    * operator probes the TOP-2 coarse cells — one extra √k fine scan
    * per vector, still O(√k) — takes the global argmin over both
    * candidate sets (ties to the smaller global cluster id), and
    * emits an `improved` audit flag: 1 when the second probe found a
    * STRICTLY smaller distance than the greedy cell's best, i.e. the
    * rows where nprobe=1 assigns wrong. Σ improved / n is the
    * boundary-error rate — the measurement that tells a deployment
    * whether nprobe=2 is worth the extra scan for its corpus.
    *
    * Scale shape: the top-2 coarse step is ONE codegen'd pass over
    * the √k·d literal ([[graft.functions.FixedPointOps.nearest2OfL2]]
    * — no second scan, no shuffle); both fine probes index the same
    * nested literal map-side. Past [[FineLiteralMaxEntries]] the
    * joined twin ([[multiProbeAssignJoined]]) explodes each vector to
    * its two probe rows, equi-joins the fine FRAME on `ccl` (2·kf
    * candidate rows per vector) and takes both the global and the
    * greedy argmin in ONE aggregate — the q130 joined-path shape at
    * exactly 2× the candidate mass. */
  def hierAssignMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    multiProbeAssign(v, hierModelFor(spark, dir))
      .select(col("vec_id"), col("cluster"), col("dist"), col("improved"))
  }

  /** Literal-model multi-probe: requires ≥ 2 coarse cells (the
    * top-2 kernel is null on a one-cell model — a model with no
    * second list has no second probe). */
  def multiProbeAssign(v: DataFrame, m: HierModel): DataFrame = {
    val coarseLit = typedLit(m.coarse.map(_.toSeq))
    val finesLit = typedLit(m.fine.map(_.map(_.toSeq)))
    v.withColumn("p",
        graft.functions.FixedPointOps.nearest2OfL2(col("x"), coarseLit))
      .withColumn("f1", graft.functions.FixedPointOps.nearestOfL2(
        col("x"), element_at(finesLit, col("p.cid1") + 1)))
      .withColumn("f2", graft.functions.FixedPointOps.nearestOfL2(
        col("x"), element_at(finesLit, col("p.cid2") + 1)))
      .withColumn("cl1", col("p.cid1") * lit(m.kf) + col("f1.cid"))
      .withColumn("cl2", col("p.cid2") * lit(m.kf) + col("f2.cid"))
      .withColumn("take2",
        col("f2.dist") < col("f1.dist") ||
          (col("f2.dist") === col("f1.dist") && col("cl2") < col("cl1")))
      .withColumn("cluster", when(col("take2"), col("cl2")).otherwise(col("cl1")))
      .withColumn("dist",
        when(col("take2"), col("f2.dist")).otherwise(col("f1.dist")))
      .withColumn("improved",
        when(col("f2.dist") < col("f1.dist"), lit(1)).otherwise(lit(0)))
      .drop("p", "f1", "f2", "cl1", "cl2", "take2")
  }

  /** Frame-model multi-probe — [[assignHierarchicalJoined]] at
    * nprobe = 2: explode each vector to its two coarse probes, join
    * the fine frame on `ccl`, then ONE aggregate computes both the
    * global argmin (struct min on (fdist, cluster) — cross-cell ties
    * to the smaller global id, [[multiProbeAssign]]'s rule exactly)
    * and the greedy argmin (the same min filtered to probe rank 1 —
    * `min(when(...))` ignores the rank-2 nulls). Spec-pinned
    * bit-exact against the literal path. */
  def multiProbeAssignJoined(v: DataFrame, m: HierModelDf): DataFrame = {
    val coarseLit = typedLit(m.coarse.map(_.toSeq))
    val probes = v.withColumn("p",
        graft.functions.FixedPointOps.nearest2OfL2(col("x"), coarseLit))
      .select(col("vec_id"), col("x"),
        explode(array(
          struct(lit(1).as("pr"), col("p.cid1").as("ccl")),
          struct(lit(2).as("pr"), col("p.cid2").as("ccl")))).as("pb"))
      .select(col("vec_id"), col("x"),
        col("pb.pr").as("pr"), col("pb.ccl").as("ccl"))
    val f = if (m.kTotal.toLong <= FineBroadcastMaxRows) broadcast(m.fine)
            else m.fine
    probes.join(f, Seq("ccl"))
      .withColumn("fdist", d2(col("x"), col("fv")))
      .withColumn("cl", col("ccl") * lit(m.kf) + col("fcl"))
      .groupBy(col("vec_id"))
      .agg(
        min(struct(col("fdist"), col("cl"))).as("b"),
        min(when(col("pr") === 1, struct(col("fdist"), col("cl")))).as("g"))
      .select(col("vec_id"), col("b.cl").as("cluster"),
        col("b.fdist").as("dist"),
        when(col("b.fdist") < col("g.fdist"), lit(1))
          .otherwise(lit(0)).as("improved"))
  }

  /** The nprobe=2 PROBE CELLS of each vector, exploded one row per
    * probe: (vec_id, x, probe, cluster) — probe 1 is the GREEDY cell
    * (fine argmin inside the nearest coarse cell, q130's assignment),
    * probe 2 the fine argmin inside the SECOND-nearest coarse cell.
    * This is the BLOCKING form of [[multiProbeAssign]]: instead of
    * reducing the two candidates to one argmin, both cells are kept
    * as probe targets, so a cell-equi-join consumer (the streaming
    * semantic gate) searches BOTH sides of the arrival's coarse
    * boundary. The two cells are always DISTINCT (different coarse
    * prefix), and a corpus vector lives in exactly one cell, so each
    * (vec_id, corpus) pair downstream of the join occurs at most
    * once — no dedup aggregation needed, append-mode stays legal. */
  def multiProbeCells(v: DataFrame, m: HierModel): DataFrame = {
    require(m.coarse.size >= 2, "nprobe=2 needs >= 2 coarse cells")
    val coarseLit = typedLit(m.coarse.map(_.toSeq))
    val finesLit = typedLit(m.fine.map(_.map(_.toSeq)))
    v.withColumn("p",
        graft.functions.FixedPointOps.nearest2OfL2(col("x"), coarseLit))
      .withColumn("f1", graft.functions.FixedPointOps.nearestOfL2(
        col("x"), element_at(finesLit, col("p.cid1") + 1)))
      .withColumn("f2", graft.functions.FixedPointOps.nearestOfL2(
        col("x"), element_at(finesLit, col("p.cid2") + 1)))
      .select(col("vec_id"), col("x"),
        explode(array(
          struct(lit(1).as("probe"),
            (col("p.cid1") * lit(m.kf) + col("f1.cid")).as("cluster")),
          struct(lit(2).as("probe"),
            (col("p.cid2") * lit(m.kf) + col("f2.cid")).as("cluster")))).as("pb"))
      .select(col("vec_id"), col("x"),
        col("pb.probe").as("probe"), col("pb.cluster").as("cluster"))
  }

  /** [[multiProbeCells]] for a FLAT centroid model: the top-2 nearest
    * centroids ARE the two probe cells (one codegen'd pass over the
    * k·d literal — no second scan). Same output shape and uniqueness
    * contract. */
  def multiProbeCellsFlat(v: DataFrame, cents: Seq[Array[Long]]): DataFrame = {
    require(cents.size >= 2, "nprobe=2 needs >= 2 cells")
    val cc = typedLit(cents.map(_.toSeq))
    v.withColumn("p", graft.functions.FixedPointOps.nearest2OfL2(col("x"), cc))
      .select(col("vec_id"), col("x"),
        explode(array(
          struct(lit(1).as("probe"), col("p.cid1").as("cluster")),
          struct(lit(2).as("probe"), col("p.cid2").as("cluster")))).as("pb"))
      .select(col("vec_id"), col("x"),
        col("pb.probe").as("probe"), col("pb.cluster").as("cluster"))
  }

  /** GENERAL-nprobe assignment — the tuning form behind the q136/q137
    * pair: rank ALL coarse cells by (dist, cid) (the in-repo IVF
    * probe-list pattern, `Similarity.ivfAssignAndProbe`), slice the
    * top `nprobe`, fine-argmin inside each, global argmin over the
    * candidates — all in ONE map-only projection (sort_array over the
    * √k-sized struct list; zero shuffle). nprobe=1 IS the greedy
    * assignment, nprobe=2 matches [[multiProbeAssign]], and
    * nprobe=kc probes every cell — the EXACT flat argmin, so the
    * ladder interpolates greedy → exact and a deployment picks its
    * point on the q137-style miss/cost frontier. The per-row cost is
    * O(√k·log √k + nprobe·√k) HOF evaluation — the top-2 KERNEL
    * ([[graft.functions.FixedPointOps.nearest2OfL2]]) stays the hot
    * path for the production nprobe=2 point; this form is for
    * frontier measurement and nprobe>2 tuning. */
  def multiProbeAssignN(v: DataFrame, m: HierModel, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= m.coarse.size,
      s"nprobe $nprobe out of range 1..${m.coarse.size}")
    val coarseLit = typedLit(m.coarse.map(_.toSeq))
    val finesLit = typedLit(m.fine.map(_.map(_.toSeq)))
    val ranked = slice(sort_array(
      transform(coarseLit, (c, i) => struct(
        graft.functions.FixedPointOps.sqDistL2(col("x"), c).as("d"),
        i.as("cid")))), 1, nprobe)
    v.withColumn("best", array_min(transform(ranked, p => {
        val f = graft.functions.FixedPointOps.nearestOfL2(
          col("x"), element_at(finesLit, p.getField("cid") + 1))
        struct(f.getField("dist").as("dist"),
          (p.getField("cid") * lit(m.kf) + f.getField("cid")).as("cluster"))
      })))
      .withColumn("cluster", col("best.cluster"))
      .withColumn("dist", col("best.dist"))
      .drop("best")
  }

  /** [[multiProbeCells]] over a FRAME model — the probe-cells path
    * past [[FineLiteralMaxEntries]]: explode each vector to its two
    * coarse probes (the coarse table stays a √k·d literal), equi-join
    * the fine FRAME on `ccl`, one min-struct argmin per (vector,
    * probe), then re-attach `x` by key. BATCH-only (the argmin is an
    * aggregation) — this is what the streaming gate's `foreachBatch`
    * form calls per micro-batch when the fine model outgrows the
    * plan-literal ceiling. Spec-pinned row-equal to the literal
    * [[multiProbeCells]]. */
  def multiProbeCellsJoined(v: DataFrame, m: HierModelDf): DataFrame = {
    val coarseLit = typedLit(m.coarse.map(_.toSeq))
    val probes = v.withColumn("p",
        graft.functions.FixedPointOps.nearest2OfL2(col("x"), coarseLit))
      .select(col("vec_id"),
        explode(array(
          struct(lit(1).as("probe"), col("p.cid1").as("ccl")),
          struct(lit(2).as("probe"), col("p.cid2").as("ccl")))).as("pb"),
        col("x"))
      .select(col("vec_id"), col("x"),
        col("pb.probe").as("probe"), col("pb.ccl").as("ccl"))
    val f = if (m.kTotal.toLong <= FineBroadcastMaxRows) broadcast(m.fine)
            else m.fine
    probes.join(f, Seq("ccl"))
      .withColumn("fdist", d2(col("x"), col("fv")))
      .withColumn("cl", col("ccl") * lit(m.kf) + col("fcl"))
      .groupBy(col("vec_id"), col("probe"))
      .agg(min(struct(col("fdist"), col("cl"))).as("b"))
      .select(col("vec_id"), col("probe"), col("b.cl").as("cluster"))
      .join(v.select(col("vec_id"), col("x")), Seq("vec_id"))
      .select(col("vec_id"), col("x"), col("probe"), col("cluster"))
  }

  /** Threshold-dispatched multi-probe over a frame model —
    * [[assignHier]]'s twin at nprobe = 2: the zero-shuffle literal
    * path while k·d fits task serialization, the joined path beyond. */
  def multiProbeHier(v: DataFrame, m: HierModelDf): DataFrame =
    if (m.kTotal.toLong * Dim <= FineLiteralMaxEntries)
      multiProbeAssign(v, collectHierModel(m))
    else multiProbeAssignJoined(v, m)

  val hierMultiProbeSql: String =
    s"""WITH $hierCte,
       |cp AS (
       |  SELECT vec_id, x, cid AS pccl, pr FROM (
       |    SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
       |                                      ORDER BY dist, cid) AS INT) AS pr
       |    FROM d2) WHERE pr <= 2),
       |mp AS (
       |  SELECT p.vec_id, p.pr, f.ccl * 4 + f.fcl AS cl,
       |         ${fdistDuck("p.x", "f.fv")} AS fdist
       |  FROM cp p JOIN fcf f ON f.ccl = p.pccl),
       |b AS (
       |  SELECT vec_id, cl, fdist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY fdist, cl) AS rn
       |    FROM mp) WHERE rn = 1),
       |g AS (
       |  SELECT vec_id, cl, fdist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY fdist, cl) AS rn
       |    FROM mp WHERE pr = 1) WHERE rn = 1)
       |SELECT b.vec_id, b.cl AS cluster, b.fdist AS dist,
       |       CASE WHEN b.fdist < g.fdist THEN 1 ELSE 0 END AS improved
       |FROM b JOIN g USING (vec_id)""".stripMargin

  // --------------------------------------------------------------- q137

  /** q137: PROBE-RECALL AUDIT for the hierarchical ladder — the
    * measurement behind the nprobe knob: how often does each
    * approximate assignment find a fine centroid AS NEAR AS the exact
    * flat argmin over the same k centroids? Three distances per
    * vector, all map-only literals chained in ONE projection (zero
    * shuffle until the single-row aggregate): `tdist` the exact flat
    * scan over all k fine centroids (the ground truth the hierarchy
    * approximates — the audit's deliberate O(n·k) leg, q98/q121
    * recall-audit precedent), `gdist` the greedy coarse-then-fine
    * distance (q130), `pdist` the nprobe=2 distance (q136).
    * tdist ≤ pdist ≤ gdist by construction; a "hit" is distance
    * equality with the exact leg. Output: one row with n, both hit
    * counts, and both miss rates in integer ppm — the
    * boundary-error-rate table a deployment reads to decide whether
    * the second probe pays for its extra √k scan. */
  def hierProbeRecall(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val m = hierModelFor(spark, dir)
    val base = v.select(col("vec_id"), col("x"))
    val t = assignWith(base, m.fine.flatten)
      .select(col("vec_id"), col("x"), col("dist").as("tdist"))
    val g = assignHierarchical(t, m)
      .select(col("vec_id"), col("x"), col("tdist"), col("dist").as("gdist"))
    val p = multiProbeAssign(g, m)
      .select(col("vec_id"), col("tdist"), col("gdist"), col("dist").as("pdist"))
    p.agg(
        count(lit(1)).as("n"),
        sum(when(col("gdist") === col("tdist"), 1L).otherwise(0L))
          .as("greedy_hits"),
        sum(when(col("pdist") === col("tdist"), 1L).otherwise(0L))
          .as("mp_hits"))
      .select(col("n"), col("greedy_hits"), col("mp_hits"),
        expr("(1000000 * (n - greedy_hits)) div n").as("greedy_miss_ppm"),
        expr("(1000000 * (n - mp_hits)) div n").as("mp_miss_ppm"))
  }

  val hierProbeRecallSql: String =
    s"""WITH $hierCte,
       |ft AS (
       |  SELECT a.vec_id, min(${fdistDuck("a.x", "f.fv")}) AS tdist
       |  FROM a2 a CROSS JOIN fcf f GROUP BY a.vec_id),
       |cp AS (
       |  SELECT vec_id, x, cid AS pccl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, cid) AS pr
       |    FROM d2) WHERE pr <= 2),
       |mp AS (
       |  SELECT p.vec_id, min(${fdistDuck("p.x", "f.fv")}) AS pdist
       |  FROM cp p JOIN fcf f ON f.ccl = p.pccl GROUP BY p.vec_id),
       |j AS (
       |  SELECT g.vec_id, g.fdist AS gdist, t.tdist, m.pdist
       |  FROM fa2 g JOIN ft t USING (vec_id) JOIN mp m USING (vec_id)),
       |s AS (
       |  SELECT count(*) AS n,
       |         CAST(sum(CASE WHEN gdist = tdist THEN 1 ELSE 0 END) AS BIGINT)
       |           AS greedy_hits,
       |         CAST(sum(CASE WHEN pdist = tdist THEN 1 ELSE 0 END) AS BIGINT)
       |           AS mp_hits
       |  FROM j)
       |SELECT n, greedy_hits, mp_hits,
       |       (1000000 * (n - greedy_hits)) // n AS greedy_miss_ppm,
       |       (1000000 * (n - mp_hits)) // n AS mp_miss_ppm
       |FROM s""".stripMargin

  // --------------------------------------------------------------- q138

  /** q138: BOUNDARY-PAIR RECOVERY — the near-dup pairs SemDeDup's
    * blocking MISSES, recovered in batch. The prune (q125/q131) only
    * compares vectors INSIDE a cell; a near-dup pair straddling a
    * cell boundary is invisible to it (the documented SemDeDup recall
    * trade, worst exactly where q137 measures the assignment error).
    * This operator probes each vector's SECOND cell — the fine argmin
    * inside its second-nearest coarse partition
    * ([[multiProbeCells]]' probe-2 leg) — against the assigned
    * corpus, emitting (vec_id, other_id, dist) for every cross-cell
    * pair under the prune threshold. Strictly additive to the
    * within-cell prune: probe-2 cells differ from the vector's own
    * cell by construction, so no within-cell pair can reappear and
    * no dedup aggregation is needed.
    *
    * Scale shape: the SAME blocked-join mass as the prune itself
    * (Σ over vectors of |probe-2 cell| ≈ n·cell at the kForCorpus
    * operating point, k distinct join keys fanning out with the
    * corpus) — one extra prune-shaped pass buys back the boundary
    * recall. A deployment caps the probed corpus side exactly like
    * the gate does ([[capAssignedCorpus]] at build time); the oracle
    * runs uncapped. */
  def hierBoundaryPairs(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val m = hierModelFor(spark, dir)
    val asg = assignHierarchical(v, m)
      .select(col("vec_id").as("other_id"), col("x").as("ox"), col("cluster"))
    multiProbeCells(v.select(col("vec_id"), col("x")), m)
      .filter(col("probe") === 2)
      .join(asg, Seq("cluster"))
      .withColumn("dist", graft.functions.FixedPointOps.sqDistL2(col("x"), col("ox")))
      .filter(col("dist") < PruneT)
      .select(col("vec_id"), col("other_id"), col("dist"))
  }

  val hierBoundaryPairsSql: String =
    s"""WITH $hierCte,
       |c2 AS (
       |  SELECT vec_id, x, cid AS pccl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, cid) AS pr
       |    FROM d2) WHERE pr = 2),
       |p2 AS (
       |  SELECT vec_id, x, pccl * 4 + fcl AS pcell FROM (
       |    SELECT c.vec_id, c.x, c.pccl, f.fcl,
       |           row_number() OVER (PARTITION BY c.vec_id
       |             ORDER BY ${fdistDuck("c.x", "f.fv")}, f.fcl) AS rn
       |    FROM c2 c JOIN fcf f ON f.ccl = c.pccl) WHERE rn = 1)
       |SELECT a.vec_id, b.vec_id AS other_id,
       |       ${fdistDuck("a.x", "b.x")} AS dist
       |FROM p2 a JOIN fa2 b ON b.ccl * 4 + b.fcl = a.pcell
       |WHERE ${fdistDuck("a.x", "b.x")} < $PruneT""".stripMargin

  // --------------------------------------------------------------- q139

  /** q139: SEMANTIC DEDUP GROUPS — the near-dup graph's connected
    * components over the UNION of within-cell pairs (q125/q131's
    * candidate mass) and the cross-boundary pairs (q138): every
    * vector participating in at least one near-dup pair mapped to its
    * group representative (min vec_id) with the group size — the
    * vector-side twin of q60's text components, with the boundary
    * recall the plain blocked pass lacks. A keep-one-per-group policy
    * over these groups is transitive-closure-safe: chains A~B~C that
    * straddle a cell boundary collapse into ONE group here, where the
    * within-cell prune would keep both endpoints.
    *
    * Scale shape: both edge generators are the prune-shaped blocked
    * joins (Σ|cell|² and Σ|probe-2 cell| ≈ n·cell at the operating
    * point); the CC loop is the q60 star-contraction (O(log n)
    * rounds, nothing driver-side but convergence counts); the size
    * annotation is one window over `rep`. */
  def semanticDedupGroups(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val m = hierModelFor(spark, dir)
    // ONE assignment cache key (with dist) shared with q140 — the
    // survivor pass rides this identical frame, so running q139 then
    // q140 assigns the corpus once, not twice
    val asg = graft.CacheRegistry.getOrCache(spark, s"clustering.hierAsgD:$dir")(
      assignHierarchical(v, m)
        .select(col("vec_id"), col("x"), col("cluster"), col("dist")))
    // the group table (edge generators + CC contraction) is the
    // expensive shared intermediate between q139 and q140 — memoized
    // like every other shared materialization point
    graft.CacheRegistry.getOrCache(spark, s"clustering.semGroups:$dir")(
      semanticDedupGroupsOf(asg.select(col("vec_id"), col("x"), col("cluster")),
        multiProbeCells(v.select(col("vec_id"), col("x")), m)
          .filter(col("probe") === 2)))
  }

  /** Frame-level core of [[semanticDedupGroups]]: `asg` the assigned
    * corpus (vec_id, x, cluster), `probe2` each vector's SECOND probe
    * cell in the same shape. Exposed so the transitive-chain property
    * (a boundary-straddling A~B~C collapses into ONE group) is
    * testable on planted geometry. */
  def semanticDedupGroupsOf(asg: DataFrame, probe2: DataFrame,
      pruneT: Long = PruneT): DataFrame = {
    val corpus = asg.select(col("vec_id").as("other_id"), col("x").as("ox"),
      col("cluster"))
    val within = asg.join(corpus, Seq("cluster"))
      .filter(col("vec_id") < col("other_id"))
      .filter(graft.functions.FixedPointOps.sqDistL2(col("x"), col("ox")) < pruneT)
      .select(col("vec_id").as("u"), col("other_id").as("v"))
    val boundary = probe2.join(corpus, Seq("cluster"))
      .filter(graft.functions.FixedPointOps.sqDistL2(col("x"), col("ox")) < pruneT)
      .select(least(col("vec_id"), col("other_id")).as("u"),
        greatest(col("vec_id"), col("other_id")).as("v"))
    val cc = Components.connectedComponents(within.unionByName(boundary))
    cc.select(col("id").as("vec_id"), col("rep"))
      .withColumn("gsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("rep"))))
  }

  /** Shared closure of the q139/q140 oracles: the hier ladder, both
    * edge generators, the recursive transitive closure, and the
    * labeled+sized group table `g`. */
  private val semanticClosureCte: String =
    s"""$hierCte,
       |c2 AS (
       |  SELECT vec_id, x, cid AS pccl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, cid) AS pr
       |    FROM d2) WHERE pr = 2),
       |p2 AS (
       |  SELECT vec_id, x, pccl * 4 + fcl AS pcell FROM (
       |    SELECT c.vec_id, c.x, c.pccl, f.fcl,
       |           row_number() OVER (PARTITION BY c.vec_id
       |             ORDER BY ${fdistDuck("c.x", "f.fv")}, f.fcl) AS rn
       |    FROM c2 c JOIN fcf f ON f.ccl = c.pccl) WHERE rn = 1),
       |wp AS (
       |  SELECT a.vec_id AS u, b.vec_id AS v
       |  FROM fa2 a JOIN fa2 b
       |    ON a.ccl = b.ccl AND a.fcl = b.fcl AND a.vec_id < b.vec_id
       |  WHERE ${fdistDuck("a.x", "b.x")} < $PruneT),
       |bp AS (
       |  SELECT least(a.vec_id, b.vec_id) AS u,
       |         greatest(a.vec_id, b.vec_id) AS v
       |  FROM p2 a JOIN fa2 b ON b.ccl * 4 + b.fcl = a.pcell
       |  WHERE ${fdistDuck("a.x", "b.x")} < $PruneT),
       |uedges AS (SELECT u, v FROM wp UNION SELECT u, v FROM bp),
       |sym AS (
       |  SELECT u, v FROM uedges
       |  UNION
       |  SELECT v AS u, u AS v FROM uedges),
       |reach AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON s.u = r.v WHERE s.v <> r.u),
       |lab AS (
       |  SELECT u AS vec_id, least(u, min(v)) AS rep FROM reach GROUP BY u),
       |g AS (
       |  SELECT vec_id, rep, count(*) OVER (PARTITION BY rep) AS gsize FROM lab)""".stripMargin

  val semanticDedupGroupsSql: String =
    s"""WITH RECURSIVE $semanticClosureCte
       |SELECT vec_id, rep, gsize FROM g""".stripMargin

  // --------------------------------------------------------------- q140

  /** q140: SEMANTIC SURVIVORSHIP — the policy step after q139's
    * groups, the vector twin of q91's text survivorship: per
    * semantic near-dup group keep ONE canonical vector, chosen by
    * the q127 diversity rule (the member FARTHEST from its cell
    * centroid — the most informative copy of a redundant set; ties
    * to the smaller vec_id), and account for what the policy drops.
    * One row per group: (rep, gsize, survivor_id, survivor_dist,
    * dropped).
    *
    * Scale shape: q139's group table is bounded by the pair
    * participants (≪ corpus); the argmax is one window over `rep`.
    * The dist column rides along from the SAME cached assignment the
    * group pass used — no second corpus scan. */
  def semanticSurvivors(spark: SparkSession, dir: String): DataFrame = {
    // rides q139's cached group table AND its cached assignment (one
    // shared hierAsgD key): after q139 the survivor policy costs one
    // model-sized join + one window, no second corpus pass or CC run
    val groups = semanticDedupGroups(spark, dir)
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val m = hierModelFor(spark, dir)
    val asg = graft.CacheRegistry.getOrCache(spark, s"clustering.hierAsgD:$dir")(
      assignHierarchical(v, m)
        .select(col("vec_id"), col("x"), col("cluster"), col("dist")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rep")).orderBy(col("dist").desc, col("vec_id"))
    groups.join(asg.select(col("vec_id"), col("dist")), Seq("vec_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("rep"), col("gsize"), col("vec_id").as("survivor_id"),
        col("dist").as("survivor_dist"), (col("gsize") - lit(1)).as("dropped"))
  }

  val semanticSurvivorsSql: String =
    s"""WITH RECURSIVE $semanticClosureCte
       |SELECT rep, gsize, vec_id AS survivor_id, fdist AS survivor_dist,
       |       gsize - 1 AS dropped
       |FROM (
       |  SELECT g.*, f.fdist,
       |         row_number() OVER (PARTITION BY g.rep
       |                            ORDER BY f.fdist DESC, g.vec_id) AS rn
       |  FROM g JOIN fa2 f USING (vec_id)) WHERE rn = 1""".stripMargin

  // --------------------------------------------------------------- q132

  /** q132's "arriving batch" slice rule (deterministic, ~14% of the
    * corpus — disjoint from the q21 query slice). */
  val DriftMod = 7L; val DriftRes = 3L

  /** q132: EMBEDDING-SPACE DRIFT MONITOR — the semantic sibling of
    * q119's cohort drift: assign the ARRIVING batch to the stored
    * k-means cells and compare its per-cell distribution against the
    * corpus baseline. A batch whose cell mix diverges (a cell's share
    * jumping or collapsing) signals the upstream source shifted in
    * EMBEDDING space — topic drift, a crawler stuck in one domain, a
    * broken encoder — before any of it reaches training. Integer
    * ppm shares (10⁶·n div total), so the verdict is engine-portable.
    *
    * Scale shape: the baseline side is the stored assigned corpus
    * (k counts — the nightly build's table aggregated once); the
    * arrival side is one map-only assignment + a k-key count. The
    * share totals come from a window over the k-ROW frame (no 1-row
    * scalar cross join, no corpus-sized second pass). Serving twin:
    * the same arithmetic over [[loadAssignedCorpus]] counts +
    * [[assignStored]] arrivals — model-sized everything. */
  def clusterDrift(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val asg = assignWith(v, centroidsFor(spark, dir)).select(col("vec_id"), col("cluster"))
    clusterDriftOf(
      asg.groupBy(col("cluster")).agg(count(lit(1)).as("n_base")),
      asg.filter(col("vec_id") % DriftMod === DriftRes)
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_new")))
  }

  /** The drift arithmetic over two k-row (cluster, count) frames —
    * the seam the serving twin drives with stored-table counts. */
  def clusterDriftOf(base: DataFrame, fresh: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    base.join(fresh, Seq("cluster"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("t_base", sum(col("n_base")).over(w))
      .withColumn("t_new", sum(col("n_new")).over(w))
      .select(col("cluster"), col("n_base"), col("n_new"),
        expr("1000000 * n_base div t_base").as("base_ppm"),
        expr("CASE WHEN t_new = 0 THEN 0 ELSE 1000000 * n_new div t_new END").as("new_ppm"))
      .withColumn("drift_ppm",
        abs(col("new_ppm") - col("base_ppm")))
  }

  /** [[clusterDriftOf]] generalized to PER-WINDOW batches — the
    * streaming drift gate's arithmetic: `winCounts` is
    * (window, cluster, n_new) for one or more closed windows; every
    * window is compared against the SAME k-row baseline (replicated
    * by a model-sized |windows|·k cross join), totals ride window
    * functions partitioned by the window column. Bit-compatible with
    * [[clusterDriftOf]] on a single window (spec-pinned). */
  def clusterDriftWindowed(base: DataFrame, winCounts: DataFrame): DataFrame = {
    val wins = winCounts.select(col("window")).distinct()
    val wWin = org.apache.spark.sql.expressions.Window.partitionBy(col("window"))
    wins.crossJoin(base) // |windows| x k rows — both sides model-sized
      .join(winCounts, Seq("window", "cluster"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("t_base", sum(col("n_base")).over(wWin))
      .withColumn("t_new", sum(col("n_new")).over(wWin))
      .select(col("window"), col("cluster"), col("n_base"), col("n_new"),
        expr("1000000 * n_base div t_base").as("base_ppm"),
        expr("CASE WHEN t_new = 0 THEN 0 ELSE 1000000 * n_new div t_new END")
          .as("new_ppm"))
      .withColumn("drift_ppm", abs(col("new_ppm") - col("base_ppm")))
  }

  val clusterDriftSql: String =
    s"""WITH $kmeansCte,
       |b AS (SELECT cid AS cluster, count(*) AS n_base FROM a2 GROUP BY cid),
       |f AS (SELECT cid AS cluster, count(*) AS n_new FROM a2
       |      WHERE vec_id % $DriftMod = $DriftRes GROUP BY cid),
       |j AS (
       |  SELECT b.cluster, b.n_base, coalesce(f.n_new, 0) AS n_new,
       |         CAST(sum(b.n_base) OVER () AS BIGINT) AS t_base,
       |         CAST(sum(coalesce(f.n_new, 0)) OVER () AS BIGINT) AS t_new
       |  FROM b LEFT JOIN f ON f.cluster = b.cluster)
       |SELECT cluster, n_base, n_new,
       |       1000000 * n_base // t_base AS base_ppm,
       |       CASE WHEN t_new = 0 THEN 0 ELSE 1000000 * n_new // t_new END AS new_ppm,
       |       abs((CASE WHEN t_new = 0 THEN 0 ELSE 1000000 * n_new // t_new END)
       |           - (1000000 * n_base // t_base)) AS drift_ppm
       |FROM j""".stripMargin

  // --------------------------------------------------------------- q141

  /** q141: DRIFT MONITOR OVER THE TWO-LEVEL CELLS — q132's arithmetic
    * on the at-scale ladder (the q131 composition rule: cells are
    * cells). When k grows with the corpus the drift baseline is the
    * hier-assigned stored table (the nightly build's AssignedHierT),
    * and the arriving batch assigns at O(√k)/vector; the ppm
    * comparison is unchanged — [[clusterDriftOf]] is the shared seam,
    * so the monitor can never diverge between the flat and two-level
    * deployments. */
  def clusterDriftHier(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val asg = assignHierarchical(v, hierModelFor(spark, dir))
      .select(col("vec_id"), col("cluster"))
    clusterDriftOf(
      asg.groupBy(col("cluster")).agg(count(lit(1)).as("n_base")),
      asg.filter(col("vec_id") % DriftMod === DriftRes)
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_new")))
  }

  val clusterDriftHierSql: String =
    s"""WITH $hierCte,
       |b AS (SELECT ccl * 4 + fcl AS cluster, count(*) AS n_base
       |      FROM fa2 GROUP BY 1),
       |f AS (SELECT ccl * 4 + fcl AS cluster, count(*) AS n_new FROM fa2
       |      WHERE vec_id % $DriftMod = $DriftRes GROUP BY 1),
       |j AS (
       |  SELECT b.cluster, b.n_base, coalesce(f.n_new, 0) AS n_new,
       |         CAST(sum(b.n_base) OVER () AS BIGINT) AS t_base,
       |         CAST(sum(coalesce(f.n_new, 0)) OVER () AS BIGINT) AS t_new
       |  FROM b LEFT JOIN f ON f.cluster = b.cluster)
       |SELECT cluster, n_base, n_new,
       |       1000000 * n_base // t_base AS base_ppm,
       |       CASE WHEN t_new = 0 THEN 0 ELSE 1000000 * n_new // t_new END AS new_ppm,
       |       abs((CASE WHEN t_new = 0 THEN 0 ELSE 1000000 * n_new // t_new END)
       |           - (1000000 * n_base // t_base)) AS drift_ppm
       |FROM j""".stripMargin

  // --------------------------------------------------------------- q142

  /** q142's replay-plant rule: arrivals are the q132 drift slice PLUS
    * every vec_id % 37 == 0 row — the latter mostly live in the
    * corpus side too, so the batch carries genuine REPLAYS (the
    * at-least-once delivery case every admission path must absorb). */
  val AdmitReplayMod = 37L

  /** The delta-ADMISSION verdict core — the batch seam
    * [[graft.pipeline.IndexDelta.admitVectors]] and the oracled q142
    * share, so the production append path and the hash-gated batch
    * twin can never diverge. Inputs: `arrivals` (vec_id, x, cluster,
    * dist) already assigned under the FROZEN serving model, `corpus`
    * (corpus_id, x, cluster) the stored probe table, `cappedCells`
    * the build-time hot-cell side table. Stages short-circuit in the
    * curation gate's order (later stages report 0 for rows a prior
    * stage rejected — evaluated-and-clean and not-evaluated stay
    * distinguishable through the earlier flags):
    *
    *  1. REPLAY — the arrival id already exists in the stored corpus
    *     (at-least-once redelivery): rejected, never re-appended (the
    *     reference's ON CONFLICT DO NOTHING contract, S6).
    *  2. CELL_CAPPED — the arrival lands in a build-capped hot cell:
    *     ADMITTED WITHOUT a near-dup probe but flagged (q134's
    *     retention-safe reading), and the caller must NOT append it to
    *     the probe table (over-cap cells' members never enter it — the
    *     build-time invariant delta appends must preserve).
    *  3. NEAR-DUP — a stored corpus vector in the same cell within
    *     [[PruneT]]: rejected (the SemDeDup admission rule; n_close
    *     counts the evidence).
    *
    * admitted = ¬replay ∧ (capped ∨ n_close = 0). Scale shape: one
    * id anti-probe (equi-join), one broadcast k-row flag join, one
    * cell-blocked probe join over NON-capped arrivals only — per
    * arrival O(|cell|), the gate's O(delta) contract. */
  def admitVerdictsOf(arrivals: DataFrame, corpus: DataFrame,
      cappedCells: DataFrame, pruneT: Long = PruneT): DataFrame = {
    val ids = corpus.select(col("corpus_id").as("vec_id"))
      .withColumn("seen", lit(1))
    val base = arrivals.join(ids, Seq("vec_id"), "left")
      .withColumn("replay", when(col("seen").isNotNull, 1).otherwise(0))
      .drop("seen")
      .join(broadcast(cappedCells.select(col("cluster")).withColumn("capf", lit(1))),
        Seq("cluster"), "left")
      .withColumn("cell_capped",
        when(col("replay") === 0 && col("capf").isNotNull, 1).otherwise(0))
      .drop("capf")
    val close = base.filter(col("replay") === 0 && col("cell_capped") === 0)
      .select(col("vec_id"), col("x"), col("cluster"))
      .join(corpus.select(col("corpus_id"), col("x").as("cx"), col("cluster")),
        Seq("cluster"))
      .filter(graft.functions.FixedPointOps.sqDistL2(col("x"), col("cx")) < pruneT)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("nc"))
    base.join(close, Seq("vec_id"), "left")
      .withColumn("n_close", coalesce(col("nc"), lit(0L)))
      .withColumn("admitted",
        when(col("replay") === 0 &&
          (col("cell_capped") === 1 || col("n_close") === 0), 1).otherwise(0))
      .select(col("vec_id"), col("cluster"), col("dist"), col("replay"),
        col("cell_capped"), col("n_close"), col("admitted"))
  }

  /** q142: DELTA-ADMISSION VERDICTS, oracled — the batch twin of
    * admitting an arrival batch into a LIVE index without a nightly
    * rebuild ([[graft.pipeline.IndexDelta]]): per arrival, the frozen-
    * model assignment plus the full admission decision
    * ([[admitVerdictsOf]]). Fixture roles: the q132 drift slice plays
    * the arrival batch (plus the [[AdmitReplayMod]] replay plant); the
    * complement plays the stored corpus; the model is the q124 frozen
    * model and the cap is the BUILD's corpus-relative rule
    * ([[buildCapOf]] — 9n/8k over the CORPUS side, clamped ≥ 1).
    * Oracle-fixture note: the frozen model trains on the full fixture
    * (the q132 convention — production freezes whatever the nightly
    * build trained; which corpus trained it is not part of the
    * admission semantics under test). */
  def deltaAdmission(spark: SparkSession, dir: String): DataFrame = {
    // assignment fetched BEFORE the verdict memo: flatAsgD touches
    // ModelRegistry, which must never run inside a CacheRegistry build
    val asg = flatAsgD(spark, dir)
    graft.CacheRegistry.getOrCache(spark, s"clustering.admitVerd:$dir") {
      val arr = asg.filter(
        col("vec_id") % DriftMod === DriftRes ||
          col("vec_id") % AdmitReplayMod === 0)
      val corp = asg.filter(col("vec_id") % DriftMod =!= DriftRes)
        .select(col("vec_id").as("corpus_id"), col("x"), col("cluster"))
      val nCorp = corp.count() // one count over the cached frame
      val capped = corp.groupBy(col("cluster")).agg(count(lit(1)).as("cell_n"))
        .filter(col("cell_n") > buildCapOf(nCorp, K))
        .select(col("cluster"))
      admitVerdictsOf(arr, corp, capped)
    }
  }

  /** The dir-cached FLAT assignment with dist — shared by q133's
    * funnel and the q142-q144 admission family (one key, one
    * materialization). Fetches the model before the frame memo (data
    * order; the per-key-latch registries impose no lock order). */
  private def flatAsgD(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val cents = centroidsFor(spark, dir)
    graft.CacheRegistry.getOrCache(spark, s"clustering.flatAsgD:$dir")(
      assignWith(v, cents)
        .select(col("vec_id"), col("x"), col("cluster"), col("dist")))
  }

  /** Shared CTE of the q142/q144 oracles: the frozen model, the
    * arrival/corpus split, the build cap, and the per-arrival verdict
    * table `verd` — the SQL mirror of [[admitVerdictsOf]]. */
  private val admissionCte: String =
    s"""$kmeansCte,
       |arr AS (
       |  SELECT vec_id, x, cid, dist FROM a2
       |  WHERE vec_id % $DriftMod = $DriftRes OR vec_id % $AdmitReplayMod = 0),
       |corp AS (SELECT vec_id, x, cid FROM a2 WHERE vec_id % $DriftMod <> $DriftRes),
       |csz AS (SELECT cid, count(*) AS cell_n FROM corp GROUP BY cid),
       |cap AS (SELECT greatest(1, ($CapNum * count(*)) // ($CapDen * $K)) AS maxcell
       |        FROM corp),
       |capc AS (SELECT cid FROM csz, cap WHERE cell_n > maxcell),
       |abase AS (
       |  SELECT a.vec_id, a.x, a.cid, a.dist,
       |         CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END AS replay,
       |         CASE WHEN c.vec_id IS NULL AND p.cid IS NOT NULL
       |              THEN 1 ELSE 0 END AS cell_capped
       |  FROM arr a
       |  LEFT JOIN corp c ON c.vec_id = a.vec_id
       |  LEFT JOIN capc p ON p.cid = a.cid),
       |aclose AS (
       |  SELECT b.vec_id, count(*) AS nc
       |  FROM abase b JOIN corp k ON k.cid = b.cid
       |  WHERE b.replay = 0 AND b.cell_capped = 0
       |    AND ${fdistDuck("b.x", "k.x")} < $PruneT
       |  GROUP BY b.vec_id),
       |verd AS (
       |  SELECT b.vec_id, b.cid AS cluster, b.dist, b.replay, b.cell_capped,
       |         coalesce(nc, CAST(0 AS BIGINT)) AS n_close,
       |         CASE WHEN b.replay = 0
       |                AND (b.cell_capped = 1 OR coalesce(nc, 0) = 0)
       |              THEN 1 ELSE 0 END AS admitted
       |  FROM abase b LEFT JOIN aclose c2 ON c2.vec_id = b.vec_id)""".stripMargin

  val deltaAdmissionSql: String =
    s"""WITH $admissionCte
       |SELECT vec_id, cluster, dist, replay, cell_capped, n_close, admitted
       |FROM verd""".stripMargin

  // --------------------------------------------------------------- q143

  /** q143: MODEL-STALENESS MONITOR, oracled — the instrument that
    * tells a delta-admitting deployment when its FROZEN model has
    * gone stale and the nightly rebuild must retrain (the refresh
    * trigger [[graft.pipeline.IndexDelta.refreshIfStale]] consumes).
    * Per cell: the corpus-side p95 assignment radius (exact rank
    * ceil(0.95·n) over (dist, vec_id) — integer-portable), the
    * arriving batch's population, and the ppm of arrivals landing
    * BEYOND the radius. A fresh model covers ~5% of arrivals past
    * p95 by construction; a drifted source pushes whole cells' stale
    * share toward 10⁶ — q132 sees the mix shift, this sees coverage
    * collapse even when the mix is stable (a new topic that lands in
    * an old cell but FAR from its centroid).
    *
    * Scale shape: the radius is one window over the stored
    * assignment (corpus-sized pass, build-budget); arrivals join a
    * k-row radius table and aggregate — O(delta) serving cost. */
  def modelStaleness(spark: SparkSession, dir: String): DataFrame = {
    val asg = flatAsgD(spark, dir)
    val arr = asg.filter(col("vec_id") % DriftMod === DriftRes)
      .select(col("cluster"), col("vec_id"), col("dist"))
    val corp = asg.filter(col("vec_id") % DriftMod =!= DriftRes)
      .select(col("cluster"), col("vec_id"), col("dist"))
    modelStalenessOf(corp, arr)
  }

  /** The k-row per-cell p95 radius table from a corpus assignment
    * (cluster, vec_id, dist) — q143's radius derivation factored out
    * so the NIGHTLY BUILD can compute it once per corpus version (one
    * window pass, build budget) and persist the k rows; the per-batch
    * staleness monitor then joins arrivals against the stored table at
    * O(delta) instead of re-scanning the probe corpus per batch. */
  def cellRadiiOf(corpus: DataFrame): DataFrame = {
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("dist"), col("vec_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
    corpus
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n_base", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(19 * n_base + 19) div 20"))
      .select(col("cluster"), col("n_base"), col("dist").as("radius"))
  }

  /** Frame-level core of [[modelStaleness]]: `corpus` and `arrivals`
    * as (cluster, vec_id, dist) under ONE model. Exposed so the
    * serving twin can run it over stored tables. */
  def modelStalenessOf(corpus: DataFrame, arrivals: DataFrame): DataFrame =
    stalenessAgainstRadii(cellRadiiOf(corpus), arrivals)

  /** The arrival half of the staleness monitor against a PRE-BUILT
    * radius table — the O(delta) serving form ([[cellRadiiOf]] is the
    * stored side). FULL join (round-14 advice closed): an arrival
    * assigned to a cell with NO radius row (zero corpus members — the
    * most-drifted arrivals possible) counts as STALE under a 0-member
    * (n_base = 0, radius NULL) cell row instead of silently dropping
    * out of both the n_new denominator and the n_stale numerator; a
    * radius row with no arrivals still reports n_new = 0. */
  def stalenessAgainstRadii(radii: DataFrame, arrivals: DataFrame): DataFrame =
    radii.join(arrivals.select(col("cluster"), col("vec_id"), col("dist")),
        Seq("cluster"), "full")
      .groupBy(col("cluster"))
      .agg(coalesce(max(col("n_base")), lit(0L)).as("n_base"),
        max(col("radius")).as("radius"),
        count(col("vec_id")).as("n_new"),
        // radius NULL ⇒ arrival-side-only row (radii rows always carry a
        // radius) ⇒ stale by definition; radii-only rows have dist NULL
        // and the comparison's NULL falls through to 0
        sum(when(col("radius").isNull || col("dist") > col("radius"), 1L)
          .otherwise(0L)).as("n_stale"))
      .select(col("cluster"), col("n_base"), col("radius"), col("n_new"),
        col("n_stale"),
        expr("CASE WHEN n_new = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000000 * n_stale) div n_new END").as("stale_ppm"))

  val modelStalenessSql: String =
    s"""WITH $kmeansCte,
       |arr AS (SELECT cid, vec_id, dist FROM a2
       |        WHERE vec_id % $DriftMod = $DriftRes),
       |corp AS (SELECT cid, vec_id, dist FROM a2
       |         WHERE vec_id % $DriftMod <> $DriftRes),
       |rk AS (
       |  SELECT cid, dist,
       |         row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rn,
       |         count(*) OVER (PARTITION BY cid) AS n_base
       |  FROM corp),
       |rad AS (
       |  SELECT cid, n_base, dist AS radius
       |  FROM rk WHERE rn = (19 * n_base + 19) // 20),
       |st AS (
       |  SELECT coalesce(r.cid, a.cid) AS cid,
       |         coalesce(max(r.n_base), 0) AS n_base, max(r.radius) AS radius,
       |         count(a.vec_id) AS n_new,
       |         CAST(sum(CASE WHEN r.radius IS NULL OR a.dist > r.radius
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_stale
       |  FROM rad r FULL JOIN arr a ON a.cid = r.cid
       |  GROUP BY coalesce(r.cid, a.cid))
       |SELECT cid AS cluster, n_base, radius, n_new,
       |       coalesce(n_stale, CAST(0 AS BIGINT)) AS n_stale,
       |       CASE WHEN n_new = 0 THEN CAST(0 AS BIGINT)
       |            ELSE (1000000 * coalesce(n_stale, 0)) // n_new END AS stale_ppm
       |FROM st""".stripMargin

  // --------------------------------------------------------------- q144

  /** q144: ADMISSION FUNNEL, oracled — q142's verdict table reduced
    * to the stage report a delta-ingest run publishes (the q123/q133
    * funnel convention applied to the admission gate): arrivals →
    * replays rejected → capped-flagged admissions → near-dup
    * rejections → admitted. One row; all counts BIGINT in both
    * engines (DuckDB sum(int) is HUGEINT — cast, the q115 rule). */
  def admissionFunnel(spark: SparkSession, dir: String): DataFrame =
    deltaAdmission(spark, dir).agg(
      count(lit(1)).as("n_arrivals"),
      sum(col("replay")).cast("long").as("n_replay"),
      sum(col("cell_capped")).cast("long").as("n_capped"),
      sum(when(col("replay") === 0 && col("cell_capped") === 0 &&
        col("n_close") > 0, 1L).otherwise(0L)).as("n_neardup"),
      sum(col("admitted")).cast("long").as("n_admitted"))

  val admissionFunnelSql: String =
    s"""WITH $admissionCte
       |SELECT CAST(count(*) AS BIGINT) AS n_arrivals,
       |       CAST(sum(replay) AS BIGINT) AS n_replay,
       |       CAST(sum(cell_capped) AS BIGINT) AS n_capped,
       |       CAST(sum(CASE WHEN replay = 0 AND cell_capped = 0 AND n_close > 0
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
       |       CAST(sum(admitted) AS BIGINT) AS n_admitted
       |FROM verd""".stripMargin

  // --------------------------------------------------------------- q146

  /** q146: MODEL STALENESS UNDER THE TWO-LEVEL MODEL, oracled — q143's
    * radius/ppm arithmetic over the hierarchical cells through the
    * SAME [[modelStalenessOf]] seam, so the monitor a two-level
    * deployment runs carries its own hash gate (the q141 pattern:
    * every clustering-family consumer runs identically on flat and
    * hier cells). Rides the q139/q140 cached assignment. */
  def hierStaleness(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val m = hierModelFor(spark, dir)
    val asg = graft.CacheRegistry.getOrCache(spark, s"clustering.hierAsgD:$dir")(
      assignHierarchical(v, m)
        .select(col("vec_id"), col("x"), col("cluster"), col("dist")))
    modelStalenessOf(
      asg.filter(col("vec_id") % DriftMod =!= DriftRes)
        .select(col("cluster"), col("vec_id"), col("dist")),
      asg.filter(col("vec_id") % DriftMod === DriftRes)
        .select(col("cluster"), col("vec_id"), col("dist")))
  }

  val hierStalenessSql: String =
    s"""WITH $hierCte,
       |arr AS (SELECT ccl * 4 + fcl AS cid, vec_id, fdist AS dist FROM fa2
       |        WHERE vec_id % $DriftMod = $DriftRes),
       |corp AS (SELECT ccl * 4 + fcl AS cid, vec_id, fdist AS dist FROM fa2
       |         WHERE vec_id % $DriftMod <> $DriftRes),
       |rk AS (
       |  SELECT cid, dist,
       |         row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rn,
       |         count(*) OVER (PARTITION BY cid) AS n_base
       |  FROM corp),
       |rad AS (
       |  SELECT cid, n_base, dist AS radius
       |  FROM rk WHERE rn = (19 * n_base + 19) // 20),
       |st AS (
       |  SELECT coalesce(r.cid, a.cid) AS cid,
       |         coalesce(max(r.n_base), 0) AS n_base, max(r.radius) AS radius,
       |         count(a.vec_id) AS n_new,
       |         CAST(sum(CASE WHEN r.radius IS NULL OR a.dist > r.radius
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_stale
       |  FROM rad r FULL JOIN arr a ON a.cid = r.cid
       |  GROUP BY coalesce(r.cid, a.cid))
       |SELECT cid AS cluster, n_base, radius, n_new,
       |       coalesce(n_stale, CAST(0 AS BIGINT)) AS n_stale,
       |       CASE WHEN n_new = 0 THEN CAST(0 AS BIGINT)
       |            ELSE (1000000 * coalesce(n_stale, 0)) // n_new END AS stale_ppm
       |FROM st""".stripMargin

  // --------------------------------------------------------------- q147

  /** q147: DELTA ADMISSION UNDER THE TWO-LEVEL MODEL, oracled — the
    * q142 verdict core over the hierarchical cells (the at-scale
    * admission [[graft.pipeline.IndexDelta.admitVectorsHier]] runs),
    * with the corpus-relative cap taken over the hier cell population
    * (k = 16 cells on the fixture). Same seam, same four-branch
    * semantics — the hash gate now pins the admission decision on
    * BOTH model shapes. */
  def hierDeltaAdmission(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    val m = hierModelFor(spark, dir)
    val asg = graft.CacheRegistry.getOrCache(spark, s"clustering.hierAsgD:$dir")(
      assignHierarchical(v, m)
        .select(col("vec_id"), col("x"), col("cluster"), col("dist")))
    graft.CacheRegistry.getOrCache(spark, s"clustering.hierAdmitVerd:$dir") {
      val arr = asg.filter(
        col("vec_id") % DriftMod === DriftRes ||
          col("vec_id") % AdmitReplayMod === 0)
      val corp = asg.filter(col("vec_id") % DriftMod =!= DriftRes)
        .select(col("vec_id").as("corpus_id"), col("x"), col("cluster"))
      val nCorp = corp.count()
      val capped = corp.groupBy(col("cluster")).agg(count(lit(1)).as("cell_n"))
        .filter(col("cell_n") > buildCapOf(nCorp, HierK))
        .select(col("cluster"))
      admitVerdictsOf(arr, corp, capped)
    }
  }

  val hierDeltaAdmissionSql: String =
    s"""WITH $hierCte,
       |fv AS (SELECT vec_id, x, ccl * 4 + fcl AS cid, fdist AS dist FROM fa2),
       |arr AS (
       |  SELECT vec_id, x, cid, dist FROM fv
       |  WHERE vec_id % $DriftMod = $DriftRes OR vec_id % $AdmitReplayMod = 0),
       |corp AS (SELECT vec_id, x, cid FROM fv WHERE vec_id % $DriftMod <> $DriftRes),
       |csz AS (SELECT cid, count(*) AS cell_n FROM corp GROUP BY cid),
       |cap AS (SELECT greatest(1, ($CapNum * count(*)) // ($CapDen * $HierK)) AS maxcell
       |        FROM corp),
       |capc AS (SELECT cid FROM csz, cap WHERE cell_n > maxcell),
       |abase AS (
       |  SELECT a.vec_id, a.x, a.cid, a.dist,
       |         CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END AS replay,
       |         CASE WHEN c.vec_id IS NULL AND p.cid IS NOT NULL
       |              THEN 1 ELSE 0 END AS cell_capped
       |  FROM arr a
       |  LEFT JOIN corp c ON c.vec_id = a.vec_id
       |  LEFT JOIN capc p ON p.cid = a.cid),
       |aclose AS (
       |  SELECT b.vec_id, count(*) AS nc
       |  FROM abase b JOIN corp k ON k.cid = b.cid
       |  WHERE b.replay = 0 AND b.cell_capped = 0
       |    AND ${fdistDuck("b.x", "k.x")} < $PruneT
       |  GROUP BY b.vec_id)
       |SELECT b.vec_id, b.cid AS cluster, b.dist, b.replay, b.cell_capped,
       |       coalesce(nc, CAST(0 AS BIGINT)) AS n_close,
       |       CASE WHEN b.replay = 0
       |              AND (b.cell_capped = 1 OR coalesce(nc, 0) = 0)
       |            THEN 1 ELSE 0 END AS admitted
       |FROM abase b LEFT JOIN aclose c2 ON c2.vec_id = b.vec_id""".stripMargin

  // --------------------------------------------------------------- q133

  /** q133: EMBEDDING CURATION FUNNEL — the vector-side capstone
    * mirroring q123's text funnel: one frame a curation run reports,
    * with per-stage survivor mass and retention ppm for the embedding
    * ladder — input → SemDeDup survivors (q125's verdicts) →
    * cluster-balanced diversity quota (q127's rule applied to the
    * SURVIVORS, the order a real pass runs: dedup first, then
    * subsample what remains). Mass = vector count + inertia (Σ dist —
    * how much geometric spread each stage keeps; a funnel that
    * retains count but collapses inertia kept the prototypical core
    * and threw away the diversity, the exact failure q127's
    * farthest-first rule exists to avoid).
    *
    * Scale shape: the stages reuse the audited q124/q125 plans; the
    * stage table is 3 rows and the input totals ride a window over
    * it — no scalar cross join, no extra corpus pass. */
  def embedCurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      fixedPoint(spark, dir))
    // model fetched before the frame memo (data order; no lock order)
    val cents = centroidsFor(spark, dir)
    val asg = graft.CacheRegistry.getOrCache(spark, s"clustering.flatAsgD:$dir")(
      assignWith(v, cents)
        .select(col("vec_id"), col("x"), col("cluster"), col("dist")))
    val surv = asg.join(
      semdedupPruneOf(asg.select(col("vec_id"), col("x"), col("cluster")))
        .filter(col("kept") === 1).select(col("vec_id")),
      "vec_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("dist").desc, col("vec_id"))
    val sampled = surv.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= SampleM)
    // inertia accumulates in DECIMAL(38,0) end to end: a BIGINT Σdist
    // wraps silently a few orders of magnitude past sf0.01 (Σ ≈ 1.5e16
    // there already, per-pair dist ≲ 3e13) while the oracle's HUGEINT
    // is exact — so the SUM is widened, not just the ppm numerator
    // (r12 form), and the result surface emits the exact digits as a
    // STRING (the q126/q115 convention: DECIMAL output defeats the
    // driver hash). The bounded ppm stays BIGINT.
    def stage(id: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_vecs"),
          coalesce(sum(col("dist").cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)")).as("inertia"))
        .select(lit(id).as("stage_id"), lit(name).as("stage"),
          col("n_vecs"), col("inertia"))
    val stages = stage(0, "input", asg)
      .unionAll(stage(1, "semdedup", surv))
      .unionAll(stage(2, "diversity_quota", sampled))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    stages
      .withColumn("in_vecs",
        sum(when(col("stage_id") === 0, col("n_vecs")).otherwise(0L)).over(wAll))
      .withColumn("in_inertia",
        sum(when(col("stage_id") === 0, col("inertia"))
          .otherwise(lit(0).cast("decimal(38,0)"))).over(wAll))
      .select(col("stage_id"), col("stage"), col("n_vecs"),
        col("inertia").cast("string").as("inertia"),
        expr("1000000 * n_vecs div in_vecs").as("vec_retention_ppm"),
        expr("""CAST(CASE WHEN in_inertia = 0 THEN 0
               |     ELSE (CAST(inertia AS DECIMAL(38,0)) * 1000000)
               |          div CAST(in_inertia AS DECIMAL(38,0)) END AS BIGINT)"""
          .stripMargin).as("inertia_retention_ppm"))
  }

  val embedCurationFunnelSql: String =
    s"""WITH $kmeansCte,
       |pr AS (
       |  SELECT b.vec_id, count(a.vec_id) AS n_close_smaller
       |  FROM a2 b LEFT JOIN a2 a
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |   AND ${fdistDuck("a.x", "b.x")} < $PruneT
       |  GROUP BY b.vec_id),
       |surv AS (
       |  SELECT a2.vec_id, a2.cid, a2.dist FROM a2
       |  JOIN pr ON pr.vec_id = a2.vec_id AND pr.n_close_smaller = 0),
       |samp AS (
       |  SELECT vec_id, cid, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY dist DESC, vec_id) AS rn
       |    FROM surv) WHERE rn <= $SampleM),
       |stages AS (
       |  SELECT 0 AS stage_id, 'input' AS stage, count(*) AS n_vecs,
       |         CAST(coalesce(sum(CAST(dist AS HUGEINT)), 0) AS HUGEINT) AS inertia FROM a2
       |  UNION ALL
       |  SELECT 1, 'semdedup', count(*), CAST(coalesce(sum(CAST(dist AS HUGEINT)), 0) AS HUGEINT) FROM surv
       |  UNION ALL
       |  SELECT 2, 'diversity_quota', count(*), CAST(coalesce(sum(CAST(dist AS HUGEINT)), 0) AS HUGEINT) FROM samp),
       |tot AS (
       |  SELECT *,
       |         CAST(sum(CASE WHEN stage_id = 0 THEN n_vecs ELSE 0 END) OVER () AS BIGINT) AS in_vecs,
       |         CAST(sum(CASE WHEN stage_id = 0 THEN inertia ELSE 0 END) OVER () AS HUGEINT) AS in_inertia
       |  FROM stages)
       |SELECT stage_id, stage, n_vecs, CAST(inertia AS VARCHAR) AS inertia,
       |       1000000 * n_vecs // in_vecs AS vec_retention_ppm,
       |       CAST(CASE WHEN in_inertia = 0 THEN 0
       |            ELSE (inertia * 1000000) // in_inertia END AS BIGINT) AS inertia_retention_ppm
       |FROM tot""".stripMargin

  // ------------------------------------------------- stored lifecycle

  /** Persist the trained centroid model as a [[FpIndex]] flat table
    * (cid, pos, v) — 1NF longs, so the round-trip is bit-exact and
    * the generation-append rebuild/pinned-reader contract applies
    * unchanged. k·d rows: model-sized, like the IVF quantizer. */
  def saveCentroids(spark: SparkSession, path: String, cents: Seq[Array[Long]]): Unit = {
    import spark.implicits._
    val rows = cents.zipWithIndex.flatMap { case (cv, cid) =>
      cv.zipWithIndex.map { case (v, pos) => (cid, pos, v) }
    }
    FpIndex.saveOrRebuildFlat(spark, path,
      rows.toDF("cid", "pos", "v").repartition(1))
  }

  /** Reload the centroid model (optionally pinned `asOf` a manifest
    * version). Reassembled in (cid, pos) order — exactly the arrays
    * [[saveCentroids]] wrote. */
  def loadCentroids(spark: SparkSession, path: String,
      asOf: Option[Int] = None): Seq[Array[Long]] = {
    val rows = FpIndex.loadFlat(spark, path, asOf)
      .select(col("cid"), col("pos"), col("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    require(rows.nonEmpty, s"no centroids stored at $path")
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, dims) => dims.sortBy(_._2).map(_._3) }
  }

  /** Serve-side assignment: quantize the ARRIVAL batch and assign it
    * against the stored model — zero corpus-sized work (the nightly
    * [[graft.pipeline.IndexBuild]] job paid the training pass). The
    * per-arrival cost is one map-only k·d dot-distance argmin, the
    * same O(delta) contract as the curation-gate probes. */
  def assignStored(spark: SparkSession, path: String, arrivals: DataFrame,
      asOf: Option[Int] = None): DataFrame = {
    val v = arrivals.select(col("vec_id"), quantize(col("embedding")).as("x"))
    assignWith(v, loadCentroids(spark, path, asOf))
      .select(col("vec_id"), col("cluster"), col("dist"))
  }

  /** Persist a two-level model as a [[FpIndex]] flat table — the same
    * manifest/generation/pinned-reader contract as the flat centroid
    * table. 1NF longs (kind, ccl, fcl, pos, v): kind 0 = kf meta,
    * kind 1 = coarse (ccl, pos), kind 2 = fine (ccl, fcl, pos).
    * ~2·k·d rows: model-sized. */
  def saveHierModel(spark: SparkSession, path: String, m: HierModel): Unit = {
    import spark.implicits._
    val rows =
      Seq((0, 0, 0, 0, m.kf.toLong)) ++
      m.coarse.indices.flatMap(c =>
        m.coarse(c).indices.map(p => (1, c, 0, p, m.coarse(c)(p)))) ++
      m.fine.indices.flatMap(c =>
        m.fine(c).indices.flatMap(f =>
          m.fine(c)(f).indices.map(p => (2, c, f, p, m.fine(c)(f)(p)))))
    FpIndex.saveOrRebuildFlat(spark, path,
      rows.toDF("kind", "ccl", "fcl", "pos", "v").repartition(1))
  }

  /** Reload the stored two-level model (optionally pinned `asOf`). */
  def loadHierModel(spark: SparkSession, path: String,
      asOf: Option[Int] = None): HierModel = {
    val rows = FpIndex.loadFlat(spark, path, asOf)
      .select(col("kind"), col("ccl"), col("fcl"), col("pos"), col("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    require(rows.nonEmpty, s"no hierarchical model stored at $path")
    val kf = rows.find(_._1 == 0).map(_._5.toInt)
      .getOrElse(sys.error(s"stored model at $path has no kf meta row"))
    def vecsOf(sub: Array[(Int, Int, Int, Int, Long)]): Array[Long] =
      sub.sortBy(_._4).map(_._5)
    val coarse = rows.filter(_._1 == 1).groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (_, sub) => vecsOf(sub) }
    val fine = rows.filter(_._1 == 2).groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (_, byC) =>
        byC.groupBy(_._3).toSeq.sortBy(_._1).map { case (_, sub) => vecsOf(sub) }
      }
    HierModel(coarse, fine, kf)
  }

  /** Serve-side two-level assignment against the stored model — the
    * O(√k)-per-arrival counterpart of [[assignStored]]. */
  def assignStoredHier(spark: SparkSession, path: String, arrivals: DataFrame,
      asOf: Option[Int] = None): DataFrame =
    assignHierarchical(
        arrivals.select(col("vec_id"), quantize(col("embedding")).as("x")),
        loadHierModel(spark, path, asOf))
      .select(col("vec_id"), col("cluster"), col("dist"))

  /** Persist a FRAME model under [[saveHierModel]]'s exact 1NF layout
    * (kind 0 = kf meta + the requested k in `pos`, kind 1 = coarse,
    * kind 2 = fine) — the fine frame explodes to its (ccl, fcl, pos,
    * v) rows DISTRIBUTED, never collected, so the save is legal at
    * any k. A literal-saved model loads through
    * [[loadHierModelFrames]] and vice versa (the meta row's k falls
    * back to counting fine rows for models saved before r13). */
  def saveHierModelDf(spark: SparkSession, path: String, m: HierModelDf): Unit = {
    import spark.implicits._
    val metaCoarse =
      (Seq((0, 0, 0, m.kTotal, m.kf.toLong)) ++
        m.coarse.indices.flatMap(c =>
          m.coarse(c).indices.map(p => (1, c, 0, p, m.coarse(c)(p)))))
        .toDF("kind", "ccl", "fcl", "pos", "v")
    val fineRows = m.fine
      .select(col("ccl"), col("fcl"), posexplode(col("fv")))
      .select(lit(2).as("kind"), col("ccl"), col("fcl"),
        col("pos"), col("col").as("v"))
    FpIndex.saveOrRebuildFlat(spark, path, metaCoarse.unionByName(fineRows))
  }

  /** Reload a stored two-level model with the fine half as a FRAME —
    * the serve-side loader past [[FineLiteralMaxEntries]]: only the
    * meta row and the coarse table (√k·d) are collected; the fine
    * table is reassembled distributed, pinned `asOf` like every
    * stored reader. Works on models written by either save path. */
  def loadHierModelFrames(spark: SparkSession, path: String,
      asOf: Option[Int] = None): HierModelDf = {
    val flat = FpIndex.loadFlat(spark, path, asOf)
    val metaCoarse = flat.filter(col("kind") < 2)
      .select(col("kind"), col("ccl"), col("pos"), col("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    require(metaCoarse.nonEmpty, s"no hierarchical model stored at $path")
    val meta = metaCoarse.find(_._1 == 0)
      .getOrElse(sys.error(s"stored model at $path has no kf meta row"))
    val kf = meta._4.toInt
    val coarse = metaCoarse.filter(_._1 == 1).groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (_, sub) => sub.sortBy(_._3).map(_._4) }
    val fine = flat.filter(col("kind") === 2)
      .groupBy(col("ccl"), col("fcl"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, v))), t -> t.v)")
        .as("fv"))
    // pre-r13 literal saves carry no k in the meta row (pos 0): fall
    // back to the fine-row count — one model-sized aggregate
    val kTotal = if (meta._3 > 0) meta._3
      else fine.count().toInt
    HierModelDf(coarse, fine, kf, kTotal)
  }

  /** Serve-side two-level assignment with the stored fine model as
    * DATA — [[assignStoredHier]]'s scale twin: arrivals equi-join the
    * stored fine table instead of receiving it as a task literal. */
  def assignStoredHierJoined(spark: SparkSession, path: String, arrivals: DataFrame,
      asOf: Option[Int] = None): DataFrame =
    assignHierarchicalJoined(
        arrivals.select(col("vec_id"), quantize(col("embedding")).as("x")),
        loadHierModelFrames(spark, path, asOf))
      .select(col("vec_id"), col("cluster"), col("dist"))

  /** The semantic gate's stored corpus side: (corpus_id, x, cluster) —
    * every corpus vector pre-assigned to its cell, so an arriving
    * vector probes ONE cell by equi-join instead of the corpus. */
  def assignedCorpus(v: DataFrame, cents: Seq[Array[Long]]): DataFrame =
    assignWith(v, cents)
      .select(col("vec_id").as("corpus_id"), col("x"), col("cluster"))

  /** Persist the assigned corpus in 1NF (corpus_id, cluster, pos, v) —
    * component ORDER matters for vectors (unlike the shingle sets),
    * so reassembly sorts each row's struct list by pos rather than
    * relying on storage order. */
  def saveAssignedCorpus(spark: SparkSession, path: String, df: DataFrame): Unit =
    FpIndex.saveOrRebuildFlat(spark, path,
      df.select(col("corpus_id"), col("cluster"), posexplode(col("x")))
        .toDF("corpus_id", "cluster", "pos", "v"))

  def loadAssignedCorpus(spark: SparkSession, path: String,
      asOf: Option[Int] = None): DataFrame =
    FpIndex.loadFlat(spark, path, asOf)
      .groupBy(col("corpus_id"), col("cluster"))
      .agg(collect_list(struct(col("pos"), col("v"))).as("pv"))
      .select(col("corpus_id"), col("cluster"),
        expr("transform(array_sort(pv), s -> s.v)").as("x"))

  /** BUILD-TIME hot-cell cap for the stored probe corpus — the
    * streaming semantic gate's q134: a degenerate cell (all-zero
    * embeddings, template collapse) makes every arrival landing in it
    * probe |cell| corpus rows, unbounded by k. The cap is applied
    * ONCE when the assigned-corpus table is built (the
    * [[graft.streaming.Incremental.videoFrameIndex]] hub-cap
    * precedent): members of over-cap cells are EXCLUDED from the
    * probe table and the cells recorded in a k-row side table the
    * gate flags verdicts from. Returns (probe, cappedCells) —
    * cappedCells is (cluster, cell_n). A cap ≤ 0 caps everything
    * (the [[semdedupPruneCapped]] degenerate-input convention). */
  def capAssignedCorpus(df: DataFrame, maxCell: Long): (DataFrame, DataFrame) = {
    val sizes = df.groupBy(col("cluster")).agg(count(lit(1)).as("cell_n"))
    val capped = sizes.filter(col("cell_n") > maxCell)
    val probe = df
      .join(broadcast(capped.select(col("cluster"))), Seq("cluster"), "left_anti")
      .select(df.columns.map(col): _*)
    (probe, capped)
  }

  /** q134's corpus-relative cap (112.5% of the mean cell, 9n/8k
    * integer floor) clamped to ≥ 1 for a BUILD: a stored probe table
    * with cap 0 would flag every arrival — retention-safe but
    * useless, so the nightly job never writes one. */
  def buildCapOf(n: Long, k: Int): Long =
    math.max(1L, (CapNum * n) / (CapDen * math.max(1, k)))

  /** Persist the capped-cells side table. A sentinel row (cluster −1,
    * the id no assignment produces) keeps the stored table nonempty:
    * the generation-append rebuild serves max-(gen, build) rows, so a
    * zero-row rebuild would have nothing carrying its build id and
    * the cutover could not win. [[loadCappedCells]] drops it. */
  def saveCappedCells(spark: SparkSession, path: String, capped: DataFrame): Unit = {
    import spark.implicits._
    FpIndex.saveOrRebuildFlat(spark, path,
      capped.select(col("cluster"), col("cell_n"))
        .unionByName(Seq((-1, 0L)).toDF("cluster", "cell_n")))
  }

  def loadCappedCells(spark: SparkSession, path: String,
      asOf: Option[Int] = None): DataFrame =
    FpIndex.loadFlat(spark, path, asOf).filter(col("cluster") >= 0)
}
