package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{Clustering, Dedup, Extended, FpIndex, Pca, Similarity, TextAnalysis}
import graft.streaming.Incremental

/** ONE-SHOT NIGHTLY INDEX BUILD + STORED-ONLY SERVE (round-10 verdict
  * ask #3). Every stored serving artifact the library defines exists
  * per family ([[graft.operators.AnnIndex]], [[FpIndex]], the CMS /
  * volume-stats adapters) — but a deployment runs ONE build job per
  * corpus version and ONE kind of serving session. This object is
  * those two halves:
  *
  *  - [[buildAll]]: persist every serving artifact for a corpus dir
  *    under one index root, in one job. Corpus-sized work is the
  *    build's budget BY DESIGN — each artifact is one scan/aggregate
  *    over the fixture tables, the shingle pipeline is shared between
  *    the band and shingle tables through the operators' existing
  *    CacheRegistry materialization points, and nothing here collects
  *    beyond the model-sized ANN artifacts (quantizer ≈ √n, codebook).
  *    Re-runs rebuild IN PLACE through the generation-append path
  *    ([[FpIndex.rebuildFlat]]): atomic cutover, pinned readers
  *    unaffected, racing builds abort cleanly.
  *
  *  - [[loadAll]]: open the stored artifacts for a serving session,
  *    PINNED by default to each table's version at open
  *    ([[FpIndex.tableVersion]]) so a nightly rebuild landing
  *    mid-session can never change, empty, or mix what this session
  *    serves. Everything downstream — the curation gate, the
  *    retrieval probe, novelty scoring, CMS estimates, the volume-
  *    anomaly verdict — runs against these frames with ZERO
  *    corpus-sized recompute: the serving session never touches the
  *    corpus parquet (IndexBuildSpec asserts the served plans scan
  *    only index tables). The ANN tiers serve through their own
  *    loaders at [[ServingIndexes.annPath]] (`Similarity.ivfTopKServe`
  *    / `pqAdcTopKServe` / `ivfPqTopKServe`): the stored code table
  *    replaces the corpus scan; only declared-small query rows are
  *    re-derived.
  *
  * At 100 TB this split is the whole deployment story: the build job
  * pays the corpus passes once per corpus version on the batch tier;
  * every ingest batch and query session is O(delta)/O(|Q|·k) probes
  * into manifest-backed tables (the SoakDocs delta-isolation and
  * SoakAnn serve rows quantify both sides).
  */
object IndexBuild {

  /** Sub-table layout under the index root. */
  val KeysT = "keys"; val BandsT = "bands"; val ShinglesT = "shingles"
  val PostingsT = "postings"; val CmsT = "cms"; val NoveltyT = "novelty"
  val VolStatsT = "volstats"; val AnnT = "ann"; val CentroidsT = "centroids"
  val PcaT = "pca"; val AssignedT = "assigned"; val CappedT = "assigned_capped"
  val HierModelT = "hier_model"; val AssignedHierT = "assigned_hier"
  val CappedHierT = "assigned_hier_capped"; val RadiiT = "cell_radii"
  val RadiiHierT = "cell_radii_hier"
  /** 1-row build meta for the TEXT artifacts: (n_docs, n_keys) at the
    * nightly build — the staleness denominator
    * [[IndexDelta.textStaleness]] compares admitted growth against.
    * Written by the build only; admissions never touch it. */
  val TextMetaT = "text_meta"

  /** Persist every serving artifact for `dir` under `root` — the
    * nightly build job. Safe to re-run against a live index root:
    * each table cuts over atomically via the generation-append
    * rebuild. */
  def buildAll(spark: SparkSession, dir: String, root: String): Unit = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // exact-dup key set, band index, shingle sets — the curation gate's
    // and delta-dedup's stored sides (band/shingle share one shingle
    // pipeline through Dedup's cache entries)
    FpIndex.saveOrRebuildFlat(spark, s"$root/$KeysT", Incremental.corpusKeySet(docs))
    FpIndex.saveOrRebuildFlat(spark, s"$root/$BandsT", Dedup.bandIndexOf(spark, dir))
    FpIndex.saveOrRebuildShingles(spark, s"$root/$ShinglesT", Dedup.shingleIndexOf(spark, dir))
    // BM25 posting index — the retrieval probe's stored side
    FpIndex.saveOrRebuildFlat(spark, s"$root/$PostingsT", Incremental.postingTable(docs))
    buildTextMeta(spark, docs, root)
    // CMS sketch + novelty shingle set — the monitoring gates' stored sides
    FpIndex.saveOrRebuildFlat(spark, s"$root/$CmsT", TextAnalysis.cmsSketchOf(docs))
    FpIndex.saveOrRebuildFlat(spark, s"$root/$NoveltyT", Incremental.corpusShingleSet(docs))
    // volume baseline — sufficient statistics, model-sized, mergeable
    val typed = Tables.events(spark, dir)
      .selectExpr("event_type", s"${Tables.epochSecSql} div 86400 AS day_no")
    FpIndex.saveOrRebuildFlat(spark, s"$root/$VolStatsT",
      Extended.volumeStatsOf(typed).withColumn("s2", col("s2").cast("string")))
    // ANN artifacts: IVF quantizer + flat-PQ codebook/codes + the SQ8
    // codebook/codes (the q44/q82/q145 serving tiers; the composed
    // IVF+PQ tier builds its own root)
    Similarity.buildIvfIndex(spark, dir, s"$root/$AnnT")
    Similarity.buildPqIndex(spark, dir, s"$root/$AnnT")
    Similarity.buildSq8Index(spark, dir, s"$root/$AnnT")
    // k-means centroid model + the semantic gate's stored side — also
    // the REFRESH unit IndexDelta.refreshIfStale re-runs when the
    // staleness monitor trips between nightly builds
    val fixed = Clustering.fixedPoint(spark, dir)
    val nVecs = buildFlatVectorArtifacts(spark, fixed, root)
    // PCA basis — the dim-reduction serve side (projected arrivals,
    // cheaper projected-IVF ANN); fit shares the centroid build's
    // cached fixed-point corpus and the q126 Gram pass's dimStats
    Pca.saveModel(spark, s"$root/$PcaT", Pca.fit(spark, dir))
    buildHierVectorArtifacts(spark, fixed, root, Some(nVecs))
  }

  /** The TWO-LEVEL vector serving artifacts as one rebuildable unit —
    * the at-scale gate's stored side: the two-level FRAME model at the
    * kForCorpus operating point (floored at 4 so kc >= 2 — the
    * multi-probe gate needs a second coarse cell), the corpus assigned
    * by it hot-cell-capped by the same 9n/8k rule, and the k-row hier
    * radius table. The training and save paths never carry the fine
    * table as a literal or driver collect (the r12-closed transport
    * posture). Extracted from [[buildAll]] (the
    * [[buildFlatVectorArtifacts]] precedent) so
    * [[IndexDelta.refreshIfStaleHier]] can retrain JUST this unit when
    * the hier staleness monitor trips mid-cycle; each table cuts over
    * atomically via the generation-append rebuild. */
  def buildHierVectorArtifacts(spark: SparkSession, fixed: DataFrame,
      root: String, nVecsKnown: Option[Long] = None): Long = {
    val nVecs = nVecsKnown.getOrElse(fixed.count())
    val hk = math.max(4, Clustering.kForCorpus(nVecs))
    val hm = Clustering.trainHierarchicalFrames(fixed, hk)
    Clustering.saveHierModelDf(spark, s"$root/$HierModelT", hm)
    val assignedH = Clustering.assignHier(fixed, hm)
      .select(col("vec_id").as("corpus_id"), col("x"), col("cluster"))
    val (probeH, cappedH) = Clustering.capAssignedCorpus(
      assignedH, Clustering.buildCapOf(nVecs, hm.kTotal))
    Clustering.saveAssignedCorpus(spark, s"$root/$AssignedHierT", probeH)
    Clustering.saveCappedCells(spark, s"$root/$CappedHierT", cappedH)
    // hier staleness radii — the flat unit's RadiiT twin (one window
    // pass over the two-level assignment, k rows)
    FpIndex.saveOrRebuildFlat(spark, s"$root/$RadiiHierT",
      Clustering.cellRadiiOf(Clustering.assignHier(fixed, hm)
        .select(col("cluster"), col("vec_id"), col("dist"))))
    nVecs
  }

  /** The FLAT vector serving artifacts as one rebuildable unit: the
    * q124-rule centroid model, the corpus pre-assigned to its cells
    * HOT-CELL-CAPPED at build time (q134's corpus-relative 9n/8k cap,
    * the videoFrameIndex hub-cap precedent — members of over-cap
    * cells never enter the probe table, so a degenerate mega-cell
    * costs an arrival ZERO probe rows), and the k-row capped-cells
    * side table the gate flags verdicts from. Extracted from
    * [[buildAll]] so [[IndexDelta.refreshIfStale]] can retrain JUST
    * this unit when the staleness monitor trips mid-cycle; each table
    * cuts over atomically via the generation-append rebuild. Returns
    * the corpus vector count (the one pass it already pays). */
  def buildFlatVectorArtifacts(spark: SparkSession, fixed: DataFrame,
      root: String): Long = {
    val cents = Clustering.trainCentroids(fixed)
    Clustering.saveCentroids(spark, s"$root/$CentroidsT", cents)
    val assigned = Clustering.assignedCorpus(fixed, cents)
    val nVecs = assigned.count() // one pass — build-job budget
    val (probeCorpus, cappedCells) = Clustering.capAssignedCorpus(
      assigned, Clustering.buildCapOf(nVecs, cents.length))
    Clustering.saveAssignedCorpus(spark, s"$root/$AssignedT", probeCorpus)
    Clustering.saveCappedCells(spark, s"$root/$CappedT", cappedCells)
    // per-cell p95 staleness radii (q143's stored side): k rows derived
    // from the FULL assignment in one window pass — the per-batch
    // staleness monitor then never re-scans the probe corpus
    FpIndex.saveOrRebuildFlat(spark, s"$root/$RadiiT", Clustering.cellRadiiOf(
      Clustering.assignWith(fixed, cents)
        .select(col("cluster"), col("vec_id"), col("dist"))))
    nVecs
  }

  /** Write the 1-row [[TextMetaT]] build stamp — counted over the same
    * `docs` frame the text artifacts were built from (two tiny aggs on
    * the build budget). Factored so [[IndexDelta.refreshTextIfStale]]
    * re-stamps it after a selective text rebuild. */
  def buildTextMeta(spark: SparkSession, docs: DataFrame, root: String): Unit = {
    import spark.implicits._
    val nDocs = docs.count()
    val nKeys = Incremental.corpusKeySet(docs).count()
    FpIndex.saveOrRebuildFlat(spark, s"$root/$TextMetaT",
      Seq((nDocs, nKeys)).toDF("n_docs", "n_keys").repartition(1))
  }

  /** The loaded serving surface: every stored frame a session probes,
    * plus the ANN root for the vector-serve entry points. */
  final case class ServingIndexes(
      keys: DataFrame,
      bands: DataFrame,
      shingles: DataFrame,
      postings: DataFrame,
      cms: DataFrame,
      novelty: DataFrame,
      volumeStats: DataFrame,
      annPath: String,
      centroidsPath: String,
      pcaPath: String,
      assignedCorpus: DataFrame,
      cappedCells: DataFrame,
      hierModelPath: String,
      assignedHierCorpus: DataFrame,
      cappedHierCells: DataFrame,
      pins: Map[String, Int])

  /** Open the stored index root for a serving session. `pinned=true`
    * (the default) pins every table to its version at open — the
    * interleaved-reader contract under which a concurrent
    * [[buildAll]] re-run cannot perturb this session. */
  def loadAll(spark: SparkSession, root: String, pinned: Boolean = true): ServingIndexes = {
    def pinOf(p: String): Option[Int] =
      if (pinned) Some(FpIndex.tableVersion(p)) else None
    def path(t: String): String = s"$root/$t"
    val pins = Seq(KeysT, BandsT, ShinglesT, PostingsT, CmsT, NoveltyT, VolStatsT,
        CentroidsT, PcaT, AssignedT, CappedT, HierModelT, AssignedHierT,
        CappedHierT)
      .flatMap(t => pinOf(path(t)).map(t -> _)).toMap
    def flat(t: String): DataFrame = FpIndex.loadFlat(spark, path(t), pins.get(t))
    ServingIndexes(
      keys = flat(KeysT),
      bands = flat(BandsT),
      shingles = FpIndex.loadShingles(spark, path(ShinglesT), pins.get(ShinglesT)),
      postings = flat(PostingsT),
      // delta-appended partial sketches merge by sum on load (identity
      // when delta-free; see TextAnalysis.cmsLoadMerged)
      cms = TextAnalysis.cmsLoadMerged(spark, path(CmsT), pins.get(CmsT)),
      novelty = flat(NoveltyT),
      volumeStats = flat(VolStatsT).withColumn("s2", col("s2").cast("decimal(38,0)")),
      annPath = path(AnnT),
      centroidsPath = path(CentroidsT),
      pcaPath = path(PcaT),
      assignedCorpus = Clustering.loadAssignedCorpus(
        spark, path(AssignedT), pins.get(AssignedT)),
      cappedCells = Clustering.loadCappedCells(
        spark, path(CappedT), pins.get(CappedT)),
      hierModelPath = path(HierModelT),
      assignedHierCorpus = Clustering.loadAssignedCorpus(
        spark, path(AssignedHierT), pins.get(AssignedHierT)),
      cappedHierCells = Clustering.loadCappedCells(
        spark, path(CappedHierT), pins.get(CappedHierT)),
      pins = pins)
  }

  /** Build-once / serve-many timing harness (the PERF.md row): one
    * [[buildAll]] over `SPARK_GRAFT_SF_DIR`, then a fresh session
    * opens the stored root and runs the full serving surface — the
    * curation gate on a small arrival batch, the retrieval probe, the
    * novelty gate, a CMS estimate, the volume verdict, and the two
    * ANN serves. Prints one JSON line. */
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-indexroot").toString)
    val spark = GraftSession.local()
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val buildSec = timed(buildAll(spark, dir, root))
    // the serving session: fresh state, nothing trained or cached here
    val serve = spark.newSession()
    import serve.implicits._
    val idx = loadAll(serve, root)
    val arrivals = Seq(
      (900001L, "the quick brown fox jumps over the lazy dog by the river"),
      (900002L, "an entirely novel arrival about orbital imaging platforms"),
      (900003L, "hi")).toDF("doc_id", "text")
    val gateSec = timed(
      Incremental.curationGateStream(arrivals, idx.keys, idx.bands, idx.shingles)
        .write.format("noop").mode("overwrite").save())
    val probes = arrivals.select(col("doc_id").as("query_id"), col("text"))
    val retrSec = timed(
      Incremental.retrievalStream(probes, idx.postings)
        .write.format("noop").mode("overwrite").save())
    val novSec = timed(
      Incremental.noveltyStream(arrivals, idx.novelty)
        .write.format("noop").mode("overwrite").save())
    val annSec = timed {
      Similarity.ivfTopKServe(serve, dir, idx.annPath)
        .write.format("noop").mode("overwrite").save()
      Similarity.pqAdcTopKServe(serve, dir, idx.annPath)
        .write.format("noop").mode("overwrite").save()
    }
    val clusterSec = timed(
      Clustering.assignStored(serve, idx.centroidsPath,
          Tables.embeddings(serve, dir).filter(col("vec_id") % 25 === 0),
          idx.pins.get(CentroidsT))
        .write.format("noop").mode("overwrite").save())
    val pcaSec = timed(
      Pca.projectStored(serve, idx.pcaPath,
          Tables.embeddings(serve, dir).filter(col("vec_id") % 25 === 0),
          8, idx.pins.get(PcaT))
        .write.format("noop").mode("overwrite").save())
    val semGateSec = timed {
      val storedCents = Clustering.loadCentroids(
        serve, idx.centroidsPath, idx.pins.get(CentroidsT))
      Incremental.semanticNearDupGate(
          Tables.embeddings(serve, dir).filter(col("vec_id") % 25 === 0)
            .withColumn("vec_id", col("vec_id") + lit(900000000L)),
          storedCents, idx.assignedCorpus, idx.cappedCells)
        .write.format("noop").mode("overwrite").save()
    }
    val semGate2Sec = timed {
      val storedCents = Clustering.loadCentroids(
        serve, idx.centroidsPath, idx.pins.get(CentroidsT))
      Incremental.semanticNearDupGate2(
          Tables.embeddings(serve, dir).filter(col("vec_id") % 25 === 0)
            .withColumn("vec_id", col("vec_id") + lit(900000000L)),
          storedCents, idx.assignedCorpus, idx.cappedCells)
        .write.format("noop").mode("overwrite").save()
    }
    val semGateHier2Sec = timed {
      val hm = Clustering.collectHierModel(Clustering.loadHierModelFrames(
        serve, idx.hierModelPath, idx.pins.get(HierModelT)))
      Incremental.semanticNearDupGateHier2(
          Tables.embeddings(serve, dir).filter(col("vec_id") % 25 === 0)
            .withColumn("vec_id", col("vec_id") + lit(900000000L)),
          hm, idx.assignedHierCorpus, idx.cappedHierCells)
        .write.format("noop").mode("overwrite").save()
    }
    // the round-14 ingest-batch half: admit a doc batch and a vector
    // batch into the stored root, then run the staleness monitor from
    // the stored k-row radius table — the full deployment loop
    // (build → serve → admit → monitor) in one capture
    val admitDocsSec = timed(
      IndexDelta.admitDocs(serve, root,
          arrivals.withColumn("doc_id", col("doc_id") + lit(1000L)))
        .write.format("noop").mode("overwrite").save())
    val freshVecs = Tables.embeddings(serve, dir)
      .filter(col("vec_id") % 25 === 7)
      .withColumn("vec_id", col("vec_id") + lit(910000000L))
    val admitVecSec = timed(
      IndexDelta.admitVectors(serve, root, freshVecs)
        .write.format("noop").mode("overwrite").save())
    val staleSec = timed(
      IndexDelta.storedStaleness(serve, root,
          Tables.embeddings(serve, dir).filter(col("vec_id") % 25 === 9))
        .write.format("noop").mode("overwrite").save())
    println(f"""{"build_sec": $buildSec%.3f, "serve_gate_sec": $gateSec%.3f, """ +
      f""""serve_retrieval_sec": $retrSec%.3f, "serve_novelty_sec": $novSec%.3f, """ +
      f""""serve_ann_sec": $annSec%.3f, "serve_cluster_sec": $clusterSec%.3f, """ +
      f""""serve_pca_sec": $pcaSec%.3f, "serve_semgate_sec": $semGateSec%.3f, """ +
      f""""serve_semgate2_sec": $semGate2Sec%.3f, """ +
      f""""serve_semgate_hier2_sec": $semGateHier2Sec%.3f, """ +
      f""""admit_docs_sec": $admitDocsSec%.3f, """ +
      f""""admit_vectors_sec": $admitVecSec%.3f, """ +
      f""""staleness_sec": $staleSec%.3f, """ +
      f""""sf": "$dir", "root": "$root"}""")
    spark.stop()
  }
}
