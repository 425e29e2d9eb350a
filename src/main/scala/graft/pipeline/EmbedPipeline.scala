package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** The VECTOR-side production pipeline — q133's deployment twin, the
  * embedding counterpart of [[CorpusPipeline.run]] (round-12 verdict
  * ask #3): the curation dataflow a vector store actually runs,
  * composed from the independently-oracled clustering operators —
  *
  *   embeddings
  *     → fixed-point quantize + k-means cells      (q124 operators)
  *     → SemDeDup prune (drop near-dups inside     (q125)
  *       cells, keep the smaller id)
  *     → cluster-balanced diversity quota           (q127's rule,
  *       applied to the SURVIVORS — dedup first,
  *       then subsample what remains)
  *     → manifest-committed publish                 (ManifestSink)
  *
  * Stage ordering is the short-circuit order a real pass runs (and
  * the order q133 audits): pruning before sampling means the quota
  * ranks only deduplicated vectors, so a near-dup pair can never
  * consume two sample slots.
  *
  * Stage masses are `observe` metrics collected DURING the single
  * write action — a count()+sum() per stage would re-execute the
  * pipeline prefix once per stage (the [[CorpusPipeline.run]]
  * contract); observation nodes count vectors AND sum inertia
  * (DECIMAL(38,0), the q133 widening) as rows stream through the one
  * real job. The input stage observes the assignment itself, placed
  * ABOVE the survivor join so every corpus vector passes it exactly
  * once; the prune's self-join reads the UNOBSERVED cached assignment
  * (an observation below both join branches would double-count).
  *
  * Scale shape: quantize+assign is one map pass over the cached
  * corpus (the training passes are the build job's budgeted cost, as
  * in [[IndexBuild.buildAll]]); the prune is the q125 cell-blocked
  * equi-join; the quota is a per-cell WindowGroupLimit (k keys,
  * fanning out with the corpus at k = kForCorpus(n)); the publish is
  * the 2-phase manifest commit. Nothing collects to the driver but
  * the k·d centroid model and the 3-row stage report.
  */
object EmbedPipeline {

  /** One funnel stage: vector count + exact inertia mass (Σ dist in
    * arbitrary-precision — the diagnostic q133's scaladoc motivates:
    * retaining count while collapsing inertia means the pass kept the
    * prototypical core and discarded the diversity). */
  case class VecStage(stage: String, nVecs: Long, inertia: BigInt)

  /** Runs the embedding curation funnel; publishes the curated vector
    * set (vec_id, cluster, dist, rank) to `outDir` via the
    * manifest-committed sink and returns the per-stage report —
    * spec-pinned stage-by-stage ≡ the oracled q133 audit table. */
  def run(spark: SparkSession, dir: String, outDir: String,
      k: Int = Clustering.K, m: Int = Clustering.SampleM,
      pruneT: Long = Clustering.PruneT): Seq[VecStage] = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      Clustering.fixedPoint(spark, dir))
    val cents = Clustering.trainCentroids(v, k)
    // shared materialization point: the observed input branch AND the
    // prune's self-join both read this one in-memory assignment
    val asg = graft.CacheRegistry.getOrCache(spark, s"pipeline.embedAsg:$dir:$k")(
      Clustering.assignWith(v, cents)
        .select(col("vec_id"), col("x"), col("cluster"), col("dist")))
    runStages(asg, outDir, m, pruneT)
  }

  /** The AT-SCALE funnel: same stages, same observe seams, but the
    * clustering is the TWO-LEVEL frame-model ladder — training
    * O(n·√k) with the fine model as frames end to end
    * ([[graft.operators.Clustering.trainHierarchicalFrames]], no k·d
    * literal or driver collect), assignment threshold-dispatched
    * ([[graft.operators.Clustering.assignHier]]). This is the entry
    * point a deployment calls at k = kForCorpus(n), where [[run]]'s
    * flat Lloyd is O(n·k) = n²/cell and its centroid literal is the
    * r12-graded transport ceiling. The prune seam takes the
    * hierarchical cells unchanged (q131's proof: cells are cells). */
  def runHier(spark: SparkSession, dir: String, outDir: String,
      k: Int = Clustering.HierK, m: Int = Clustering.SampleM,
      pruneT: Long = Clustering.PruneT): Seq[VecStage] = {
    val v = graft.CacheRegistry.getOrCache(spark, s"clustering.fixed:$dir")(
      Clustering.fixedPoint(spark, dir))
    val hm = Clustering.trainHierarchicalFrames(v, k)
    val asg = graft.CacheRegistry.getOrCache(spark, s"pipeline.embedAsgHier:$dir:$k")(
      Clustering.assignHier(v, hm)
        .select(col("vec_id"), col("x"), col("cluster"), col("dist")))
    runStages(asg, outDir, m, pruneT)
  }

  /** Shared funnel core over a cached (vec_id, x, cluster, dist)
    * assignment: observe input mass, SemDeDup prune, per-cell
    * diversity quota, manifest publish, 3-row stage report. */
  private def runStages(asg: DataFrame, outDir: String, m: Int,
      pruneT: Long): Seq[VecStage] = {
    val keptIds = Clustering.semdedupPruneOf(
        asg.select(col("vec_id"), col("x"), col("cluster")), pruneT)
      .filter(col("kept") === 1).select(col("vec_id"))

    val oIn = Observation("embed_input")
    val oDedup = Observation("embed_semdedup")
    val oQuota = Observation("embed_quota")
    def observed(df: DataFrame, o: Observation): DataFrame =
      df.observe(o, count(lit(1)).as("rows"),
        coalesce(sum(col("dist").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("inertia"))

    val surv = observed(observed(asg, oIn).join(keptIds, "vec_id"), oDedup)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("dist").desc, col("vec_id"))
    val curated = observed(
        surv.withColumn("rank", row_number().over(w)).filter(col("rank") <= m),
        oQuota)
      .select(col("vec_id"), col("cluster"), col("dist"), col("rank"))
    curated.write.format("graft.sources.ManifestSink")
      .option("path", outDir).mode(SaveMode.Append).save()

    def stageOf(name: String, o: Observation) = VecStage(name,
      o.get("rows").asInstanceOf[Long],
      BigInt(o.get("inertia").asInstanceOf[java.math.BigDecimal].toBigInteger))
    Seq(stageOf("input", oIn), stageOf("semdedup", oDedup),
      stageOf("diversity_quota", oQuota))
  }

  /** Build-and-publish timing harness (the PERF.md row): one [[run]]
    * over `SPARK_GRAFT_SF_DIR`, printing the stage report and the
    * wall clock as one JSON line. */
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-embedpipe").toString)
    val spark = graft.GraftSession.local()
    val t0 = System.nanoTime()
    val stages = run(spark, dir, out)
    val sec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val stagesHier = runHier(spark, dir, s"$out-hier")
    val hierSec = (System.nanoTime() - t1) / 1e9
    def json(ss: Seq[VecStage]) = ss.map(s =>
      s""""${s.stage}": {"n_vecs": ${s.nVecs}, "inertia": "${s.inertia}"}""")
      .mkString(", ")
    println(f"""{"run_sec": $sec%.3f, ${json(stages)}, """ +
      f""""run_hier_sec": $hierSec%.3f, """ +
      f""""hier": {${json(stagesHier)}}, "sf": "$dir", "out": "$out"}""")
    spark.stop()
  }
}
