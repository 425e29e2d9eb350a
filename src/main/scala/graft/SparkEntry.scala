package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in
  * `oracleSql` (same bare table names; the driver registers the
  * sf-dir parquet files under those names). Column names and rounding
  * are aligned on both sides because the driver's compare sorts
  * columns by name before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.discovery(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * A ListMap, deliberately: a 42-entry immutable `Map(...)` is a
    * HashMap whose iteration order changes whenever entries are added,
    * so Bench/Verify ran queries in hash order — adding 6 queries in
    * round 3 silently reshuffled the bench execution order (the hidden
    * variable behind the q04 timing regression investigated in
    * PERF.md). Insertion order makes runs reproducible round-over-round. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_discovery" -> ((s, d) => Relational.discovery(s, d)),
    "q02_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q03_topk" -> ((s, d) => Relational.topK(s, d)),
    "q04_dim_join" -> ((s, d) => Relational.dimJoin(s, d)),
    "q05_anti_join" -> ((s, d) => Relational.antiJoin(s, d)),
    "q06_semi_join" -> ((s, d) => Relational.semiJoin(s, d)),
    "q07_exclude_set" -> ((s, d) => Relational.excludeSet(s, d)),
    "q08_latest_per_key" -> ((s, d) => Relational.latestPerKey(s, d)),
    "q09_config_cross" -> ((s, d) => Relational.configCross(s, d)),
    "q10_set_ops" -> ((s, d) => Relational.setOps(s, d)),
    "q11_range_join" -> ((s, d) => Relational.rangeJoin(s, d)),
    "q12_props_filter" -> ((s, d) => Relational.propsFilter(s, d)),
    "q13_time_ops" -> ((s, d) => Relational.timeOps(s, d)),
    "q14_filenames" -> ((s, d) => Relational.filenames(s, d)),
    "q15_pixel_stats" -> ((s, d) => Pixels.pixelStats(s, d)),
    "q16_fanout" -> ((s, d) => Relational.fanout(s, d)),
    "q17_exact_dedup" -> ((s, d) => Dedup.exactDedup(s, d)),
    "q18_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q19_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q20_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "q21_cosine_topk" -> ((s, d) => Similarity.cosineTopK(s, d)),
    "q22_ann_lsh" -> ((s, d) => Similarity.annTopK(s, d)),
    "q23_token_quality" -> ((s, d) => TextAnalysis.tokenQuality(s, d)),
    "q24_lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "q25_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "q26_spatial_join" -> ((s, d) => Spatial.spatialJoin(s, d)),
    "q27_geometry_prep" -> ((s, d) => Spatial.geometryPrep(s, d)),
    "q28_raster_clip" -> ((s, d) => Pixels.rasterClip(s, d)),
    "q29_multimodal" -> ((s, d) => Extended.multimodal(s, d)),
    "q30_rollup" -> ((s, d) => Extended.rollupAgg(s, d)),
    "q31_window_suite" -> ((s, d) => Extended.windowSuite(s, d)),
    "q32_asof_join" -> ((s, d) => Extended.asofJoin(s, d)),
    "q33_sessionize" -> ((s, d) => Extended.sessionize(s, d)),
    "q34_quantiles" -> ((s, d) => Extended.quantiles(s, d)),
    "q35_embedding_dedup" -> ((s, d) => Similarity.embeddingDedup(s, d)),
    "q36_cube" -> ((s, d) => Extended.cubeAgg(s, d)),
    "q37_interval_join" -> ((s, d) => Extended.intervalJoinQuery(s, d)),
    "q38_pivot" -> ((s, d) => Extended.pivotAgg(s, d)),
    "q39_stats_moments" -> ((s, d) => Extended.statsMoments(s, d)),
    "q40_posexplode" -> ((s, d) => Extended.posExplodeWords(s, d)),
    // no oracle entry (sketches are engine-specific); driver applies
    // its rows-only check, SketchSpec owns the accuracy contract
    "q41_sketch_summary" -> ((s, d) => Extended.sketchSummary(s, d)),
    "q42_dataset_split" -> ((s, d) => Extended.datasetSplit(s, d)),
    "q43_lang_id_trigram" -> ((s, d) => TextAnalysis.langIdTrigram(s, d)),
    "q44_ivf_ann" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "q45_bpe_tokens" -> ((s, d) => TextAnalysis.bpeTokens(s, d)),
    "q46_grouping_sets" -> ((s, d) => Extended.groupingSetsAgg(s, d)),
    "q47_pii_scrub" -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "q48_session_window" -> ((s, d) => Extended.sessionWindowAgg(s, d)),
    "q49_set_ops_onepass" -> ((s, d) => Relational.setOpsOnePass(s, d)),
    "q50_vocab_topk" -> ((s, d) => TextAnalysis.vocabTopK(s, d)),
    "q51_stratified_sample" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "q52_decontaminate" -> ((s, d) => Dedup.decontaminate(s, d)),
    "q53_repetition" -> ((s, d) => TextAnalysis.repetition(s, d)),
    "q54_tfidf_topk" -> ((s, d) => TextAnalysis.tfidfTopK(s, d)),
    "q55_chunks" -> ((s, d) => TextAnalysis.chunkDocs(s, d)),
    "q56_simhash_neardup" -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "q57_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(s, d)),
    "q58_importance_sample" -> ((s, d) => TextAnalysis.importanceSample(s, d)),
    "q59_funnel" -> ((s, d) => Extended.funnel(s, d)),
    "q60_components" -> ((s, d) => Components.componentsQuery(s, d)),
    "q61_quantize" -> ((s, d) => Similarity.quantize(s, d)),
    "q62_pack_bins" -> ((s, d) => TextAnalysis.packBins(s, d)),
    "q63_event_features" -> ((s, d) => Extended.eventFeatures(s, d)),
    "q64_temperature_mix" -> ((s, d) => TextAnalysis.temperatureMix(s, d)),
    "q65_retention" -> ((s, d) => Extended.retention(s, d)),
    "q66_source_divergence" -> ((s, d) => TextAnalysis.sourceDivergence(s, d)),
    "q67_skew_profile" -> ((s, d) => Relational.skewProfile(s, d)),
    "q68_unpivot_profile" -> ((s, d) => Extended.unpivotProfile(s, d)),
    "q69_cdc_apply" -> ((s, d) => Extended.cdcApply(s, d)),
    "q70_scd2_build" -> ((s, d) => Extended.scd2Build(s, d)),
    "q71_gap_fill" -> ((s, d) => Extended.gapFill(s, d)),
    "q72_fuzzy_match" -> ((s, d) => Dedup.fuzzyMatch(s, d)),
    "q73_transition_profile" -> ((s, d) => Extended.transitionProfile(s, d)),
    "q74_outliers" -> ((s, d) => Extended.outliers(s, d)),
    "q75_ref_audit" -> ((s, d) => Relational.refAudit(s, d)),
    "q76_incremental_agg" -> ((s, d) => Extended.incrementalAgg(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = ListMap(
    "q01_discovery" -> Relational.discoverySql,
    "q02_pricing_summary" -> Relational.pricingSummarySql,
    "q03_topk" -> Relational.topKSql,
    "q04_dim_join" -> Relational.dimJoinSql,
    "q05_anti_join" -> Relational.antiJoinSql,
    "q06_semi_join" -> Relational.semiJoinSql,
    "q07_exclude_set" -> Relational.excludeSetSql,
    "q08_latest_per_key" -> Relational.latestPerKeySql,
    "q09_config_cross" -> Relational.configCrossSql,
    "q10_set_ops" -> Relational.setOpsSql,
    "q11_range_join" -> Relational.rangeJoinSql,
    "q12_props_filter" -> Relational.propsFilterSql,
    "q13_time_ops" -> Relational.timeOpsSql,
    "q14_filenames" -> Relational.filenamesSql,
    "q15_pixel_stats" -> Pixels.pixelStatsSql,
    "q16_fanout" -> Relational.fanoutSql,
    "q17_exact_dedup" -> Dedup.exactDedupSql,
    "q18_minhash_lsh" -> Dedup.minhashLshSql,
    "q19_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "q20_simhash" -> Dedup.simhashSql,
    "q21_cosine_topk" -> Similarity.cosineTopKSql,
    "q22_ann_lsh" -> Similarity.annTopKSql,
    "q23_token_quality" -> TextAnalysis.tokenQualitySql,
    "q24_lang_id" -> TextAnalysis.langIdSql,
    "q25_fingerprint" -> TextAnalysis.fingerprintSql,
    "q26_spatial_join" -> Spatial.spatialJoinSql,
    "q27_geometry_prep" -> Spatial.geometryPrepSql,
    "q28_raster_clip" -> Pixels.rasterClipSql,
    "q29_multimodal" -> Extended.multimodalSql,
    "q30_rollup" -> Extended.rollupAggSql,
    "q31_window_suite" -> Extended.windowSuiteSql,
    "q32_asof_join" -> Extended.asofJoinSql,
    "q33_sessionize" -> Extended.sessionizeSql,
    "q34_quantiles" -> Extended.quantilesSql,
    "q35_embedding_dedup" -> Similarity.embeddingDedupSql,
    "q36_cube" -> Extended.cubeAggSql,
    "q37_interval_join" -> Extended.intervalJoinQuerySql,
    "q38_pivot" -> Extended.pivotAggSql,
    "q39_stats_moments" -> Extended.statsMomentsSql,
    "q40_posexplode" -> Extended.posExplodeWordsSql,
    "q42_dataset_split" -> Extended.datasetSplitSql,
    "q43_lang_id_trigram" -> TextAnalysis.langIdTrigramSql,
    "q44_ivf_ann" -> Similarity.ivfTopKSql,
    "q45_bpe_tokens" -> TextAnalysis.bpeTokensSql,
    "q46_grouping_sets" -> Extended.groupingSetsAggSql,
    "q47_pii_scrub" -> TextAnalysis.piiScrubSql,
    "q48_session_window" -> Extended.sessionWindowAggSql,
    "q49_set_ops_onepass" -> Relational.setOpsOnePassSql,
    "q50_vocab_topk" -> TextAnalysis.vocabTopKSql,
    "q51_stratified_sample" -> TextAnalysis.stratifiedSampleSql,
    "q52_decontaminate" -> Dedup.decontaminateSql,
    "q53_repetition" -> TextAnalysis.repetitionSql,
    "q54_tfidf_topk" -> TextAnalysis.tfidfTopKSql,
    "q55_chunks" -> TextAnalysis.chunkDocsSql,
    "q56_simhash_neardup" -> Dedup.simhashNearDupSql,
    "q57_semantic_dedup" -> Similarity.semanticDedupSql,
    "q58_importance_sample" -> TextAnalysis.importanceSampleSql,
    "q59_funnel" -> Extended.funnelSql,
    "q60_components" -> Components.componentsQuerySql,
    "q61_quantize" -> Similarity.quantizeSql,
    "q62_pack_bins" -> TextAnalysis.packBinsSql,
    "q63_event_features" -> Extended.eventFeaturesSql,
    "q64_temperature_mix" -> TextAnalysis.temperatureMixSql,
    "q65_retention" -> Extended.retentionSql,
    "q66_source_divergence" -> TextAnalysis.sourceDivergenceSql,
    "q67_skew_profile" -> Relational.skewProfileSql,
    "q68_unpivot_profile" -> Extended.unpivotProfileSql,
    "q69_cdc_apply" -> Extended.cdcApplySql,
    "q70_scd2_build" -> Extended.scd2BuildSql,
    "q71_gap_fill" -> Extended.gapFillSql,
    "q72_fuzzy_match" -> Dedup.fuzzyMatchSql,
    "q73_transition_profile" -> Extended.transitionProfileSql,
    "q74_outliers" -> Extended.outliersSql,
    "q75_ref_audit" -> Relational.refAuditSql,
    "q76_incremental_agg" -> Extended.incrementalAggSql,
  )
}
