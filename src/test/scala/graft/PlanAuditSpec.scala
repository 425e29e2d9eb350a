package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits — the 100 TB posture enforced as tests, not
  * prose: no accidental cartesian products, dims broadcast, top-K
  * never a global sort, collect-free operators. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries.getOrElse(name, SparkEntry.planFrames(name))(spark, sf)
      .queryExecution.executedPlan.toString

  /** Queries whose plan legitimately contains a nested-loop join:
    * q09 crossJoin of two bounded dims (the reference's config cross
    * product); q21 the documented brute-force similarity baseline
    * (its scale path is q22); q44 queries×centroids probe ranking —
    * both sides bounded by construction (the query set and the
    * quantizer, ~√n rows), and the CORPUS side of q44 only ever joins
    * through the broadcast hash equi-join on the cell id (asserted in
    * IvfSpec); q54 crossJoin(broadcast(nDocs)) — a ONE-row broadcast
    * of the corpus count (a keyless scalar has no equi-key to hash
    * on; the inner loop runs exactly once per row, which is the right
    * plan at any scale); q64 two ONE-row broadcasts (corpus total and
    * Σweights) onto the |sources|-row quota table — same keyless-scalar
    * shape as q54, never touching the corpus side; q66 likewise
    * broadcasts the 1-row corpus total / Σq constants onto vocab- and
    * source-sized tables only; q81 crossJoins the ONE-row pair total
    * onto the support-filtered count table (vocab²-bounded, never the
    * corpus) — the same keyless-scalar shape; q82 the PQ-ADC scan —
    * deliberately the q21 broadcast shape (per-query ADC tables are
    * the declared-small side; its scale path is the IVF cell-pruned
    * composition, ivfPqTopK, whose candidate join IS an equi-join on
    * the cell id); q84 composes q21's exact-baseline subtree verbatim
    * (the voting half itself joins only by equi-key broadcast); q90
    * broadcasts the per-class total table (|classes| rows) and the
    * 1-row vocab size into the model grid — both keyless scalars; the
    * corpus-sized token stream joins the grid by equi-key only; q92
    * crossJoins the 1-row corpus stats into the posting join — the
    * probe terms themselves broadcast by equi-key; q97/q98 compose
    * q21's exact-cosine candidate subtree verbatim (the broadcast
    * query-side probe — their scale path is swapping in q22/q44's
    * bucketed candidates); everything DOWNSTREAM of the shortlist in
    * both is equi-key only (q97's pair self-join on q_id, q98's label
    * joins); q100 crossJoins the ONE-row order total onto the
    * support-filtered pair table (pair-bounded, never the basket
    * stream) — the q54/q81 keyless-scalar shape. */
  private val nestedLoopAllowed =
    Set("q09_config_cross", "q21_cosine_topk", "q44_ivf_ann", "q54_tfidf_topk",
      "q64_temperature_mix", "q66_source_divergence", "q81_pmi_collocations",
      "q82_pq_adc", "q84_knn_classify", "q88_ann_recall", "q90_nb_classifier",
      "q92_bm25_topk", "q93_hybrid_rrf", "q97_mmr_diverse", "q98_retrieval_mrr",
      "q100_basket_lift",
      // q107/q109: the q21 broadcast-anchors inequality join (scaladoc-
      // documented one-corpus-pass design); q109 additionally nested-
      // loops a 3-row k-literal frame against |Q|*k matched rows.
      // q110: q90's broadcast model-grid cross joins. q111: the
      // |sources|^2 pair cross over the model-sized mass table.
      "q107_hard_negatives", "q109_retriever_agreement",
      "q110_calibration_audit", "q111_source_similarity",
      // q114: the |sources|^2 pair cross over the model-sized per-
      // source cardinality table (the q111 precedent); everything
      // downstream of it is |sources|*k sketch rows. q116/q119: the
      // 1-row broadcast scalar (max doc_id / baseline mass) cross —
      // deliberately replacing a corpus-wide ntile sort. q117:
      // inherits q84's documented broadcast-anchors design.
      "q114_kmv_overlap", "q116_novelty_curve", "q117_confusion_audit",
      "q119_cohort_drift",
      // q121: inherits q21's documented broadcast-anchors design
      "q121_hub_audit",
      // q122: the 3-literal boundary frame crossed with the 1-row
      // min/max scalar and the bounded (user, day) table
      "q122_time_split_audit",
      // q123: the 1-row input-totals scalar crossed into the 4-row
      // stage table for the retention denominators
      "q123_curation_funnel",
      // q120: the 1-row max(doc_id)+1 synthetic-offset scalar cross
      // (Dedup.scala containmentDedup) — the q116/q119 keyless-scalar
      // pattern, introduced when the fixed 1e7 offset literal was
      // hardened to a computed bound
      "q120_containment_dedup",
      // q145/q148: inherit q21's documented broadcast-anchors design
      // (the SQ8 scan ranks the decoded corpus against the broadcast
      // query side; q148 runs the exact leg through the same tail; the
      // scale path prunes candidates through IVF cells like the PQ
      // tier's composed form)
      "q145_sq8_topk", "q148_sq8_recall",
      // q149: inherits q44's documented quantizer cross (the declared-
      // small query side ranks the broadcast centroid table); the cell
      // probe, SQ8 shortlist, and rerank joins are all equi-key
      "q149_ivf_sq8",
      // q150: q114's |sources|^2 pair cross, now over the k-row
      // per-source sketch stats — every input is model-sized
      "q150_kmv_overlap_sketch",
      // q151: q93's fusion with the dense leg swapped to q44's IVF —
      // inherits q44's quantizer cross and q92's 1-row stats cross;
      // the corpus-side joins are all equi-key (cell id, term, doc)
      "q151_hybrid_rrf_ann",
      // q152: q151's composition with the sparse probes additionally
      // crossing the 1-row corpus-stats scalar for the df cap (the
      // probe set is query-sized, the stats row is 1 row); the
      // posting join itself stays equi-key on the term
      "q152_hybrid_rrf_pruned",
      // q153/q154: the sampled audit twins — inherit q21's broadcast-
      // anchors inequality join with the anchor side now the 32-row
      // deterministic sample (strictly smaller than q88/q109's), plus
      // the same 1-row denominator/k-literal crosses as their exact
      // parents
      "q153_recall_audit_sampled", "q154_agreement_sampled",
      // q155: inherits q44's documented quantizer cross TWICE — the
      // seed probe ranks the broadcast centroid table, and the pruning
      // bound scores every (query, cell) pair against the same
      // broadcast quantizer (|Q|·ncells rows of 8-dim dots, the
      // declared probe-ranking shape); the seed scan and the final
      // exact rerank are both equi-key joins on the cell id
      "q155_exact_pruned_topk",
      // q156: q155's crosses with the per-cell one replaced by a
      // group-level cross (|Q|·ngroups = ncells/7) — the level-2 cell
      // bound and the rerank are equi-key joins (g_id, cell)
      "q156_exact_pruned_2level",
      // q157: q155's documented crosses against the TRAINED √n
      // quantizer (strictly smaller than the id-filter one — nlist is
      // √n, not n/7); the radii/seed/rerank joins stay equi-key
      "q157_exact_pruned_trained",
      // q158: the exact hybrid — inherits q155's quantizer crosses on
      // the dense leg and q152's 1-row corpus-stats cross on the
      // sparse leg; posting join, fusion and rerank are all equi-key
      "q158_hybrid_exact_pruned",
      // q159: q121's sampled twin — inherits q153/q154's 32-row
      // broadcast-anchors inequality join plus the two 1-row
      // denominator crosses (slot count, corpus count)
      "q159_hub_audit_sampled",
      // q160: q158 with the dense leg on the TRAINED √n quantizer —
      // inherits q157's (strictly smaller) quantizer crosses and
      // q152's 1-row corpus-stats cross on the sparse leg
      "q160_hybrid_exact_trained",
      // q163: q157's trained serve with a metadata candidate filter —
      // inherits exactly q157's quantizer crosses; the lang predicate
      // itself is an equi-key semi-join on the vector id, applied
      // below the candidate probe join
      "q163_filtered_topk_trained",
      // q165: the filtered hybrid — q163's dense-leg crosses plus
      // q152's 1-row corpus-stats cross on the (filtered) sparse leg;
      // posting join, fusion and rerank stay equi-key
      "q165_filtered_hybrid")

  test("no query plans a CartesianProduct; nested-loop joins only where documented", Slow) {
    // planFrames: the round-internal plans of eager driver-looped
    // queries (q161's training rounds) — swept with the same
    // assertions so eager loops can't hide a cartesian (r17 verdict)
    (SparkEntry.queries.keys ++ SparkEntry.planFrames.keys).foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!nestedLoopAllowed(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin — add an equi-key or broadcast hint")
      }
    }
  }

  test("q80 SNM plans no single-partition exchange (the parallel rank form, r16 weak)") {
    // the old form windowed the whole vocabulary under Exchange
    // SinglePartition; the rank form's windows partition by bucket and
    // the pair join is an equi-join on the rank — nothing may funnel
    // to one partition (the cached ranked vocabulary's plan is nested
    // inside the InMemoryRelation and is covered by the same string)
    val plan = planOf("q80_snm_match")
    assert(!plan.contains("Exchange SinglePartition"),
      s"q80 funnels to a single partition:\n$plan")
    graft.CacheRegistry.releaseAll()
  }

  test("top-K queries use TakeOrderedAndProject, never a global Sort+Limit") {
    Seq("q01_discovery", "q03_topk").foreach { name =>
      assert(planOf(name).contains("TakeOrderedAndProject"), name)
    }
  }

  test("dim joins and LSH bucket joins broadcast the small side") {
    Seq("q01_discovery", "q04_dim_join", "q22_ann_lsh", "q26_spatial_join").foreach { name =>
      assert(planOf(name).contains("BroadcastHashJoin"), s"$name should broadcast")
    }
  }

  test("dedup suite runs on hash joins/aggregates only — no sort-based pair generation") {
    Seq("q17_exact_dedup", "q18_minhash_lsh", "q19_ngram_jaccard",
      "q56_simhash_neardup", "q57_semantic_dedup").foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name must generate candidates via bucket equi-joins")
    }
  }

  test("sessionize reuses one user_id exchange across windows and the aggregate") {
    val plan = planOf("q33_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected ≤1 user_id shuffle, saw $exchanges:\n$plan")
  }

  test("funnel plans ONE user_id exchange shared by all three windows and the aggregate") {
    val plan = planOf("q59_funnel")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected ≤1 user_id shuffle, saw $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("narrow per-row operators have no shuffle at all") {
    // q61's codebook collect is a separate plan-time job (the IVF
    // precedent); the RETURNED plan must be a pure scan+project
    Seq("q15_pixel_stats", "q20_simhash", "q23_token_quality", "q25_fingerprint",
      "q28_raster_clip", "q29_multimodal", "q43_lang_id_trigram",
      "q45_bpe_tokens", "q47_pii_scrub", "q55_chunks",
      "q58_importance_sample", "q61_quantize").foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("Exchange"),
        s"$name is a map-only operator but its plan shuffles:\n$plan")
    }
  }

  test("pack bins: the window's source partitioning satisfies the (source, bin) aggregate — ONE shuffle") {
    val plan = planOf("q62_pack_bins")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
  }

  test("grouping families plan one Expand and a single hash exchange") {
    Seq("q30_rollup", "q36_cube", "q46_grouping_sets").foreach { name =>
      val plan = planOf(name)
      assert(plan.contains("Expand"), s"$name should plan an Expand:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"$name: expected exactly 1 shuffle, saw $exchanges:\n$plan")
    }
  }

  test("session_window plans a single (user, session) shuffle") {
    val plan = planOf("q48_session_window")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
  }

  test("one-pass set-op summary plans strictly fewer shuffles than the six-leg form") {
    def shuffles(name: String) =
      "Exchange hashpartitioning".r.findAllIn(planOf(name)).length
    val legs = shuffles("q10_set_ops")
    val onePass = shuffles("q49_set_ops_onepass")
    assert(onePass < legs, s"one-pass=$onePass must beat six-leg=$legs")
  }

  test("text/dedup/similarity hot paths carry no interpreted HOF lambda (the q43/q52 trap)", Slow) {
    // Spark higher-order functions are CodegenFallback: a lambda on a
    // per-token/per-gram/per-element path reverts the scan to the
    // interpreter — q43 cost 230 s and q52 11 s that way before their
    // kernels. The hot family must stay lambda-free; q27 spatial and
    // q21/q22's 64-element folds are kernel'd too, so audit them all.
    Seq("q17_exact_dedup", "q18_minhash_lsh", "q19_ngram_jaccard", "q20_simhash",
      "q21_cosine_topk", "q22_ann_lsh", "q23_token_quality", "q24_lang_id",
      "q25_fingerprint", "q35_embedding_dedup", "q43_lang_id_trigram",
      "q44_ivf_ann", "q45_bpe_tokens", "q50_vocab_topk", "q52_decontaminate",
      "q53_repetition", "q54_tfidf_topk", "q55_chunks", "q56_simhash_neardup",
      "q57_semantic_dedup", "q58_importance_sample", "q61_quantize",
      "q62_pack_bins", "q82_pq_adc", "q83_substring_dedup",
      "q84_knn_classify", "q85_delta_neardup", "q86_winnow_dedup",
      // the clustering family joined in r12: QuantizeFixed replaces the
      // per-element floor lambda, NearestOfL2 the k·d-lambda argmin,
      // SqDistL2 the pair-join fold, UpperTriProducts q126's nested
      // transform-of-slices
      "q124_kmeans_assign", "q125_semdedup_prune", "q126_gram_matrix",
      "q127_diversity_sample", "q129_cluster_profile",
      "q130_hier_assign", "q131_hier_semdedup",
      "q132_cluster_drift", "q133_embed_funnel",
      "q134_capped_semdedup",
      // round-13: Nearest2OfL2 is the top-2 coarse scan (q136 and the
      // multi-probe family); q137-q140 chain the same kernels through
      // the recall audit, boundary pairs, groups, and survivorship
      "q135_pct_capped_semdedup", "q136_multiprobe_assign",
      "q137_probe_recall", "q138_boundary_pairs",
      "q139_semantic_groups", "q140_semantic_survivors",
      "q141_hier_drift",
      // round-14: the admission family rides the same QuantizeFixed/
      // SqDistL2/NearestOfL2 kernels through the verdict core, the
      // staleness radius, and the funnel; q145's SQ8 reconstruction is
      // d literal-constant column expressions + the dot kernel
      "q142_delta_admission", "q143_model_staleness",
      "q144_admission_funnel", "q145_sq8_topk",
      "q146_hier_staleness", "q147_hier_admission",
      "q148_sq8_recall").foreach { name =>
      val plan = planOf(name)
      assert(!plan.toLowerCase.contains("lambdafunction") &&
        !plan.contains("transform(") && !plan.contains("aggregate("),
        s"$name plans an interpreted HOF lambda:\n$plan")
    }
  }

  test("CDC apply: rank-1 filter plans as WindowGroupLimit on ONE key shuffle") {
    val plan = planOf("q69_cdc_apply")
    assert(plan.contains("WindowGroupLimit"),
      s"q69 must pre-prune to the per-key latest before the exchange:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"q69: expected exactly 1 shuffle, saw $exchanges:\n$plan")
  }

  test("SCD-2 build: ver and lead fuse into ONE Window on ONE shuffle") {
    val plan = planOf("q70_scd2_build")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val windows = "Window\\b".r.findAllIn(plan).length
    assert(exchanges == 1 && windows == 1,
      s"q70: expected 1 shuffle + 1 fused Window, saw $exchanges/$windows:\n$plan")
  }

  test("outlier detection: the fact table never shuffles — stats broadcast back") {
    val plan = planOf("q74_outliers")
    assert(plan.contains("BroadcastHashJoin"), s"q74 must broadcast the stats:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"q74: only the 5-row stats aggregate may shuffle, saw $exchanges:\n$plan")
  }

  test("ref audit: every FK edge of a fact rides ONE scan of it") {
    val plan = planOf("q75_ref_audit")
    assert("lineitem\\.parquet".r.findAllIn(plan).length == 1,
      s"lineitem's three FK edges must share one scan:\n$plan")
    // orders legitimately appears twice: once as a child (its own
    // customer edge), once as the parent key set of lineitem>orders
    assert("orders\\.parquet".r.findAllIn(plan).length == 2, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("fuzzy match and gap-fill generate candidates/grids via equi-joins only") {
    Seq("q71_gap_fill", "q72_fuzzy_match", "q73_transition_profile").foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name must not plan an all-pairs join:\n$plan")
    }
  }
}
