package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.9 streaming/incremental surface. The reference is a daily cron
  * batch with hand-rolled incremental semantics (template.yml:36):
  * 30-day lookback (LOOKBACK_DAYS, main.py:34, 45-46), an exclude set
  * so nothing is fetched twice (main.py:468-473, 415), and an
  * idempotent sink (ON CONFLICT DO NOTHING, main.py:453-457).
  *
  * Structured-Streaming mapping — works identically on a stream or a
  * batch DataFrame (the transforms are plan-level):
  *  - `withWatermark(30 days)` IS the lookback: state for keys older
  *    than the watermark is dropped, bounding memory exactly like the
  *    reference bounds its query window;
  *  - `dropDuplicates` on the composite PK (waterbody_id,
  *    captured_ts, main.py:106-107) IS the exclude-set/upsert
  *    contract: a replayed event is a no-op;
  *  - tumbling-window counts are the per-body daily aggregation shape.
  */
object Incremental {

  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("captured_ts", "30 days")
      .dropDuplicates("waterbody_id", "captured_ts")

  def dailyCounts(events: DataFrame): DataFrame =
    dedupStream(events)
      .groupBy(col("waterbody_id"), window(col("captured_ts"), "1 day").as("day"))
      .agg(count(lit(1)).as("n_images"))

  /** Gap-session aggregation with the NATIVE `session_window` operator
    * under a watermark — the streaming twin of q48's batch form.
    * Session state merges as events arrive (Spark's merging session
    * store); a session is emitted in append mode once the watermark
    * passes its end, i.e. when no event can extend it any more. The
    * watermark bounds the session state exactly like the lookback
    * bounds the reference's incremental window. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("captured_ts", "1 hour")
      .groupBy(col("waterbody_id"), session_window(col("captured_ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_images"))
      .select(col("waterbody_id"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_images"))

  /** Stream-stream INTERVAL join with watermark-bounded state — the
    * streaming form of the engine's point-in-interval join (q37): each
    * probe event joins the purchase events of the same user that
    * happened in the 2 hours BEFORE it. Both sides carry watermarks
    * and the join condition bounds event time on both sides, so Spark
    * can expire buffered state — the requirement that makes
    * stream-stream joins run unbounded. Inner join ⇒ append mode.
    *
    * At 100 TB/day this is the shape that works: state per key is
    * bounded by (watermark + interval), not by stream length. */
  def streamIntervalJoin(probes: DataFrame, purchases: DataFrame): DataFrame = {
    val p = probes
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"), col("ts"))
    val iv = purchases
      .withWatermark("pts", "1 hour")
      .select(col("p_user_id"), col("p_event_id"), col("pts"))
    p.join(iv,
      col("user_id") === col("p_user_id") &&
        col("ts") >= col("pts") &&
        col("ts") < col("pts") + expr("INTERVAL 2 HOURS"))
      .select(col("event_id"), col("p_event_id"), col("user_id"))
  }

  /** Arbitrary stateful processing (`mapGroupsWithState` — the
    * KeyValueGroupedDataset custom-state surface): a per-water-body
    * running ingest ledger that survives across micro-batches. This is
    * the stateful generalization the built-in operators above can't
    * express: the state is a user type, updated with user logic. */
  /** Streaming decontamination — q52's eval-overlap scan as a
    * STREAM-STATIC join, the enrich-against-dims pattern every 100 TB
    * ingest pipeline runs: incoming documents are gram-hashed with the
    * same codegen'd [[graft.functions.WordNGramHashes]] kernel the
    * batch operator uses, then joined against the STATIC eval-gram
    * table. Spark plans a broadcast hash join per micro-batch (the
    * static side is a benchmark suite — small by nature), so the
    * stream side never shuffles for the join; the per-doc aggregate is
    * scoped to the micro-batch (each doc's grams arrive in one event).
    * Left-semi keeps the output a flag stream: (doc_id, n_hits ≥ 1).
    */
  def decontaminateStream(docs: DataFrame, evalGrams: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 4)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.TextHash.wordNGramHashes(col("t"), 4))).as("g"))
      .join(evalGrams, "g") // stream-static equi-join; static side broadcast
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))

  /** Streaming count-min sketch — q108's continuous twin: arriving
    * documents fold into the SAME d·w counter table the batch sketch
    * builds (`TextAnalysis.cmsCellsOf` — the cell derivation is a
    * stateless per-row map, legal on a stream; the groupBy(rc) is the
    * stateful half). Unlike every other stateful aggregation here,
    * this one's state CANNOT grow: the key domain is the d·w cell ids
    * by construction, so no watermark is needed and update/complete
    * modes are both safe indefinitely — the sketch bounds its own
    * state, which is exactly why a 100 TB ingest keeps a CMS instead
    * of the exact q50 histogram. Micro-batch increments merge into
    * the running counters by cell-wise addition — the same
    * mergeability `TextAnalysis.cmsMerge` gives stored partial
    * sketches (StreamingSpec pins stream ≡ batch on the union of the
    * batches; estimates served from the streamed sketch are therefore
    * bit-identical to batch estimates). */
  def cmsStream(docs: DataFrame): DataFrame =
    // literally the batch plan applied to the stream frame — ONE
    // definition, so the stream ≡ batch bit-equality StreamingSpec
    // pins cannot drift out from under a future edit to either side
    graft.operators.TextAnalysis.cmsSketchOf(docs)

  /** Streaming near-dup ingest — q85's incremental delta-vs-corpus
    * dedup as a CONTINUOUS flow: each arriving document is shingled,
    * minhash-signed, and banded with the SAME codegen'd kernels the
    * batch operators use (`Dedup.shingleTable`/`bandTable` — the band
    * derivation is stateless by construction, per-row array_distinct,
    * so it is legal on a stream), then probed into the STATIC corpus
    * band index — the stored artifact q18/q85 share. Collided pairs
    * are verified with exact Jaccard against the static shingle table
    * and aggregated to one row per (doc_id, corpus_id) — the
    * micro-batch-scoped groupBy, each doc's bands arrive in one event.
    * At scale this is the ingest gate that runs continuously: new
    * documents never trigger a corpus self-join, only equi-probes
    * into the index. */
  def nearDupStream(
      docs: DataFrame,
      corpusBands: DataFrame,
      corpusShingles: DataFrame,
      tau: Double = 0.8): DataFrame = {
    import graft.operators.Dedup
    // hh travels WITH the bands through the explode (carry column): a
    // join of two stream-derived frames would be an illegal
    // stream-stream join, and the stream side must stay one pipeline
    val banded = Dedup.bandTable(Dedup.shingleTable(docs), carry = Seq("hh"))
    banded
      .join(corpusBands.select(col("doc_id").as("corpus_id"), col("bkey")), "bkey")
      .join(corpusShingles.select(col("doc_id").as("corpus_id"), col("hh").as("hc")),
        "corpus_id")
      .withColumn("inter", size(array_intersect(col("hh"), col("hc"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("hh")) + size(col("hc")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .groupBy(col("doc_id"), col("corpus_id"))
      .agg(round(max(col("jaccard")), 4).as("jaccard"))
  }

  /** Streaming PERCEPTUAL image near-dup ingest — q87's continuous
    * twin, completing the multimodal dedup story the way
    * [[nearDupStream]] completes q85's: each arriving image (decoded
    * pixel cube) is dHashed by the codegen'd
    * [[graft.functions.PixelDHash]] (a pure map — stream-legal),
    * band-exploded with the same 4×14-bit literal-array banding as
    * batch q87 (stateless, per-row), and probed into the STATIC
    * corpus fingerprint band index — the stored artifact the batch
    * pairing builds. Collisions verify by exact hamming and aggregate
    * to one row per (doc_id, corpus_id) with the minimum distance.
    * At scale: a new image never triggers a corpus self-join, only
    * equi-probes into the index — the ingest gate for image data.
    * Recall contract is batch q87's: pigeonhole-exact to hamming ≤
    * `hamMax` (< nBands). */
  def imageNearDupStream(
      images: DataFrame,
      corpusFp: DataFrame,
      hamMax: Int = graft.operators.Dedup.DHashHamMax): DataFrame = {
    val bb = graft.operators.Dedup.DHashBandBits
    val nBands = graft.functions.ImageHash.Bits / bb
    require(hamMax < nBands, s"hamming<=$hamMax needs > $hamMax bands (have $nBands)")
    def banded(fp: DataFrame): DataFrame = fp
      .select(col("doc_id"), col("dh"),
        posexplode(array((0 until nBands).map(j =>
          shiftright(col("dh"), j * bb).bitwiseAND(lit((1L << bb) - 1))): _*)))
      .toDF("doc_id", "dh", "band", "bval")
    val stream = banded(images
      .select(col("doc_id"),
        graft.functions.ImageHash.pixelDhash(col("pixels")).as("dh"))
      .filter(col("dh").isNotNull))
    val index = banded(corpusFp)
      .toDF("corpus_id", "cdh", "band", "bval")
    stream
      .join(index, Seq("band", "bval")) // stream-static equi-probe
      .filter(col("doc_id") =!= col("corpus_id"))
      .withColumn("hamming",
        expr("CAST(bit_count(dh ^ cdh) AS INT)"))
      .filter(col("hamming") <= hamMax)
      .groupBy(col("doc_id"), col("corpus_id"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Static-side helper for [[imageNearDupStream]]: the corpus
    * fingerprint table (doc_id, dh) from decoded pixel cubes — built
    * once, persisted as the stored index. */
  def imageFpTable(images: DataFrame): DataFrame =
    images.select(col("doc_id"),
      graft.functions.ImageHash.pixelDhash(col("pixels")).as("dh"))
      .filter(col("dh").isNotNull)

  /** Streaming PERCEPTUAL audio near-dup ingest — q104's continuous
    * twin, the audio sibling of [[imageNearDupStream]] (every
    * multimodal batch leg gets its ingest gate): each arriving
    * recording (decoded PCM sample array) is envelope-hashed by the
    * codegen'd [[graft.functions.PcmEnvHash]] (a pure map —
    * stream-legal), band-exploded with batch q104's 4×14-bit
    * literal-array banding (stateless, per-row), and probed into the
    * STATIC corpus fingerprint band index from [[audioFpTable]].
    * Collisions verify by exact hamming and aggregate to one row per
    * (doc_id, corpus_id) with the minimum distance. A new recording
    * never triggers a corpus self-join — only equi-probes. Recall
    * contract is batch q104's: pigeonhole-exact to hamming ≤
    * `hamMax` (< nBands). */
  def audioNearDupStream(
      audio: DataFrame,
      corpusFp: DataFrame,
      hamMax: Int = graft.operators.Dedup.AudioHamMax): DataFrame = {
    val bb = graft.operators.Dedup.DHashBandBits
    val nBands = graft.functions.AudioHash.Bits / bb
    require(hamMax < nBands, s"hamming<=$hamMax needs > $hamMax bands (have $nBands)")
    def banded(fp: DataFrame): DataFrame = fp
      .select(col("doc_id"), col("eh"),
        posexplode(array((0 until nBands).map(j =>
          shiftright(col("eh"), j * bb).bitwiseAND(lit((1L << bb) - 1))): _*)))
      .toDF("doc_id", "eh", "band", "bval")
    val stream = banded(audio
      .select(col("doc_id"),
        graft.functions.AudioHash.pcmEnvHash(col("samples")).as("eh"))
      .filter(col("eh").isNotNull))
    val index = banded(corpusFp)
      .toDF("corpus_id", "ceh", "band", "bval")
    stream
      .join(index, Seq("band", "bval")) // stream-static equi-probe
      .filter(col("doc_id") =!= col("corpus_id"))
      .withColumn("hamming",
        expr("CAST(bit_count(eh ^ ceh) AS INT)"))
      .filter(col("hamming") <= hamMax)
      .groupBy(col("doc_id"), col("corpus_id"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Static-side helper for [[audioNearDupStream]]: the corpus
    * fingerprint table (doc_id, eh) from decoded PCM sample arrays —
    * built once, persisted as the stored index. */
  def audioFpTable(audio: DataFrame): DataFrame =
    audio.select(col("doc_id"),
      graft.functions.AudioHash.pcmEnvHash(col("samples")).as("eh"))
      .filter(col("eh").isNotNull)

  /** Streaming PERCEPTUAL video near-dup ingest — q105's continuous
    * twin, completing the multimodal ingest symmetry (images
    * [[imageNearDupStream]], audio [[audioNearDupStream]], video
    * here). The batch leg's frame-vote pairing is an AGGREGATION, so
    * unlike the hamming probes this stream needs state: `frames`
    * carries (doc_id, fh, event_ts) — one row per sampled frame of an
    * arriving video, all frames of one video sharing its single
    * ingest event_ts (the retrievalStreamWindowed contract, so a
    * window never splits a video) — deduped per (video, hash, ts)
    * with watermark-evicted state, equi-probed into the STATIC
    * [[videoFrameIndex]], and vote-counted per (arrival, corpus
    * video) inside a tumbling event-time window. Watermark eviction
    * makes it append-legal with bounded state. The index is hub-
    * capped at BUILD time, so a title-card frame costs nothing per
    * arrival — an arriving video only ever equi-probes, never joins
    * the corpus to itself. Vote semantics are batch q105's:
    * `matched` ≥ `minVotes` distinct shared frame hashes. */
  def videoNearDupStream(
      frames: DataFrame,
      corpusIdx: DataFrame,
      minVotes: Int = graft.operators.Dedup.VideoMinVotes,
      windowLen: String = "1 minute", delay: String = "5 minutes"): DataFrame =
    frames
      .withWatermark("event_ts", delay)
      .dropDuplicates("doc_id", "fh", "event_ts")
      .join(corpusIdx, "fh") // stream-static equi-probe into the stored index
      .filter(col("doc_id") =!= col("corpus_id"))
      .groupBy(window(col("event_ts"), windowLen),
        col("doc_id"), col("corpus_id"))
      .agg(count(lit(1)).as("matched"))
      .filter(col("matched") >= minVotes)
      .select(col("doc_id"), col("corpus_id"), col("matched"))

  /** Static-side helper for [[videoNearDupStream]]: the corpus frame-
    * hash index (corpus_id, fh) — per-video distinct frames with the
    * q105 hub-frame cap applied ONCE at build time (a frame hash in >
    * `dfCap` videos carries no pairing evidence, only an O(df) probe
    * fan-out per arrival). Built once, persisted as the stored
    * index. */
  def videoFrameIndex(frames: DataFrame,
      dfCap: Int = graft.operators.Dedup.VideoDfCap): DataFrame = {
    val uniq = frames.select(col("doc_id").as("corpus_id"), col("fh"))
      .filter(col("fh").isNotNull).distinct()
    val hot = uniq.groupBy(col("fh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("fh"))
    uniq.join(broadcast(hot), Seq("fh"), "left_anti")
  }

  /** Streaming SEMANTIC near-dup ingest — q125's continuous twin,
    * the EMBEDDING modality's gate (the fifth leg: text minhash,
    * image/audio/video fingerprints, now semantic vectors): each
    * arriving vector is fixed-point-quantized and centroid-assigned
    * in one pure map ([[graft.operators.Clustering.assignWith]] —
    * the stored k·d model rides the plan as a literal, stream-legal),
    * then equi-probes the STATIC pre-assigned corpus table
    * ([[graft.operators.Clustering.assignedCorpus]], persistable via
    * saveAssignedCorpus) on its CLUSTER id — the SemDeDup blocking
    * rule as an ingest probe: per-arrival work is O(|cell|), never a
    * corpus scan or self-join. Collisions verify by exact integer
    * squared-L2 (the same portable arithmetic as batch q125).
    *
    * Emits (vec_id, corpus_id, dist) near-dup pairs directly —
    * APPEND-legal with no aggregation, because a vector lives in
    * exactly one cell, so each (arrival, corpus) pair can occur at
    * most once. Recall contract: an arrival whose nearest corpus
    * near-dup lands in a DIFFERENT cell is missed (the SemDeDup
    * trade, same as batch); StreamingSpec plants both cases. */
  def semanticNearDupStream(
      arrivals: DataFrame,
      cents: Seq[Array[Long]],
      corpusAssigned: DataFrame,
      pruneT: Long = graft.operators.Clustering.PruneT): DataFrame = {
    import graft.operators.Clustering
    semanticNearDupProbe(
      Clustering.assignWith(
          arrivals.select(col("vec_id"), Clustering.quantize(col("embedding")).as("x")),
          cents)
        .select(col("vec_id"), col("x"), col("cluster")),
      corpusAssigned, pruneT)
  }

  /** The gate under a TWO-LEVEL model — the at-scale variant: when k
    * grows with the corpus (kForCorpus), flat arrival assignment costs
    * k distances per arrival; the hierarchical probe costs 2·√k. The
    * stored corpus side must be assigned by the SAME model
    * (`assignHierarchical` ids), which the probe half then equi-joins
    * identically — cells are cells, whichever ladder produced them. */
  def semanticNearDupStreamHier(
      arrivals: DataFrame,
      hm: graft.operators.Clustering.HierModel,
      corpusAssigned: DataFrame,
      pruneT: Long = graft.operators.Clustering.PruneT): DataFrame = {
    import graft.operators.Clustering
    semanticNearDupProbe(
      Clustering.assignHierarchical(
          arrivals.select(col("vec_id"), Clustering.quantize(col("embedding")).as("x")),
          hm)
        .select(col("vec_id"), col("x"), col("cluster")),
      corpusAssigned, pruneT)
  }

  /** The HOT-CELL-CAPPED semantic gate — the deployment form (r12
    * verdict ask #2): the stored probe table is capped at BUILD time
    * ([[graft.operators.Clustering.capAssignedCorpus]], the
    * [[videoFrameIndex]] hub-cap precedent), so an arrival landing in
    * a degenerate mega-cell costs ZERO probe rows — it short-circuits
    * to one flagged verdict (corpus_id/dist NULL, `cell_capped` 1,
    * batch q134's retention-safe reading: never auto-prune on an
    * unadjudicated cell, surface the flag for escalation). Arrivals
    * in bounded cells probe exactly as [[semanticNearDupStream]] —
    * pair rows with `cell_capped` 0. The capped-cell side is a k-row
    * broadcast; both legs are stream-static joins (no aggregation),
    * so the union stays append-legal. */
  def semanticNearDupGate(
      arrivals: DataFrame,
      cents: Seq[Array[Long]],
      probeCorpus: DataFrame,
      cappedCells: DataFrame,
      pruneT: Long = graft.operators.Clustering.PruneT): DataFrame = {
    import graft.operators.Clustering
    semanticGateVerdicts(
      Clustering.assignWith(
          arrivals.select(col("vec_id"), Clustering.quantize(col("embedding")).as("x")),
          cents)
        .select(col("vec_id"), col("x"), col("cluster")),
      probeCorpus, cappedCells, pruneT)
  }

  /** The capped gate under a TWO-LEVEL model — [[semanticNearDupGate]]
    * with the O(√k)-per-arrival hierarchical assignment; the stored
    * probe/capped tables must be built from the SAME model's cells. */
  def semanticNearDupGateHier(
      arrivals: DataFrame,
      hm: graft.operators.Clustering.HierModel,
      probeCorpus: DataFrame,
      cappedCells: DataFrame,
      pruneT: Long = graft.operators.Clustering.PruneT): DataFrame = {
    import graft.operators.Clustering
    semanticGateVerdicts(
      Clustering.assignHierarchical(
          arrivals.select(col("vec_id"), Clustering.quantize(col("embedding")).as("x")),
          hm)
        .select(col("vec_id"), col("x"), col("cluster")),
      probeCorpus, cappedCells, pruneT)
  }

  /** MULTI-PROBE capped gate (nprobe = 2, flat model) — closes half
    * of the single-probe gate's recall hole: [[semanticNearDupGate]]
    * misses an arrival whose nearest corpus near-dup lives in a
    * DIFFERENT cell (the SemDeDup blocking trade, worst exactly at
    * cell boundaries). Here each arrival probes its TOP-2 cells
    * ([[graft.operators.Clustering.multiProbeCellsFlat]] — the top-2
    * step is ONE codegen'd scan of the centroid literal), so a
    * boundary arrival searches both sides of its boundary at 2·|cell|
    * bounded probe cost. Verdict shape adds a `probe` rank column
    * (1 = greedy cell, 2 = second probe): rows stay unique — the two
    * probe cells are distinct and a corpus vector lives in exactly
    * one cell — so there is still no aggregation and append mode
    * stays legal. Cap semantics are PER PROBE LEG: an arrival whose
    * second-nearest cell is capped gets one flagged (probe 2) verdict
    * while its greedy leg probes normally — the escalation signal
    * stays attributable to the leg that hit the hot cell. */
  def semanticNearDupGate2(
      arrivals: DataFrame,
      cents: Seq[Array[Long]],
      probeCorpus: DataFrame,
      cappedCells: DataFrame,
      pruneT: Long = graft.operators.Clustering.PruneT): DataFrame = {
    import graft.operators.Clustering
    semanticGateVerdicts2(
      Clustering.multiProbeCellsFlat(
        arrivals.select(col("vec_id"), Clustering.quantize(col("embedding")).as("x")),
        cents),
      probeCorpus, cappedCells, pruneT)
  }

  /** [[semanticNearDupGate2]] under a TWO-LEVEL model: probe cells are
    * the fine argmin inside each of the top-2 COARSE cells (3·√k
    * distances per arrival — one top-2 coarse scan + two fine scans),
    * the IVF nprobe=2 recall remedy at the gate's ingest seam. The
    * stored probe/capped tables must be built from the SAME model.
    *
    * Model-transport note: the fine table rides the plan as a literal
    * here (stream-legal, map-only) — fine while k·d is under
    * [[graft.operators.Clustering.FineLiteralMaxEntries]]. Past it,
    * run [[semanticGateHier2Batch]] per micro-batch via `foreachBatch`
    * (the streaming MERGE precedent) — the frame-model probe cells
    * plus the same verdict core, StreamingSpec-proven equal to this
    * literal form. */
  def semanticNearDupGateHier2(
      arrivals: DataFrame,
      hm: graft.operators.Clustering.HierModel,
      probeCorpus: DataFrame,
      cappedCells: DataFrame,
      pruneT: Long = graft.operators.Clustering.PruneT): DataFrame = {
    import graft.operators.Clustering
    semanticGateVerdicts2(
      Clustering.multiProbeCells(
        arrivals.select(col("vec_id"), Clustering.quantize(col("embedding")).as("x")),
        hm),
      probeCorpus, cappedCells, pruneT)
  }

  /** The multi-probe gate's `foreachBatch` form — the FRAME-model
    * path past the fine-literal ceiling: probe cells come from
    * [[graft.operators.Clustering.multiProbeCellsJoined]] (coarse
    * literal stays √k·d; the fine table is DATA, equi-joined on the
    * coarse cell with one argmin aggregate — batch-legal inside
    * foreachBatch), then the SAME verdict core. Use as
    * `arrivals.writeStream.foreachBatch((b, _) =>
    * semanticGateHier2Batch(b, m, probe, capped).write...)`. */
  def semanticGateHier2Batch(
      batch: DataFrame,
      m: graft.operators.Clustering.HierModelDf,
      probeCorpus: DataFrame,
      cappedCells: DataFrame,
      pruneT: Long = graft.operators.Clustering.PruneT): DataFrame = {
    import graft.operators.Clustering
    semanticGateVerdicts2(
      Clustering.multiProbeCellsJoined(
        batch.select(col("vec_id"), Clustering.quantize(col("embedding")).as("x")),
        m),
      probeCorpus, cappedCells, pruneT)
  }

  /** Verdict core of the multi-probe gates: per-LEG cap flagging and
    * probing over the exploded (vec_id, x, probe, cluster) rows. */
  private def semanticGateVerdicts2(
      asg: DataFrame, probeCorpus: DataFrame, cappedCells: DataFrame,
      pruneT: Long): DataFrame = {
    val flagged = asg.join(
      broadcast(cappedCells.select(col("cluster")).withColumn("capflag", lit(1))),
      Seq("cluster"), "left")
    val probed = flagged.filter(col("capflag").isNull)
      .join(probeCorpus.select(col("corpus_id"), col("x").as("cx"), col("cluster")),
        Seq("cluster")) // stream-static equi-probe, one leg per probe cell
      .filter(col("vec_id") =!= col("corpus_id"))
      .withColumn("dist",
        graft.functions.FixedPointOps.sqDistL2(col("x"), col("cx")))
      .filter(col("dist") < pruneT)
      .select(col("vec_id"), col("probe"), col("corpus_id"), col("dist"),
        lit(0).as("cell_capped"))
    val inCapped = flagged.filter(col("capflag") === 1)
      .select(col("vec_id"), col("probe"),
        lit(null).cast("long").as("corpus_id"),
        lit(null).cast("long").as("dist"), lit(1).as("cell_capped"))
    probed.unionByName(inCapped)
  }

  /** Shared verdict core of the capped gates: flag arrivals whose
    * cell is in the capped table (broadcast, k rows), probe the rest. */
  private def semanticGateVerdicts(
      asg: DataFrame, probeCorpus: DataFrame, cappedCells: DataFrame,
      pruneT: Long): DataFrame = {
    val flagged = asg.join(
      broadcast(cappedCells.select(col("cluster")).withColumn("capflag", lit(1))),
      Seq("cluster"), "left")
    val probed = semanticNearDupProbe(
        flagged.filter(col("capflag").isNull)
          .select(col("vec_id"), col("x"), col("cluster")),
        probeCorpus, pruneT)
      .withColumn("cell_capped", lit(0))
    val inCapped = flagged.filter(col("capflag") === 1)
      .select(col("vec_id"), lit(null).cast("long").as("corpus_id"),
        lit(null).cast("long").as("dist"), lit(1).as("cell_capped"))
    probed.unionByName(inCapped)
  }

  /** The probe half both gates share: stream-static equi-join on the
    * cell id (an arrival compares against ITS cell's members, never
    * the corpus), exact integer verify, verdict rows. */
  private def semanticNearDupProbe(
      asg: DataFrame, corpusAssigned: DataFrame, pruneT: Long): DataFrame =
    asg
      .join(corpusAssigned.select(col("corpus_id"), col("x").as("cx"), col("cluster")),
        Seq("cluster")) // stream-static equi-probe on the cell id
      .filter(col("vec_id") =!= col("corpus_id"))
      .withColumn("dist",
        graft.functions.FixedPointOps.sqDistL2(col("x"), col("cx")))
      .filter(col("dist") < pruneT)
      .select(col("vec_id"), col("corpus_id"), col("dist"))

  /** Streaming DRIFT counts — q132/q141's continuous twin: arriving
    * vectors are quantized + centroid-assigned in one pure map (the
    * stored model rides the plan as a literal, stream-legal), then
    * counted per (event-time window, cell) with the watermark closing
    * windows — append-legal, state bounded by k·open-windows. The
    * drift VERDICT (ppm shares vs the stored baseline) attaches per
    * micro-batch via `foreachBatch` +
    * [[graft.operators.Clustering.clusterDriftWindowed]]: the
    * per-window TOTAL is a second aggregation over the streamed one
    * (not stream-legal inline), and every row of a window closes in
    * the SAME micro-batch, so the batch arithmetic is exact —
    * StreamingSpec pins the streamed verdicts bit-equal to batch
    * [[graft.operators.Clustering.clusterDriftOf]] on each window's
    * slice. Use:
    * `clusterDriftCountsStream(a, cents).writeStream.foreachBatch(
    *   (b, _) => Clustering.clusterDriftWindowed(base, b).write...)`. */
  def clusterDriftCountsStream(
      arrivals: DataFrame,
      cents: Seq[Array[Long]],
      windowLen: String = "1 hour",
      delay: String = "1 hour"): DataFrame = {
    import graft.operators.Clustering
    Clustering.assignWith(
        arrivals.select(col("vec_id"),
          Clustering.quantize(col("embedding")).as("x"), col("event_ts")),
        cents)
      .withWatermark("event_ts", delay)
      .groupBy(window(col("event_ts"), windowLen), col("cluster"))
      .agg(count(lit(1)).as("n_new"))
  }

  /** [[clusterDriftCountsStream]] under a TWO-LEVEL model — the
    * at-scale drift gate (2·√k distances per arrival); the baseline
    * counts must come from the SAME model's cells (the nightly
    * build's hier-assigned corpus). Same foreachBatch verdict seam. */
  def clusterDriftCountsStreamHier(
      arrivals: DataFrame,
      hm: graft.operators.Clustering.HierModel,
      windowLen: String = "1 hour",
      delay: String = "1 hour"): DataFrame = {
    import graft.operators.Clustering
    Clustering.assignHierarchical(
        arrivals.select(col("vec_id"),
          Clustering.quantize(col("embedding")).as("x"), col("event_ts")),
        hm)
      .withWatermark("event_ts", delay)
      .groupBy(window(col("event_ts"), windowLen), col("cluster"))
      .agg(count(lit(1)).as("n_new"))
  }

  /** Streaming NOVELTY gate — batch q116's serving form, the
    * data-value question asked PER ARRIVING DOCUMENT instead of per
    * historical cohort: how many of this document's shingles are
    * absent from the stored corpus? A crawl frontier that keeps
    * returning near-zero-novelty documents is spending budget on
    * redundancy (q116's decayed tail, observed live). The arriving
    * document is shingle-hashed by the same codegen'd
    * [[graft.functions.TextHash.WordNGramHashes]] kernel as batch
    * (stateless per-row map, stream-legal), LEFT-joined against the
    * STATIC distinct corpus shingle-hash set
    * ([[corpusShingleSet]] — built once, stored via ManifestSink
    * like the band/posting indexes), and aggregated to one
    * (doc_id, n_sh, n_novel, novelty_ppm) row — the groupBy is
    * micro-batch-scoped (a doc's shingles arrive in one event, the
    * decontaminateStream contract). An arriving document only ever
    * equi-probes the index — never a corpus self-join. */
  def noveltyStream(docs: DataFrame, corpusShingles: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.TextHash.wordNGramHashes(col("t"), 3))).as("h"))
      .join(corpusShingles.select(col("h"), lit(1).as("seen")), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("(1000000 * n_novel) div n_sh"))

  /** Static-side helper for [[noveltyStream]]: the distinct corpus
    * shingle-hash set — a one-column flat table, stored/served via
    * the same FpIndex lifecycle as the shingle table it derives
    * from. */
  def corpusShingleSet(docs: DataFrame): DataFrame =
    graft.operators.Dedup.shingleTable(docs)
      .select(explode(col("hh")).as("h")).distinct()

  /** Static-side helper for [[curationGateStream]]: the stored
    * exact-content key set — q17's md5 key as a one-column flat
    * table, persisted/served under the same FpIndex stored lifecycle
    * as the band and shingle indexes it sits beside. */
  def corpusKeySet(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("content_hash")).distinct()

  /** Streaming CURATION GATE — batch q123's ingest-time twin: the
    * admit/reject decision whose aggregate consequences the funnel
    * report audits, applied per ARRIVING document against STORED
    * corpus artifacts. One verdict row per arrival, with each stage's
    * outcome and the first rejecting stage:
    *
    *  - `quality_gate`: the q23 TokenStats kernel via
    *    [[graft.operators.TextAnalysis.qualityStatsOf]] (pure map,
    *    stream-legal); thresholds are `CorpusPipeline.run`'s defaults,
    *    and the zero-token convention (n_tokens 0, stop 10001) is the
    *    batch funnel's, so the stage verdict matches q123 bit-for-bit.
    *  - `exact_dedup`: md5(text) equi-probe into [[corpusKeySet]] —
    *    any arrival whose content already exists in the stored corpus
    *    is a duplicate (the ingest-time reading of q17's keeper rule).
    *  - `near_dedup`: the q85/q18 stored band-index probe — band
    *    explosion is stateless per row, collisions verify by exact
    *    hashed-shingle Jaccard at the batch pair threshold (0.8).
    *    Semantics note: the batch funnel drops CC non-representatives
    *    WITHIN a batch; the gate rejects on any stored-corpus match —
    *    the serving approximation every incremental dedup deployment
    *    makes (the q85 O(delta) contract), exact when the store holds
    *    the admitted corpus.
    *
    * Stages short-circuit like the batch funnel: a document rejected
    * earlier skips the near-dup probe (`is_near_dup` NULL — not
    * evaluated), so probe cost is paid only by survivors. Shape: all
    * stream-static equi-joins plus ONE aggregation keyed by doc_id
    * (collapsing a survivor's ≤6 band probes with its base row);
    * unwatermarked, that aggregation is global state — per-doc rows
    * retained — so THIS form requires update/complete mode
    * (StreamingSpec runs complete). The continuous deployment is
    * [[curationGateStreamWindowed]] — the same shared core with a
    * watermarked ingest-time window in the aggregation keys:
    * append-legal, state bounded by the watermark horizon (the
    * q115-stream precedent). At scale an arrival only equi-probes
    * stored indexes — the corpus never self-joins. */
  def curationGateStream(
      docs: DataFrame,
      corpusKeys: DataFrame,
      corpusBands: DataFrame,
      corpusShingles: DataFrame,
      minTokens: Long = 5L,
      maxStopBp: Long = 8000L,
      tau: Double = 0.8): DataFrame =
    gateVerdicts(docs, corpusKeys, corpusBands, corpusShingles,
      minTokens, maxStopBp, tau, ts = None, windowLen = "")

  /** Continuous-deployment form of [[curationGateStream]] — the
    * append-legal recipe its scaladoc names, implemented (the
    * [[retrievalStreamWindowed]] precedent): `docs` carries an
    * ingest-time column (doc_id, text, ingest_ts), the verdict
    * aggregation groups by a tumbling event-time window alongside the
    * per-doc keys, and the watermark evicts each window's state once
    * event time passes window.end + delay — state is bounded by the
    * watermark horizon instead of the total docs seen. A document's
    * base row and band probes all carry its single ingest_ts, so a
    * window never splits a verdict; stage semantics, thresholds, and
    * jaccard arithmetic are IDENTICAL to the global form (one shared
    * core — StreamingSpec pins the windowed verdicts row-equal to
    * the global form's on the same arrivals). */
  def curationGateStreamWindowed(
      docs: DataFrame,
      corpusKeys: DataFrame,
      corpusBands: DataFrame,
      corpusShingles: DataFrame,
      minTokens: Long = 5L,
      maxStopBp: Long = 8000L,
      tau: Double = 0.8,
      windowLen: String = "1 minute",
      delay: String = "5 minutes"): DataFrame =
    gateVerdicts(docs.withWatermark("ingest_ts", delay),
      corpusKeys, corpusBands, corpusShingles,
      minTokens, maxStopBp, tau, ts = Some("ingest_ts"), windowLen = windowLen)

  /** One shared pipeline for both gate forms; `ts` threads the
    * ingest-time column through every leg and adds the tumbling
    * window to the verdict aggregation's keys. */
  private def gateVerdicts(
      docs: DataFrame,
      corpusKeys: DataFrame,
      corpusBands: DataFrame,
      corpusShingles: DataFrame,
      minTokens: Long,
      maxStopBp: Long,
      tau: Double,
      ts: Option[String],
      windowLen: String): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val tsCols = ts.toSeq.map(col)
    val keyed = TextAnalysis.qualityStatsOf(docs, carry = ts.toSeq)
      .withColumn("content_hash", md5(col("text")))
      .join(corpusKeys.select(col("content_hash"), lit(1).as("dup")),
        Seq("content_hash"), "left")
      .withColumn("quality_pass",
        col("n_tokens") >= minTokens && col("stop_ratio_bp") <= maxStopBp)
      .withColumn("is_exact_dup", col("dup").isNotNull)
      .withColumn("t", split(col("text"), " "))
    // base leg: exactly one row per arrival (jaccard NULL) — guarantees
    // a verdict even for docs with no band collisions or no shingles
    val base = keyed.select(col("doc_id") +: tsCols :+ col("n_tokens") :+
      col("stop_ratio_bp") :+ col("quality_pass") :+ col("is_exact_dup") :+
      lit(null).cast("double").as("jaccard"): _*)
    // probe leg: survivors only (short-circuit); inner joins — a band
    // with no collision contributes nothing the base row doesn't
    val surv = keyed
      .filter(col("quality_pass") && !col("is_exact_dup") && size(col("t")) >= 3)
      .select(col("doc_id") +: tsCols :+ col("n_tokens") :+ col("stop_ratio_bp") :+
        array_distinct(
          graft.functions.TextHash.wordNGramHashes(col("t"), 3)).as("hh"): _*)
    val inter = size(array_intersect(col("hh"), col("hc")))
    val probes = Dedup
      .bandTable(surv, carry = ts.toSeq ++ Seq("n_tokens", "stop_ratio_bp", "hh"))
      .join(corpusBands.select(col("doc_id").as("corpus_id"), col("bkey")), "bkey")
      .join(corpusShingles.select(col("doc_id").as("corpus_id"),
        col("hh").as("hc")), "corpus_id")
      .select(col("doc_id") +: tsCols :+ col("n_tokens") :+ col("stop_ratio_bp") :+
        lit(true).as("quality_pass") :+ lit(false).as("is_exact_dup") :+
        (inter.cast("double") / (size(col("hh")) + size(col("hc")) - inter))
          .as("jaccard"): _*)
    base.unionByName(probes)
      .groupBy(ts.map(t => window(col(t), windowLen)).toSeq ++ Seq(
        col("doc_id"), col("n_tokens"), col("stop_ratio_bp"),
        col("quality_pass"), col("is_exact_dup")): _*)
      .agg(max(col("jaccard")).as("max_jaccard"))
      .withColumn("is_near_dup",
        when(col("quality_pass") && !col("is_exact_dup"),
          coalesce(col("max_jaccard") >= tau, lit(false)))
          .otherwise(lit(null).cast("boolean")))
      .withColumn("admitted",
        col("quality_pass") && !col("is_exact_dup") && !col("is_near_dup"))
      .withColumn("reject_stage",
        when(!col("quality_pass"), "quality_gate")
          .when(col("is_exact_dup"), "exact_dedup")
          .when(col("is_near_dup"), "near_dedup"))
      .drop("window") // windowed form: eviction key only, not a verdict column
  }

  /** Streaming INGEST-VOLUME ANOMALY monitor — batch q115's
    * continuous twin, the drift alarm a pipeline runs on its own
    * intake. Stream side: tumbling event-time window count per
    * event_type, watermark-evicted so state is |types|·|open windows|
    * and the query is append-legal. Static side: the TRAINED
    * baseline [[graft.operators.Extended.volumeStatsOf]] — per-type
    * sufficient statistics (n, Σc, Σc²), model-sized, stored via
    * ManifestSink like every other served artifact, joined per
    * emitted window (AQE broadcasts it; the join is |types|-sized).
    * The verdict is the SAME cross-multiplied integer z² as batch
    * q115 — λ = 2, DECIMAL(38,0) intermediates — so a stream window
    * over exactly one baseline day's events produces the batch
    * verdict bit-for-bit (StreamingSpec pins this). A window of a
    * different length than the training unit shifts the comparison
    * scale; deployments match `windowLen` to the baseline's day
    * granularity. */
  def volumeAnomalyStream(events: DataFrame, stats: DataFrame,
      windowLen: String = "1 day", delay: String = "1 day"): DataFrame =
    events
      .withWatermark("event_ts", delay)
      .groupBy(window(col("event_ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .join(stats, "event_type") // stream-static, model-sized right side
      .withColumn("dev", expr("CAST(n_days * n_events - s1 AS DECIMAL(38,0))"))
      .withColumn("dev2", col("dev") * col("dev"))
      .withColumn("thr",
        expr("4 * (CAST(n_days AS DECIMAL(38,0)) * s2 " +
          "- CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0)))"))
      .select(col("window").getField("start").as("window_start"),
        col("event_type"), col("n_events"),
        expr("CAST((400 * dev2) div greatest(thr, 1) AS BIGINT)").as("z2_x100"),
        expr("CAST(dev2 > thr AS INT)").as("is_anomaly"))

  /** Streaming RETRIEVAL probe — q92's continuous twin, the serving
    * half of the sparse-retrieval story: arriving queries are split
    * into distinct probe terms (per-row array ops — stateless,
    * stream-legal), equi-joined into the STATIC posting index (the
    * stored artifact [[postingTable]] builds once per corpus), scored
    * with the SAME [[graft.operators.TextAnalysis.Bm25TermScore]]
    * expression the batch operator uses — scores are bit-identical by
    * construction — and aggregated to one row per (query, doc). The
    * groupBy here is a GLOBAL stateful aggregation, NOT micro-batch-
    * scoped: unwatermarked, Spark rejects it in append mode, so this
    * form runs in complete/update mode and (query_id, doc_id) state
    * grows with every query ever seen — correct for a bounded replay
    * or an interactive dashboard session, wrong for continuous
    * serving (round-9 advisor; StreamingSpec runs it in complete
    * mode). The continuous-serving deployment uses
    * [[retrievalStreamWindowed]], whose event-time watermark evicts
    * closed query windows. Top-k selection stays at the consumer (a
    * rank window is not stream-legal; the candidate set per query is
    * df-bounded). A query never triggers a corpus scan — only
    * posting-list equi-probes: the serving shape of a 100 TB index. */
  def retrievalStream(queries: DataFrame, postings: DataFrame): DataFrame =
    queries
      .select(col("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .join(postings, "w") // stream-static equi-join on the term
      .select(col("query_id"), col("doc_id"),
        expr(graft.operators.TextAnalysis.Bm25TermScore).as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("score"))

  /** Continuous-serving form of [[retrievalStream]]: `queries` carries
    * an event-time column (query_id, text, event_ts), the aggregation
    * groups by a tumbling event-time window alongside (query_id,
    * doc_id), and the watermark lets Spark EVICT each window's state
    * once event time passes window.end + delay — bounded state, append-
    * legal, the deployment shape the plain form's scaladoc rules out.
    * A query's terms all carry its single event_ts, so the window
    * never splits a query; scores remain bit-identical to batch BM25
    * (same [[graft.operators.TextAnalysis.Bm25TermScore]] expression,
    * same posting index). */
  def retrievalStreamWindowed(queries: DataFrame, postings: DataFrame,
      windowLen: String = "1 minute", delay: String = "5 minutes"): DataFrame =
    queries
      .withWatermark("event_ts", delay)
      .select(col("query_id"), col("event_ts"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .join(postings, "w") // stream-static equi-join on the term
      .select(col("query_id"), col("event_ts"), col("doc_id"),
        expr(graft.operators.TextAnalysis.Bm25TermScore).as("s"))
      .groupBy(window(col("event_ts"), windowLen), col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .select(col("query_id"), col("doc_id"), col("score"))

  /** Static-side helper for [[retrievalStream]]: the denormalized
    * posting index (w, doc_id, tf, dl, df, n, tot) — the per-term
    * stats pre-joined so the stream side needs ONE equi-join. Built
    * once per corpus, persisted as the stored index. */
  def postingTable(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("w"))
    val tf = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
    tf.join(dl, Seq("doc_id")).join(dfreq, Seq("w")).crossJoin(stats)
  }

  /** Static-side helper: the distinct gram hashes of an eval corpus
    * (same kernel, same n as the stream side). */
  def evalGramTable(evalDocs: DataFrame): DataFrame =
    evalDocs
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 4)
      .select(explode(array_distinct(
        graft.functions.TextHash.wordNGramHashes(col("t"), 4))).as("g"))
      .distinct()

  /** Streaming analog of q63 (`Extended.eventFeatures`): per-EVENT
    * trailing 7-day features emitted as events arrive, keyed state =
    * each user's retained (sec, cents) window. flatMapGroupsWithState
    * because the operator emits one row PER INPUT ROW (not per group
    * per trigger — that is mapGroupsWithState's shape, see
    * runningIngestState above).
    *
    * Batch-equivalence contract (StreamingSpec pins it): for in-order
    * arrival the emitted features are EXACTLY the batch RANGE-frame
    * results, including same-second peer semantics — events sharing a
    * second all see the full peer set, so each micro-batch processes
    * whole seconds in ascending order. A late event (older than the
    * key's max seen second) still gets correct features over what its
    * own frame retains, but does not retro-correct rows already
    * emitted — the streaming trade documented rather than hidden.
    *
    * State is pruned to the trailing window per key (bounded by the
    * user's 7-day event count, not history), so state size is
    * O(active users × window density) at any corpus lifetime. */
  def rollingFeatures(events: Dataset[FeatEvent]): Dataset[FeatOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FeatWindow, FeatOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FeatEvent], state: GroupState[FeatWindow]) =>
          var buf = state.getOption.map(_.buf).getOrElse(Vector.empty)
          val out = Vector.newBuilder[FeatOut]
          batch.toSeq.groupBy(_.sec).toSeq.sortBy(_._1).foreach { case (sec, peers) =>
            buf = (buf ++ peers.map(e => (e.sec, e.cents)))
              .filter(_._1 >= sec - 604799L)
            peers.foreach { e =>
              // frame = retained entries in [sec-604799, sec]; state can
              // hold later seconds if this event arrived late
              val frame = buf.filter(t => t._1 <= sec)
              out += FeatOut(e.event_id, uid,
                frame.length.toLong, frame.map(_._2).sum, frame.map(_._2).max)
            }
          }
          state.update(FeatWindow(buf))
          out.result().iterator
      }
  }

  /** Streaming analog of q69 (`Extended.cdcApply`): materialize the
    * current row per key from a CDC op stream, keyed state = the
    * winning (sec, event_id) op so far. Latest-wins is decided by the
    * op's OWN timestamp, not arrival order — a late-arriving older op
    * never overwrites a newer one, so the emitted snapshot converges
    * to the batch result under any interleaving (StreamingSpec feeds
    * shuffled chunks and asserts equality with the batch operator).
    *
    * Tombstones stay IN state (emitting `deleted = true`) rather than
    * dropping the key: state removal would resurrect the record if an
    * older upsert arrived late. State is O(1) per key — one op, not
    * history. mapGroupsWithState (one row per key per trigger), the
    * changelog-to-snapshot shape; the downstream reader filters
    * `deleted`. */
  def cdcState(ops: Dataset[CdcOp]): Dataset[CdcRow] = {
    import ops.sparkSession.implicits._
    ops
      .groupByKey(_.user_id)
      .mapGroupsWithState[CdcOp, CdcRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[CdcOp], state: GroupState[CdcOp]) =>
          val winner = (state.getOption.iterator ++ batch)
            .maxBy(o => (o.sec, o.event_id))
          state.update(winner)
          CdcRow(uid, winner.op, winner.sec, winner.cents, winner.op == "error")
      }
  }

  def runningIngestState(events: Dataset[ImageEvent]): Dataset[BodyProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.waterbody_id)
      .mapGroupsWithState[BodyState, BodyProgress](GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[ImageEvent], state: GroupState[BodyState]) =>
          val evs = batch.toSeq
          val prev = state.getOption.getOrElse(BodyState(0L, Long.MinValue))
          val next = BodyState(
            prev.n + evs.size,
            (prev.lastMillis +: evs.map(_.captured_ts.getTime)).max)
          state.update(next)
          BodyProgress(key, next.n, new java.sql.Timestamp(next.lastMillis))
      }
  }
}

case class ImageEvent(waterbody_id: Long, captured_ts: java.sql.Timestamp)
case class BodyState(n: Long, lastMillis: Long)
case class BodyProgress(waterbody_id: Long, n_images: Long, last_captured: java.sql.Timestamp)
case class CdcOp(event_id: Long, user_id: Long, sec: Long, op: String, cents: Long)
case class CdcRow(user_id: Long, last_op: String, last_sec: Long, last_cents: Long, deleted: Boolean)
case class FeatEvent(event_id: Long, user_id: Long, sec: Long, cents: Long)
case class FeatWindow(buf: Vector[(Long, Long)])
case class FeatOut(event_id: Long, user_id: Long, n_7d: Long, cents_7d: Long, peak_7d: Long)
