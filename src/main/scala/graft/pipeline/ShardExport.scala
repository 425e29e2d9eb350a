package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis

/** End-to-end TRAINING-SHARD EXPORT — the pipeline's final
  * deliverable, composed from verbs that are each already oracled:
  *
  *   q161 BPE merge training → q162 chain-projection encode
  *     → q62-form token-budget packing → manifest-committed publish
  *
  * in ONE write action, with TOKEN-MASS AND DOC-COUNT CONSERVATION
  * proven by `observe` metrics on the same action (the CorpusPipeline
  * funnel pattern: observation nodes count rows/mass as they stream
  * through the one real job — a per-stage `count()` would re-run the
  * encode per stage) and HARD-GATED by a `require` before the report
  * is returned. The published rows are the shard CONTENT — (doc_id,
  * source, shard_id, bpe_tokens, text) — partitioned into fixed
  * token-budget shards a pretraining data loader consumes directly;
  * [[TextAnalysis.shardManifest]] (q164) is the oracled manifest of
  * the same assignment, shared seam [[TextAnalysis.shardAssignOf]],
  * so the DuckDB-gated per-shard totals and the published files agree
  * by construction. ShardExportSpec re-reads the published shards in
  * a FRESH session and re-aggregates them to the q164 manifest —
  * the external half of the conservation proof.
  *
  * Scale shape: one (doc_id, word) aggregate + map-only encode, one
  * per-source running-sum window (packing parallel across sources),
  * one id-equi join back to the text (the only corpus×corpus join —
  * both sides hash-partition on doc_id), one manifest-committed
  * write. The driver holds the R=4 merge winner rows and two
  * observation structs. */
object ShardExport {

  case class ShardStage(stage: String, docs: Long, tokens: Long)

  /** Tokenize → pack → publish; returns the conservation report
    * (corpus-encode mass vs published mass, already `require`-gated
    * equal). */
  def run(spark: SparkSession, dir: String, outDir: String): Seq[ShardStage] = {
    val docs = Tables.documents(spark, dir)
    val (mergeRows, syms) = TextAnalysis.bpeMergeRounds(docs, TextAnalysis.BpeOracleRounds)
    syms.unpersist()
    val merges = mergeRows.map(r => (r._2, r._3, r._4))

    val oEncode = Observation("shard_encode")
    val oPublish = Observation("shard_publish")
    def observed(df: DataFrame, o: Observation): DataFrame =
      df.observe(o, count(lit(1)).as("docs"),
        coalesce(sum(col("bpe_tokens")), lit(0L)).as("tokens"))

    val assigned = observed(TextAnalysis.shardAssignOf(docs, merges), oEncode)
    val published = observed(
      assigned.join(docs.select(col("doc_id"), col("text")), Seq("doc_id")),
      oPublish)
      .select(col("doc_id"), col("source"), col("shard_id"),
        col("bpe_tokens"), col("text"))
    published.write.format("graft.sources.ManifestSink")
      .option("path", outDir).mode(SaveMode.Append).save()

    def stageOf(name: String, o: Observation) = ShardStage(name,
      o.get("docs").asInstanceOf[Long], o.get("tokens").asInstanceOf[Long])
    val enc = stageOf("corpus_encode", oEncode)
    val pub = stageOf("published", oPublish)
    require(enc.docs == pub.docs && enc.tokens == pub.tokens,
      s"shard export lost mass: encoded ${enc.docs} docs/${enc.tokens} tokens, " +
        s"published ${pub.docs}/${pub.tokens}")
    Seq(enc, pub)
  }

  /** Export timing harness (the PERF.md row): one [[run]] over
    * `SPARK_GRAFT_SF_DIR`, printing the conservation report and the
    * wall clock as one JSON line. */
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-shards").toString)
    val spark = graft.GraftSession.local()
    val t0 = System.nanoTime()
    val stages = run(spark, dir, out)
    val sec = (System.nanoTime() - t0) / 1e9
    val body = stages.map(s =>
      s""""${s.stage}": {"docs": ${s.docs}, "tokens": ${s.tokens}}""").mkString(", ")
    println(f"""{"run_sec": $sec%.3f, $body, "sf": "$dir", "out": "$out"}""")
    spark.stop()
  }
}
