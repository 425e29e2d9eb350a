package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextHash, VectorOps}
import graft.operators.{Similarity, TextAnalysis}

/** Retrieval-prep counterpart of CorpusPipeline: the chunk → embed →
  * index → retrieve dataflow a RAG / retrieval-augmented training
  * pipeline runs, composed from the independently-tested pieces —
  *
  *   documents
  *     → sliding-window chunking            (q55 geometry: W/S windows
  *                                           + tail + short-doc chunk)
  *     → feature-hash embedding             (HashEmbed: bag-of-token
  *                                           LCG projection, no model)
  *     → IVF index + top-k retrieval        (q44 path: NearestCell
  *                                           cells, broadcast probes,
  *                                           exact cosine rerank)
  *
  * The embedder is the "hashing trick": chunks sharing tokens get
  * correlated vectors, so nearest-neighbor retrieval over these
  * vectors IS lexical-overlap retrieval — the cheap, deterministic,
  * model-free tier a 100 TB pipeline runs before any learned
  * embedding. Every stage is a narrow map or the q44 index shape;
  * nothing new shuffles. RagPipelineSpec measures IVF recall against
  * brute-force cosine over the same vectors and pins determinism.
  */
object RagPipeline {

  /** Chunk ids pack as doc_id·256 + chunk_id (256 chunks would need a
    * ~6000-token document under the W=32/S=24 geometry — far beyond
    * the bounded fixture docs this id scheme serves). */
  val ChunkIdBase = 256L

  /** (vec_id, e, nrm) per chunk: q55's chunk geometry joined back to
    * the token array, per-chunk token hashes via the WordNGramHashes
    * 1-gram path, bag-embedded with HashEmbed. All map-side. */
  def chunkVectors(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    TextAnalysis.chunkDocs(spark, dir)
      .join(tok, "doc_id")
      .select(
        (col("doc_id") * ChunkIdBase + col("chunk_id")).as("vec_id"),
        VectorOps.hashEmbed(
          TextHash.wordNGramHashes(
            slice(col("t"), col("start_tok") + 1, col("n_tokens")), 1),
          dim).as("e"))
      .withColumn("nrm", sqrt(VectorOps.dot(col("e"), col("e"))))
      .filter(col("nrm") > 0) // all-empty-token chunks can't be indexed
  }

  /** Top-k retrieval over the chunk index via the q44 IVF core.
    * `queryPred`/`centroidPred` select chunk vec_ids; defaults give a
    * ~1/31 quantizer and a small deterministic query set. */
  def retrieve(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      nprobe: Int = 3,
      queryPred: Column = expr("vec_id % 101 = 0"),
      centroidPred: Column = expr("vec_id % 31 = 7"),
      dim: Int = 64): DataFrame =
    Similarity.ivfTopKWith(chunkVectors(spark, dir, dim), queryPred, centroidPred,
      nprobe, k)
}
