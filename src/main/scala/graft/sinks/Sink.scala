package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** Sinks (SURVEY §2.1 S5/S6).
  *
  * S6 — idempotent upsert: the reference's `INSERT … ON CONFLICT DO
  * NOTHING` on PK (waterbody_id, captured_ts) (main.py:453-457,
  * 106-107). Spark-native form: dedup the incoming batch on the key,
  * left-anti join against the existing sink keys, append — replaying
  * the same batch is a no-op (the SURVEY §5 idempotence property,
  * proven in PipelineSpec).
  *
  * S5 — binary artifact sink: the reference writes 3 S3 objects per
  * image from a thread pool (main.py:311-325). Spark-native form:
  * `foreachPartition` writes executor-side — artifacts never pass
  * through the driver; here targeting the local filesystem (tests),
  * an object-store client in production.
  */
object Sink {

  /** Returns the number of rows actually appended. */
  def upsertAppend(df: DataFrame, path: String, keys: Seq[String]): Long = {
    val spark = df.sparkSession
    val incoming = df.dropDuplicates(keys)
    val fresh =
      if (Files.exists(Paths.get(path))) {
        val existingKeys = spark.read.parquet(path).select(keys.map(col): _*)
        incoming.join(existingKeys, keys, "left_anti")
      } else incoming
    val cached = fresh.cache()
    try {
      val n = cached.count()
      if (n > 0) cached.write.mode("append").parquet(path)
      n
    } finally cached.unpersist()
  }

  /** Writes each (relativePath, bytes) pair under `dir`, executor-side. */
  def writeArtifacts(artifacts: DataFrame, dir: String): Unit = {
    val pathCol = artifacts.columns(0)
    val bytesCol = artifacts.columns(1)
    artifacts.select(col(pathCol), col(bytesCol)).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val target = Paths.get(dir, r.getString(0))
          Files.createDirectories(target.getParent)
          Files.write(target, r.getAs[Array[Byte]](1))
        }
    }
  }
}
