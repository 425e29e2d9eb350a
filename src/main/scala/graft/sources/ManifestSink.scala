package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => rstream}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => wstream}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 SINK with the full two-phase commit protocol — the S5/S6
  * write-side story (reference main.py:453-457 relies on Postgres
  * transactions; an object-store sink has no transactions, so
  * exactly-once visibility must come from the COMMIT PROTOCOL):
  *
  *  1. each task's DataWriter writes to `_temp/<file>` and reports the
  *     file in its WriterCommitMessage — nothing is visible yet;
  *  2. the driver's BatchWrite.commit publishes exactly the reported
  *     files by moving them into the root and appending ONE manifest
  *     file listing them — the atomic publication point;
  *  3. BatchWrite.abort deletes the temp area; a failed/speculative
  *     task attempt that never reached commit leaves at most a stray
  *     temp file, which readers never see because
  *  4. the read side lists MANIFESTS, not the directory: only
  *     committed files are scanned.
  *
  * Rows are tab-escaped text (schema stored as DDL next to the data)
  * for dependency-free round-tripping of the demo types; a production
  * deployment swaps the encoder and the local-file ops for the Hadoop
  * FileSystem API — the protocol is unchanged. ManifestSinkSpec
  * drives write → read-back, multi-append, stray-temp invisibility,
  * and schema round-trip.
  *
  * Usage:
  *   df.write.format("graft.sources.ManifestSink").option("path", p)
  *     .mode("append").save()
  *   spark.read.format("graft.sources.ManifestSink").option("path", p)
  *     .load()
  */
class ManifestSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val schemaFile = new File(ManifestSink.root(options), ManifestSink.SchemaFile)
    if (schemaFile.exists())
      StructType.fromDDL(new String(
        Files.readAllBytes(schemaFile.toPath), StandardCharsets.UTF_8))
    else StructType(Nil) // first write defines it
  }
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestTable(properties.get("path"), schema)
  override def supportsExternalMetadata(): Boolean = true
}

object ManifestSink {
  val SchemaFile = "_schema.ddl"
  def root(options: CaseInsensitiveStringMap): File = {
    val p = options.get("path")
    require(p != null, "ManifestSink requires option 'path'")
    new File(p)
  }

  // ---- tab-escaped row codec (supported types: long, int, double,
  // ---- boolean, string, timestamp-as-micros) ----
  def encodeField(v: Any): String =
    if (v == null) "\\N"
    else v.toString
      .replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  /** Deterministic manifest order: (mtime, name). Epoch manifests of
    * one streaming query are also monotone by epoch id; a production
    * deployment would use strictly monotone manifest ids — the
    * protocol is unchanged. */
  def sortedManifests(root: File): Seq[File] =
    Option(root.listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.startsWith("_manifest-")).toSeq
      .sortBy(f => (f.lastModified(), f.getName))

  def filesOf(manifests: Seq[File]): Seq[String] =
    manifests.flatMap(m => new String(
      Files.readAllBytes(m.toPath), StandardCharsets.UTF_8).split("\n"))
      .filter(_.nonEmpty)

  def decodeField(s: String, dt: DataType): Any =
    if (s == "\\N") null
    else {
      val raw = s.replace("\\n", "\n").replace("\\t", "\t").replace("\\\\", "\\")
      dt match {
        case LongType | TimestampType => raw.toLong
        case IntegerType => raw.toInt
        case DoubleType => raw.toDouble
        case BooleanType => raw.toBoolean
        case StringType => UTF8String.fromString(raw)
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
    }
}

class ManifestTable(path: String, external: StructType)
    extends Table with SupportsWrite with SupportsRead {
  require(path != null, "ManifestSink requires option 'path'")

  override def name(): String = s"manifest_sink($path)"

  override def schema(): StructType =
    if (external.nonEmpty) external
    else {
      val f = new File(path, ManifestSink.SchemaFile)
      if (f.exists())
        StructType.fromDDL(new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
      else StructType(Nil)
    }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ManifestWriteBuilder(path, info)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path, schema(),
      Option(options.get("asOfManifest")).map(_.toInt))
}

// --------------------------------------------------------------- write

class ManifestWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ManifestBatchWrite(path, info.queryId(), info.schema())
    override def toStreaming: wstream.StreamingWrite =
      new ManifestStreamingWrite(path, info.queryId(), info.schema())
  }
}

/** Streaming flavor: one manifest per (queryId, epoch). Exactly-once
  * across restarts comes from IDEMPOTENT epoch commit — after a crash
  * between sink commit and checkpoint advance, Structured Streaming
  * re-runs the epoch and commits it AGAIN; if the epoch's manifest
  * already exists the duplicate commit publishes nothing and the
  * re-written temp files are discarded. */
class ManifestStreamingWrite(path: String, queryId: String, schema: StructType)
    extends wstream.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): wstream.StreamingDataWriterFactory =
    new ManifestStreamingWriterFactory(path, queryId, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new File(path)
    root.mkdirs()
    val manifest = new File(root, s"_manifest-$queryId-epoch-$epochId")
    if (manifest.exists()) { // replayed epoch: drop the duplicate files
      messages.collect { case m: ManifestCommitMessage =>
        new File(root, s"_temp/${m.file}").delete()
      }
      return
    }
    val files = messages.collect {
      case m: ManifestCommitMessage if m.rows > 0 =>
        Files.move(
          new File(root, s"_temp/${m.file}").toPath,
          new File(root, m.file).toPath, StandardCopyOption.ATOMIC_MOVE)
        m.file
    }
    val schemaFile = new File(root, ManifestSink.SchemaFile)
    if (!schemaFile.exists())
      Files.write(schemaFile.toPath, schema.toDDL.getBytes(StandardCharsets.UTF_8))
    Files.write(manifest.toPath, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new File(path)
    messages.collect { case m: ManifestCommitMessage =>
      new File(root, s"_temp/${m.file}").delete()
    }
  }
}

class ManifestStreamingWriterFactory(path: String, queryId: String, schema: StructType)
    extends wstream.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new ManifestWriterFactory(path, s"$queryId-e$epochId", schema)
      .createWriter(partitionId, taskId)
}

class ManifestBatchWrite(path: String, queryId: String, schema: StructType)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, queryId, schema)

  /** The atomic publication point (driver-side, after every task
    * succeeded): move exactly the files the committed task attempts
    * reported, then append one manifest naming them. Readers list
    * manifests, so a crash before this point publishes nothing and a
    * crash after it publishes everything — no torn state. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new File(path)
    root.mkdirs()
    val files = messages.collect {
      case m: ManifestCommitMessage if m.rows > 0 =>
        val tmp = new File(root, s"_temp/${m.file}")
        Files.move(tmp.toPath, new File(root, m.file).toPath,
          StandardCopyOption.ATOMIC_MOVE)
        m.file
    }
    val schemaFile = new File(root, ManifestSink.SchemaFile)
    if (!schemaFile.exists())
      Files.write(schemaFile.toPath, schema.toDDL.getBytes(StandardCharsets.UTF_8))
    Files.write(
      new File(root, s"_manifest-$queryId").toPath,
      files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    cleanupTemp(root)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupTemp(new File(path))

  private def cleanupTemp(root: File): Unit = {
    val tmp = new File(root, "_temp")
    Option(tmp.listFiles()).foreach(_.foreach(_.delete()))
    tmp.delete()
  }
}

case class ManifestCommitMessage(file: String, rows: Long) extends WriterCommitMessage

class ManifestWriterFactory(path: String, queryId: String, schema: StructType)
    extends DataWriterFactory {

  /** taskId is unique per attempt — speculative/retried attempts write
    * distinct temp files and only the attempt whose commit message
    * reaches the driver gets published. */
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val fileName = f"part-$queryId-$partitionId%05d-$taskId.tsv"
      private val tmp = new File(new File(path, "_temp"), fileName)
      tmp.getParentFile.mkdirs()
      private val out = Files.newBufferedWriter(tmp.toPath, StandardCharsets.UTF_8)
      private var rows = 0L
      private val types = schema.fields.map(_.dataType)

      override def write(row: InternalRow): Unit = {
        val cells = types.indices.map { i =>
          ManifestSink.encodeField(
            if (row.isNullAt(i)) null else row.get(i, types(i)))
        }
        out.write(cells.mkString("\t"))
        out.write("\n")
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        ManifestCommitMessage(fileName, rows)
      }
      override def abort(): Unit = { out.close(); tmp.delete() }
      override def close(): Unit = ()
    }
}

// ---------------------------------------------------------------- read

class ManifestScanBuilder(path: String, schema: StructType, asOf: Option[Int])
    extends ScanBuilder {
  override def build(): Scan = new ManifestScan(path, schema, asOf)
}

class ManifestScan(path: String, schema: StructType, asOf: Option[Int])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** Only manifest-listed files — a stray temp or unpublished file is
    * invisible by construction. One input partition per committed
    * file (each file was one task's output: natural parallelism).
    * `asOfManifest = n` time-travels to the first n commits: every
    * commit is a retained snapshot boundary. */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new File(path)
    val manifests = ManifestSink.sortedManifests(root)
    val visible = asOf.fold(manifests)(n => manifests.take(n))
    ManifestSink.filesOf(visible)
      .map(f => ManifestFilePartition(new File(root, f).getPath): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(schema)

  /** Streaming read: the manifest sequence IS the offset log — offset
    * n = "the first n committed manifests". Each micro-batch reads
    * exactly the manifests that appeared since the last one; commits
    * are atomic, so a batch never sees a torn write. */
  override def toMicroBatchStream(checkpointLocation: String): rstream.MicroBatchStream =
    new ManifestMicroBatchStream(path, schema)
}

case class ManifestOffset(n: Int) extends rstream.Offset {
  override def json(): String = n.toString
}

class ManifestMicroBatchStream(path: String, schema: StructType)
    extends rstream.MicroBatchStream {
  private val root = new File(path)

  override def initialOffset(): rstream.Offset = ManifestOffset(0)
  override def latestOffset(): rstream.Offset =
    ManifestOffset(ManifestSink.sortedManifests(root).size)
  override def deserializeOffset(json: String): rstream.Offset =
    ManifestOffset(json.toInt)

  override def planInputPartitions(
      start: rstream.Offset, end: rstream.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ManifestOffset].n
    val e = end.asInstanceOf[ManifestOffset].n
    val slice = ManifestSink.sortedManifests(root).slice(s, e)
    ManifestSink.filesOf(slice)
      .map(f => ManifestFilePartition(new File(root, f).getPath): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(schema)

  override def commit(end: rstream.Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ManifestFilePartition(file: String) extends InputPartition

class ManifestReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ManifestFilePartition].file
    val types = schema.fields.map(_.dataType)
    new PartitionReader[InternalRow] {
      private val lines = Files.lines(Paths.get(file))
      private val it = lines.iterator()
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!it.hasNext) return false
        val cells = it.next().split("\t", -1)
        current = new GenericInternalRow(
          types.indices.map(i => ManifestSink.decodeField(cells(i), types(i))).toArray[Any])
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = lines.close()
    }
  }
}
