package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** DataSource V2 form of the S2 image-catalog scan (SURVEY §2.1 S2:
  * "in a live system a custom DSv2 TableProvider"). The reference
  * pushes bounds/date/cloud filters to Earth Engine servers and only
  * receives matching metadata (main.py:395-411); this source
  * reproduces that contract INSIDE Spark's source API:
  *
  *  - `SupportsPushDownFilters`: equality on `dataset` and range
  *    predicates on `captured_ts_millis` are accepted and evaluated
  *    AT GENERATION — rows outside the window are never materialized
  *    (the EE-server-side-filter analog);
  *  - `SupportsPushDownRequiredColumns`: the reader emits only the
  *    pruned schema;
  *  - rows are deterministic functions of the row index (offline
  *    stand-in for the remote catalog), split into `partitions`
  *    row-range input partitions.
  *
  * Usage: `spark.read.format("graft.sources.ImageCatalogSource")
  * .option("rows", n).option("partitions", p).load()`.
  */
class ImageCatalogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ImageCatalogSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ImageCatalogTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
  override def supportsExternalMetadata(): Boolean = false
}

object ImageCatalogSource {
  val schema: StructType = StructType(Seq(
    StructField("ee_id", StringType, nullable = false),
    StructField("dataset", StringType, nullable = false),
    StructField("captured_ts_millis", LongType, nullable = false),
    StructField("footprint_min_lon", DoubleType, nullable = false),
    StructField("footprint_max_lon", DoubleType, nullable = false),
    StructField("footprint_min_lat", DoubleType, nullable = false),
    StructField("footprint_max_lat", DoubleType, nullable = false),
    StructField("cloud_pct", DoubleType, nullable = false)))

  val BaseMillis: Long = 1704067200000L // 2024-01-01T00:00:00Z
  val StepMillis: Long = 97000L
  private val Datasets = Array("S2A", "S2B", "L9")

  /** Deterministic catalog row i (LCG-derived fields). */
  def field(i: Long, col: String): Any = col match {
    case "ee_id" => UTF8String.fromString(f"img$i%010d")
    case "dataset" => UTF8String.fromString(Datasets((i % 3).toInt))
    case "captured_ts_millis" => BaseMillis + i * StepMillis
    case "footprint_min_lon" => ((i * 1103515245L + 12345L) % 332L).toDouble - 180.0
    case "footprint_max_lon" => ((i * 1103515245L + 12345L) % 332L).toDouble - 180.0 + 28.0
    case "footprint_min_lat" => ((i * 69069L + 1L) % 152L).toDouble - 90.0
    case "footprint_max_lat" => ((i * 69069L + 1L) % 152L).toDouble - 90.0 + 28.0
    case "cloud_pct" => ((i * 37L) % 100L).toDouble
  }

  /** Source-side filter evaluation — rejected rows are skipped at
    * generation, reproducing the reference's server-side
    * filterDate/metadata filters (main.py:395-404). Shared by the
    * row-based and columnar readers. */
  def accept(pushed: Array[Filter], idx: Long): Boolean = pushed.forall {
    case EqualTo("dataset", v: String) =>
      field(idx, "dataset").toString == v
    case GreaterThan("captured_ts_millis", v) =>
      field(idx, "captured_ts_millis").asInstanceOf[Long] > v.asInstanceOf[Number].longValue()
    case GreaterThanOrEqual("captured_ts_millis", v) =>
      field(idx, "captured_ts_millis").asInstanceOf[Long] >= v.asInstanceOf[Number].longValue()
    case LessThan("captured_ts_millis", v) =>
      field(idx, "captured_ts_millis").asInstanceOf[Long] < v.asInstanceOf[Number].longValue()
    case LessThanOrEqual("captured_ts_millis", v) =>
      field(idx, "captured_ts_millis").asInstanceOf[Long] <= v.asInstanceOf[Number].longValue()
    case _ => true
  }
}

class ImageCatalogTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"image_catalog($rows)"
  override def schema(): StructType = ImageCatalogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ImageCatalogScanBuilder(rows, partitions)
}

class ImageCatalogScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ImageCatalogSource.schema

  /** Accept what the "remote catalog" can evaluate (dataset equality,
    * capture-time ranges); everything else stays a Spark-side
    * residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("dataset", _: String) => true
      case GreaterThan("captured_ts_millis", _) | GreaterThanOrEqual("captured_ts_millis", _) |
          LessThan("captured_ts_millis", _) | LessThanOrEqual("captured_ts_millis", _) => true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new ImageCatalogScan(rows, partitions, pushed, required)
}

class ImageCatalogScan(
    rows: Long, partitions: Int, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"ImageCatalogScan PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(start =>
      ImageCatalogPartition(start, math.min(start + per, rows)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ImageCatalogReaderFactory(pushed, required.fieldNames)
}

case class ImageCatalogPartition(start: Long, end: Long) extends InputPartition

class ImageCatalogReaderFactory(pushed: Array[Filter], columns: Array[String])
    extends PartitionReaderFactory {

  /** VECTORIZED delivery: the scan hands Spark `ColumnarBatch`es (the
    * same interface the built-in parquet reader uses), so downstream
    * whole-stage codegen consumes column vectors via `ColumnarToRow`
    * instead of one virtual call per row per field. The row-based
    * reader below is kept as the reference implementation; the spec
    * pins both paths to identical results. */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
    val p = partition.asInstanceOf[ImageCatalogPartition]
    val schema = StructType(columns.map(c =>
      ImageCatalogSource.schema(ImageCatalogSource.schema.fieldIndex(c))))
    val capacity = 4096
    new PartitionReader[ColumnarBatch] {
      private val vectors = OnHeapColumnVector.allocateColumns(capacity, schema)
      private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
      private var i = p.start

      override def next(): Boolean = {
        vectors.foreach(_.reset())
        var n = 0
        while (n < capacity && i < p.end) {
          if (ImageCatalogSource.accept(pushed, i)) {
            var c = 0
            while (c < columns.length) {
              ImageCatalogSource.field(i, columns(c)) match {
                case l: Long => vectors(c).putLong(n, l)
                case d: Double => vectors(c).putDouble(n, d)
                case s: UTF8String =>
                  val b = s.getBytes; vectors(c).putByteArray(n, b, 0, b.length)
              }
              c += 1
            }
            n += 1
          }
          i += 1
        }
        batch.setNumRows(n)
        n > 0
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ImageCatalogPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      private var current: InternalRow = _

      override def next(): Boolean = {
        i += 1
        while (i < p.end && !ImageCatalogSource.accept(pushed, i)) i += 1
        if (i >= p.end) return false
        current = new GenericInternalRow(
          columns.map(c => ImageCatalogSource.field(i, c)).toArray[Any])
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
