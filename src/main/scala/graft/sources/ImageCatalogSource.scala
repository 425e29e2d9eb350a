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
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("partitionBy", "") == "dataset")
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

class ImageCatalogTable(rows: Long, partitions: Int, byDataset: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"image_catalog($rows)"
  override def schema(): StructType = ImageCatalogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ImageCatalogScanBuilder(rows, partitions, byDataset)
}

class ImageCatalogScanBuilder(rows: Long, partitions: Int, byDataset: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ImageCatalogSource.schema
  private var limit: Int = -1
  private var agg: Option[org.apache.spark.sql.connector.expressions.aggregate.Aggregation] = None

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

  /** LIMIT pushdown (Spark only offers it once every filter is pushed):
    * each partition stops GENERATING after `limit` accepted rows —
    * partial pushdown, Spark still applies the global limit on top. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  /** TopN pushdown for ORDER BY captured_ts_millis [DESC] LIMIT n —
    * the catalog's row index IS the time order (ts = base + i·step,
    * monotone), so "latest n images" needs no sort anywhere: ascending
    * reads forward, descending reads BACKWARD from each partition's
    * end, both stopping at n accepted rows. Partial pushdown — Spark
    * still merges the per-partition candidates with its TakeOrdered. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    orders match {
      case Array(o) => o.expression() match {
        case n: NamedReference
            if n.fieldNames.sameElements(Array("captured_ts_millis")) =>
          limit = l
          descending = o.direction() == SortDirection.DESCENDING
          true
        case _ => false
      }
      case _ => false
    }
  }
  private var descending = false

  /** Aggregate pushdown for the shapes a remote catalog answers from
    * its own index — global (no GROUP BY) COUNT(*)/MIN/MAX. Partial
    * pushdown: each partition returns one pre-aggregated row and Spark
    * merges, so the scan ships O(partitions) rows instead of O(rows) —
    * the "ask the catalog, don't download the catalog" contract. */
  override def supportCompletePushDown(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = false
  override def pushAggregation(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case n: NamedReference if n.fieldNames.length == 1 => Some(n.fieldNames()(0))
        case _ => None
      }
    val ok = a.groupByExpressions.isEmpty && a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => colOf(m.column).isDefined
        case m: Max => colOf(m.column).isDefined
        case _ => false
      }
    if (ok) agg = Some(a)
    ok
  }

  override def build(): Scan = agg match {
    case Some(a) => new ImageCatalogAggScan(rows, partitions, pushed, a)
    case None if byDataset => new ImageCatalogKeyedScan(rows, pushed, required)
    case None => new ImageCatalogScan(rows, partitions, pushed, required, limit, descending)
  }
}

/** Pushed-aggregate scan: one pre-aggregated row per partition. */
class ImageCatalogAggScan(
    rows: Long, partitions: Int, pushed: Array[Filter],
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
  import org.apache.spark.sql.connector.expressions.NamedReference

  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[NamedReference].fieldNames()(0)

  /** (kind, column): kind ∈ count|min|max. */
  private val specs: Array[(String, String)] = agg.aggregateExpressions.map {
    case _: CountStar => ("count", "")
    case m: Min => ("min", colOf(m.column))
    case m: Max => ("max", colOf(m.column))
  }

  override def readSchema(): StructType = StructType(specs.zipWithIndex.map {
    case (("count", _), i) => StructField(s"agg_$i", LongType, nullable = false)
    case ((_, c), i) =>
      StructField(s"agg_$i", ImageCatalogSource.schema(c).dataType, nullable = true)
  })
  override def description(): String =
    s"ImageCatalogAggScan PushedAggregates: [${specs.map(s => s"${s._1}(${s._2})").mkString(", ")}], " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(start =>
      ImageCatalogPartition(start, math.min(start + per, rows)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val ps = pushed; val sp = specs
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val p = partition.asInstanceOf[ImageCatalogPartition]
      private var done = false
      override def next(): Boolean = !done && { done = true; true }
      override def get(): InternalRow = {
        var n = 0L
        val mins = Array.fill[Any](sp.length)(null)
        val maxs = Array.fill[Any](sp.length)(null)
        var i = p.start
        while (i < p.end) {
          if (ImageCatalogSource.accept(ps, i)) {
            n += 1
            var c = 0
            while (c < sp.length) {
              sp(c) match {
                case ("count", _) =>
                case (kind, col) =>
                  val v = ImageCatalogSource.field(i, col)
                  val cmp = (a: Any, b: Any) => (a, b) match {
                    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
                    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
                    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
                  }
                  if (kind == "min" && (mins(c) == null || cmp(v, mins(c)) < 0)) mins(c) = v
                  if (kind == "max" && (maxs(c) == null || cmp(v, maxs(c)) > 0)) maxs(c) = v
              }
              c += 1
            }
          }
          i += 1
        }
        new GenericInternalRow(sp.zipWithIndex.map {
          case (("count", _), _) => n: Any
          case (("min", _), c) => mins(c)
          case (("max", _), c) => maxs(c)
        }.toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}

class ImageCatalogScan(
    rows: Long, partitions: Int, pushed: Array[Filter], required: StructType,
    limit: Int = -1, descending: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (DPP-style) partition pruning: capture time is MONOTONE
    * in the row index, so each input partition covers a closed ts
    * interval — a runtime IN/range filter on `captured_ts_millis`
    * (delivered by Spark from the other side of a join, after that
    * side is evaluated) prunes whole partitions before their tasks
    * launch. The generation-time `pushed` filters prune ROWS at plan
    * time; this prunes PARTITIONS at run time — the DSv2 analog of
    * dynamic partition pruning on a time-partitioned table. */
  private var runtime: Array[Filter] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // only advertise what survived column pruning — Spark resolves
    // these against the scan's OUTPUT, and a pruned-away column is an
    // analysis error, not a skipped optimization
    if (required.fieldNames.contains("captured_ts_millis"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("captured_ts_millis"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = runtime = filters

  private def tsOf(i: Long): Long = ImageCatalogSource.BaseMillis + i * ImageCatalogSource.StepMillis

  /** Partition [start, end) survives iff its ts interval can satisfy
    * every runtime filter; unknown filter shapes keep the partition
    * (pruning is an optimization, never a correctness gate). */
  private def survives(start: Long, end: Long): Boolean = {
    val lo = tsOf(start); val hi = tsOf(end - 1)
    runtime.forall {
      case org.apache.spark.sql.sources.In("captured_ts_millis", vs) =>
        vs.exists { v => val t = v.asInstanceOf[Number].longValue(); t >= lo && t <= hi }
      case EqualTo("captured_ts_millis", v) =>
        val t = v.asInstanceOf[Number].longValue(); t >= lo && t <= hi
      case GreaterThan("captured_ts_millis", v) => hi > v.asInstanceOf[Number].longValue()
      case GreaterThanOrEqual("captured_ts_millis", v) => hi >= v.asInstanceOf[Number].longValue()
      case LessThan("captured_ts_millis", v) => lo < v.asInstanceOf[Number].longValue()
      case LessThanOrEqual("captured_ts_millis", v) => lo <= v.asInstanceOf[Number].longValue()
      case _ => true
    }
  }
  override def readSchema(): StructType = required
  override def description(): String =
    s"ImageCatalogScan PushedFilters: [${pushed.mkString(", ")}], " +
      (if (limit >= 0 && descending) s"PushedTopN: ts DESC LIMIT $limit, "
       else if (limit >= 0) s"PushedLimit: $limit, " else "") +
      s"ReadSchema: ${required.catalogString}"
  override def toBatch: Batch = this

  /** Post-filter statistics from the catalog's own metadata — the
    * ANALYTIC selectivity a remote catalog serves without a scan
    * (dataset equality hits 1 of 3 datasets; a capture-time range is
    * its overlap fraction with the catalog's time span). Without this,
    * a DSv2 relation defaults to "unknown = huge" and the planner will
    * never broadcast a filtered catalog join. */
  override def estimateStatistics(): Statistics = {
    val span = rows.toDouble * ImageCatalogSource.StepMillis
    val base = ImageCatalogSource.BaseMillis
    val sel = pushed.foldLeft(1.0) { (s, f) =>
      s * (f match {
        case EqualTo("dataset", _) => 1.0 / 3.0
        case GreaterThan("captured_ts_millis", v) =>
          (((base + span) - v.asInstanceOf[Number].doubleValue()) / span).max(0).min(1)
        case GreaterThanOrEqual("captured_ts_millis", v) =>
          (((base + span) - v.asInstanceOf[Number].doubleValue()) / span).max(0).min(1)
        case LessThan("captured_ts_millis", v) =>
          ((v.asInstanceOf[Number].doubleValue() - base) / span).max(0).min(1)
        case LessThanOrEqual("captured_ts_millis", v) =>
          ((v.asInstanceOf[Number].doubleValue() - base) / span).max(0).min(1)
        case _ => 1.0
      })
    }
    val est = math.max(1L, (rows * sel).toLong)
    val estCapped = if (limit >= 0) math.min(est, limit.toLong) else est
    val rowWidth = 72L // 8 numeric cols + short strings
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(estCapped * rowWidth)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(estCapped)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per)
      .filter(start => survives(start, math.min(start + per, rows)))
      .map(start =>
        ImageCatalogPartition(start, math.min(start + per, rows)): InputPartition).toArray
  }

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new RowsSkippedMetric)

  override def createReaderFactory(): PartitionReaderFactory =
    new ImageCatalogReaderFactory(pushed, required.fieldNames, limit, descending)
}

case class ImageCatalogPartition(start: Long, end: Long) extends InputPartition

/** DSv2 custom metric: rows the pushed filters rejected AT GENERATION
  * — the observability counterpart of pushdown. In the Spark UI /
  * plan metrics this shows how much the source-side filter actually
  * saved, which is how an operator at 100 TB proves its pushdown is
  * working without re-running the query unpushed. */
class RowsSkippedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "rowsSkippedByPushdown"
  override def description(): String = "rows rejected by pushed filters at generation"
}

class RowsSkippedTaskMetric(var count: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = "rowsSkippedByPushdown"
  override def value(): Long = count
}

/** Storage-partitioned (key-grouped) layout: rows of dataset d are the
  * residue class i ≡ d (mod 3), so "one partition per dataset" needs
  * no data movement — each input partition declares its dataset as its
  * partition key and the scan reports `KeyGroupedPartitioning` over
  * identity(dataset). With `spark.sql.sources.v2.bucketing.enabled`,
  * Spark then satisfies a dataset-clustered distribution FROM THE
  * STORAGE LAYOUT: group-bys on dataset and joins between two such
  * scans plan ZERO Exchange — the DSv2 storage-partitioned-join
  * machinery modern table formats use, demonstrated end to end. */
case class DatasetPartition(d: Int, rows: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](ImageCatalogSource.field(d.toLong, "dataset")))
}

class ImageCatalogKeyedScan(rows: Long, pushed: Array[Filter], required: StructType)
    extends Scan with Batch with SupportsReportPartitioning {
  import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}

  override def readSchema(): StructType = required
  override def description(): String =
    s"ImageCatalogKeyedScan PushedFilters: [${pushed.mkString(", ")}], KeyGroupedBy: dataset"
  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions.identity("dataset")), 3)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until 3).map(d => DatasetPartition(d, rows): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val ps = pushed; val cols = required.fieldNames
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val p = partition.asInstanceOf[DatasetPartition]
      private var i = p.d.toLong - 3L
      private var current: InternalRow = _
      override def next(): Boolean = {
        i += 3
        while (i < p.rows && !ImageCatalogSource.accept(ps, i)) i += 3
        if (i >= p.rows) return false
        current = new GenericInternalRow(
          cols.map(c => ImageCatalogSource.field(i, c)).toArray[Any])
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

class ImageCatalogReaderFactory(
    pushed: Array[Filter], columns: Array[String], limit: Int = -1,
    descending: Boolean = false)
    extends PartitionReaderFactory {

  private def capped(n: Long): Long = if (limit >= 0) math.min(n, limit.toLong) else n

  /** VECTORIZED delivery: the scan hands Spark `ColumnarBatch`es (the
    * same interface the built-in parquet reader uses), so downstream
    * whole-stage codegen consumes column vectors via `ColumnarToRow`
    * instead of one virtual call per row per field. The row-based
    * reader below is kept as the reference implementation; the spec
    * pins both paths to identical results. (A descending TopN read
    * takes the row path — its backward walk is n rows, not worth a
    * second columnar loop.) */
  override def supportColumnarReads(partition: InputPartition): Boolean = !descending

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
      private var emitted = 0L
      private val skipped = new RowsSkippedTaskMetric(0L)

      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(skipped)

      override def next(): Boolean = {
        vectors.foreach(_.reset())
        var n = 0
        while (n < capacity && i < p.end && emitted + n < capped(Long.MaxValue)) {
          if (!ImageCatalogSource.accept(pushed, i)) skipped.count += 1
          else {
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
        emitted += n
        n > 0
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ImageCatalogPartition]
    val step = if (descending) -1L else 1L
    val first = if (descending) p.end else p.start - 1
    new PartitionReader[InternalRow] {
      private var i = first
      private var current: InternalRow = _
      private var emitted = 0L
      private val skipped = new RowsSkippedTaskMetric(0L)

      private def inRange: Boolean = i >= p.start && i < p.end

      override def next(): Boolean = {
        if (emitted >= capped(Long.MaxValue)) return false
        i += step
        while (inRange && !ImageCatalogSource.accept(pushed, i)) { skipped.count += 1; i += step }
        if (!inRange) return false
        emitted += 1
        current = new GenericInternalRow(
          columns.map(c => ImageCatalogSource.field(i, c)).toArray[Any])
        true
      }
      override def get(): InternalRow = current
      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(skipped)
      override def close(): Unit = ()
    }
  }
}
