package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 catalog source: schema, determinism, filter pushdown (rows
  * pruned at generation) and column pruning. */
class ImageCatalogSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def catalog(rows: Int = 10000) =
    spark.read.format("graft.sources.ImageCatalogSource")
      .option("rows", rows.toString).option("partitions", "4").load()

  test("scan produces the declared schema and exactly `rows` deterministic rows") {
    val df = catalog()
    assert(df.schema.fieldNames.toSeq == Seq("ee_id", "dataset", "captured_ts_millis",
      "footprint_min_lon", "footprint_max_lon", "footprint_min_lat", "footprint_max_lat",
      "cloud_pct"))
    assert(df.count() == 10000)
    assert(df.select("ee_id").distinct().count() == 10000)
    // deterministic: same source read twice is identical
    assert(catalog().exceptAll(df).count() == 0)
  }

  test("dataset equality and time-range filters are pushed into the source") {
    val lo = graft.sources.ImageCatalogSource.BaseMillis + 1000L * graft.sources.ImageCatalogSource.StepMillis
    val filtered = catalog()
      .filter(col("dataset") === "S2A" && col("captured_ts_millis") >= lo)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("captured_ts_millis"),
      s"pushed filters must appear in the scan description:\n$plan")
    // pushdown preserves semantics: same result as residual filtering
    val residual = catalog().collect()
      .filter(r => r.getString(1) == "S2A" && r.getLong(2) >= lo)
    assert(filtered.count() == residual.length)
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val pruned = catalog().select("ee_id", "cloud_pct")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<ee_id:string,cloud_pct:double>"),
      s"reader must emit only the pruned columns:\n$plan")
    assert(pruned.count() == 10000)
  }

  test("scan is vectorized: ColumnarToRow in the plan, results ≡ the row-based reader") {
    val df = catalog(5000)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"columnar batches must flow into codegen via ColumnarToRow:\n$plan")
    // the columnar reader must agree with the row-based reference
    // reader cell-for-cell (same generator, same pushdown, both paths)
    import org.apache.spark.sql.catalyst.InternalRow
    val factory = new graft.sources.ImageCatalogReaderFactory(
      Array.empty, graft.sources.ImageCatalogSource.schema.fieldNames)
    val part = graft.sources.ImageCatalogPartition(0L, 5000L)
    val rowReader = factory.createReader(part)
    val viaRows = scala.collection.mutable.ArrayBuffer[String]()
    while (rowReader.next()) {
      val r = rowReader.get()
      viaRows += (0 until 8).map(i =>
        r.get(i, graft.sources.ImageCatalogSource.schema(i).dataType)).mkString("|")
    }
    val viaColumnar = df.collect().map(r => r.toSeq.mkString("|"))
    assert(viaColumnar.sorted.toSeq === viaRows.sorted.toSeq)
  }

  test("filters apply inside columnar batches too (batch rows are pre-filtered)") {
    val lo = graft.sources.ImageCatalogSource.BaseMillis + 2000L * graft.sources.ImageCatalogSource.StepMillis
    val filtered = catalog(5000)
      .filter(col("dataset") === "L9" && col("captured_ts_millis") >= lo)
    val expected = (0L until 5000L).count(i =>
      graft.sources.ImageCatalogSource.field(i, "dataset").toString == "L9" &&
        graft.sources.ImageCatalogSource.field(i, "captured_ts_millis").asInstanceOf[Long] >= lo)
    assert(filtered.count() === expected)
  }

  test("cloud filter stays a Spark-side residual (not claimed by the source)") {
    val df = catalog().filter(col("cloud_pct") < 20.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.replaceAll("ReadSchema:.*", "").contains("cloud_pct < 20")
      || plan.contains("Filter"), "cloud predicate must be evaluated by Spark")
    assert(df.count() == catalog().collect().count(_.getDouble(7) < 20.0))
  }

  test("custom metric: rowsSkippedByPushdown shows exactly what the source-side filter saved") {
    val df = catalog().filter(col("dataset") === "S2A")
    // execute THIS plan (count() would build and run a different one)
    assert(df.collect().nonEmpty)
    val metric = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.metrics.get("rowsSkippedByPushdown").map(_.value)
    }.flatten
    // 2 of 3 datasets are rejected at generation: 10000 - |S2A|
    val expected = 10000L - (0L until 10000L).count(
      graft.sources.ImageCatalogSource.field(_, "dataset").toString == "S2A")
    assert(metric.contains(expected),
      s"skip metric should be $expected, got $metric")
  }

  test("LIMIT pushdown: partitions stop generating after the limit (plan carries PushedLimit)") {
    val df = catalog().filter(col("dataset") === "S2A").limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 7"), s"limit must reach the source:\n$plan")
    val rows = df.collect()
    assert(rows.length == 7 && rows.forall(_.getString(1) == "S2A"))
  }

  test("aggregate pushdown: COUNT/MIN/MAX never materialize catalog rows, partials merge exactly") {
    val df = catalog().filter(col("dataset") === "S2A")
      .agg(count(lit(1)).as("n"), min(col("captured_ts_millis")).as("mn"),
        max(col("captured_ts_millis")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"aggregation must be answered by the source:\n$plan")
    val r = df.head()
    // reference computed from the generator contract on the driver
    val ref = (0L until 10000L).filter(i =>
      graft.sources.ImageCatalogSource.field(i, "dataset").toString == "S2A")
      .map(i => graft.sources.ImageCatalogSource.field(i, "captured_ts_millis").asInstanceOf[Long])
    assert(r.getLong(0) == ref.length.toLong, "pushed COUNT")
    assert(r.getLong(1) == ref.min && r.getLong(2) == ref.max, "pushed MIN/MAX")
  }

  test("TopN pushdown: latest-n-images reads BACKWARD, no sort of the catalog anywhere") {
    val df = catalog().filter(col("dataset") === "S2A")
      .orderBy(col("captured_ts_millis").desc).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN"), s"TopN must reach the source:\n$plan")
    val got = df.collect().map(r => (r.getString(0), r.getLong(2)))
    val expected = (0L until 10000L)
      .filter(i => graft.sources.ImageCatalogSource.field(i, "dataset").toString == "S2A")
      .map(i => (graft.sources.ImageCatalogSource.field(i, "ee_id").toString,
        graft.sources.ImageCatalogSource.field(i, "captured_ts_millis").asInstanceOf[Long]))
      .sortBy(-_._2).take(5)
    assert(got.toSeq == expected, s"got ${got.toSeq}")
  }

  test("runtime filtering: a join's other side prunes catalog partitions before tasks launch") {
    import spark.implicits._
    val base = graft.sources.ImageCatalogSource.BaseMillis
    val step = graft.sources.ImageCatalogSource.StepMillis
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val cat = spark.read.format("graft.sources.ImageCatalogSource")
        .option("rows", "2000000").option("partitions", "8").load()
      // dim keys land in the FIRST of 8 partitions; the Range keeps a
      // real Filter node (a folded LocalRelation would defeat the
      // selectivity check and DPP would never be inserted)
      val dim = spark.range(30)
        .filter(col("id") % 10 === 0)
        .select((lit(base) + col("id") * lit(step)).as("ts_wanted"))
      val joined = cat.join(dim, col("captured_ts_millis") === col("ts_wanted"))
      assert(joined.collect().length == 3)
      val plan = joined.queryExecution.executedPlan
      assert(plan.toString.toLowerCase.contains("dynamicpruning"),
        s"DPP filter must be planned against the scan:\n$plan")
      val scanRows = plan.collectLeaves().collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.metrics("numOutputRows").value
      }
      // 7 of 8 partitions pruned at runtime: the scan generates only
      // the surviving partition's 250k rows, not 2M
      assert(scanRows.exists(n => n > 0 && n <= 250000L),
        s"runtime filter should prune to one partition, scan emitted $scanRows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("storage-partitioned layout: key-grouped reporting eliminates agg AND join exchanges") {
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def keyed() = spark.read.format("graft.sources.ImageCatalogSource")
        .option("rows", "9000").option("partitionBy", "dataset").load()
      // group-by on the partition key: satisfied FROM STORAGE, no shuffle
      val agg = keyed().groupBy(col("dataset")).count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "key-grouped scan must satisfy the aggregation's distribution")
      assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ==
        Seq(("L9", 3000L), ("S2A", 3000L), ("S2B", 3000L)))
      // storage-partitioned JOIN: two keyed scans, zero Exchange even
      // with broadcast disabled — the DSv2 SPJ path end to end
      val j = keyed().groupBy(col("dataset")).count()
        .join(keyed().groupBy(col("dataset")).agg(max("cloud_pct").as("mx")), "dataset")
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        s"SPJ must avoid all shuffles:\n${j.queryExecution.executedPlan}")
      assert(j.collect().length == 3)
      // contrast: the row-range layout must shuffle for the same agg —
      // the zero above is the REPORTED partitioning, not AQE luck
      val plain = catalog(9000).groupBy(col("dataset")).count()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("reported statistics make a filtered catalog broadcastable in joins") {
    import spark.implicits._
    // without SupportsReportStatistics a DSv2 relation is "unknown =
    // huge" and never broadcasts; the analytic post-filter estimate
    // (1/3 of 10k rows * 72 B) is far under the 10 MB threshold
    val dim = catalog().filter(col("dataset") === "L9")
      .select(col("ee_id"), col("cloud_pct"))
    val fact = spark.range(20000).select(
      concat(lit("img"), lpad((col("id") % 10000).cast("string"), 10, "0")).as("ee_id"))
    val plan = fact.join(dim, "ee_id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"planner must broadcast the filtered catalog via reported stats:\n$plan")
  }
}
