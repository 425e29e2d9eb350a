package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The two scale patterns that can't show up in single-query plans:
  * bucketed co-located joins and salt-based skew mitigation. Both are
  * proven (a) semantically equivalent to the naive form and (b)
  * structurally better (shuffle elimination asserted on the plan). */
class ScalePatternsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables co-locate the join: no Exchange in the joined plan") {
    val ord = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    try {
      // write both sides bucketed by the join key into the session
      // catalog (in-memory catalog; files land in spark-warehouse/)
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_bucketed")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_bucketed")
      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle either side on the join key:\n$plan")
      // and the result equals the naive shuffled join
      val naive = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val bucketed = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(bucketed == naive)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
      // in-memory catalog leaves the files behind — remove them
      def rm(p: java.io.File): Unit = {
        if (p.isDirectory) p.listFiles.foreach(rm)
        p.delete()
      }
      rm(new java.io.File("spark-warehouse"))
    }
  }

  test("partitionBy write → partition pruning: filtered scan reads one partition") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events_by_day"
    val ev = Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
    ev.write.partitionBy("day").parquet(dir)
    val oneDay = ev.select(col("day")).distinct().orderBy(col("day")).head().getDate(0)
    val pruned = spark.read.parquet(dir).filter(col("day") === lit(oneDay))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("day"),
      s"day filter must prune partitions at the scan:\n$plan")
    assert(pruned.count() == ev.filter(col("day") === lit(oneDay)).count())
  }

  test("parquet scans receive pushed data filters (min/max + dictionary skipping)") {
    val df = Tables.lineitem(spark, sf).filter(col("l_quantity") < 5.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)]"),
      s"quantity predicate must reach the parquet reader:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"only the projected columns may be read:\n$plan")
  }

  test("salted aggregation ≡ plain aggregation on a skewed key") {
    // skew: synthesize 90% of rows onto one key
    val skewed = Tables.lineitem(spark, sf)
      .withColumn("k", when(col("l_orderkey") % 10 < 9, lit(0L)).otherwise(col("l_orderkey")))
    val plain = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("s"))
    // two-phase salted aggregate: (k, salt) partial → k final.
    // Counts/sums re-aggregate losslessly; the salt bounds any single
    // reducer's share of the hot key to 1/16.
    val salted = skewed
      .withColumn("salt", pmod(col("l_partkey"), lit(16)))
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("l_quantity")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), round(sum(col("ps")), 2).as("s"))
    val a = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b, "salted two-phase aggregation must be lossless")
  }

  test("broadcast-salted join ≡ plain join under skew") {
    // skewed fact joined to a dim: replicate the dim per salt value so
    // the hot key's rows spread over 16 tasks
    val fact = Tables.lineitem(spark, sf)
      .withColumn("k", when(col("l_orderkey") % 10 < 9, lit(1L)).otherwise(col("l_orderkey") % 100))
      .withColumn("salt", pmod(col("l_partkey"), lit(16)))
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val plain = fact.join(dim, "k").groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val dimSalted = dim.crossJoin(
      spark.range(16).select(col("id").cast("int").as("salt")))
    val saltedJoin = fact.join(dimSalted, Seq("k", "salt"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val a = plain.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = saltedJoin.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b, "salted join must preserve join semantics")
  }

  test("write path controls the small-files problem (maxRecordsPerFile + pre-repartition)") {
    // at 100 TB the failure mode is millions of tiny parquet files:
    // one per task per partition-value. The contract: repartition on
    // the partition column before a partitionBy write (one file per
    // value), with maxRecordsPerFile as the upper-bound safety valve.
    val dir = Files.createTempDirectory("graft_smallfiles").toString
    val ev = Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
    ev.repartition(col("day"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 100000)
      .partitionBy("day").parquet(dir)
    val days = new java.io.File(dir).listFiles().filter(_.getName.startsWith("day="))
    assert(days.nonEmpty)
    days.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"${d.getName}: expected exactly one file after clustering, got ${parts.length}")
    }
    // and the write is lossless
    assert(spark.read.parquet(dir).count() === ev.count())
  }

  test("runtime bloom filter prunes the fact side of a selective shuffled join") {
    // The 100 TB lever for non-broadcastable dims: Spark's
    // InjectRuntimeFilter builds a bloom filter from the selective
    // (filtered) side and applies might_contain on the fact scan
    // BEFORE its shuffle — rows that cannot join never enter the
    // exchange. Local data is far below the production thresholds, so
    // the application-side floor is lowered to make the rule fire;
    // the contract proven here is injection + result equivalence.
    val c = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    def joined = {
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "P").select(col("o_orderkey"))
      Tables.lineitem(spark, sf)
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    }
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val withBloom = joined
      val opt = withBloom.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"runtime bloom filter was not injected into the fact side:\n$opt")
      val a = withBloom.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val b = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(a == b, "bloom-pruned join must equal the plain join")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // manual salting (above) is the static fix; AQE skew-join is the
    // runtime fix — prove the engine config actually fires on a
    // pathological key so 100 TB skew has a no-code-change answer
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // ~200k rows all on key 0 vs a uniform right side
      val left = spark.range(200000)
        .select(
          when(col("id") % 50 === 0, col("id")).otherwise(lit(0L)).as("k"),
          col("id").as("payload"))
      val right = spark.range(5000).select(col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // materialize through THIS dataframe's own QueryExecution —
      // count() and even .rdd build separate QueryExecutions and
      // would leave this plan unfinalized (isFinalPlan=false)
      joined.queryExecution.toRdd.count()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed join partition for splitting:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
