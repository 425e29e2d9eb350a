package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.sources.Jdbc

/** The reference's actual transport, end-to-end against embedded Derby
  * (in Spark's jars — no network): pushed-down SQL query read
  * (reference main.py:467-486), predicate pushdown into a JDBC table
  * scan, and the executor-side idempotent upsert sink
  * (main.py:453-457, ON CONFLICT DO NOTHING). The discovery operator
  * itself is source-agnostic: same results from JDBC-backed tables as
  * from Parquet.
  */
class JdbcParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // one in-memory Derby DB per suite run; derby.system.home keeps
  // derby.log out of the repo
  private lazy val url: String = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft_derby").toString)
    val u = "jdbc:derby:memory:graftparity;create=true"
    java.sql.DriverManager.getConnection(u).close()
    u
  }

  private lazy val loaded: Unit = {
    // seed Derby with the discovery inputs via Spark's JDBC writer
    Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      .write.mode(SaveMode.Overwrite).jdbc(url, "customer", new java.util.Properties)
    Tables.nation(spark, sf)
      .select("n_nationkey", "n_name")
      .write.mode(SaveMode.Overwrite).jdbc(url, "nation", new java.util.Properties)
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode(SaveMode.Overwrite).jdbc(url, "orders", new java.util.Properties)
  }

  test("whole-query pushdown: the DB executes the join/filter/order/limit") {
    loaded
    // the reference pushes its discovery work-list SQL to the engine
    // verbatim; Derby executes this text, Spark reads only the result
    val pushed = Jdbc.readQuery(spark, url,
      """SELECT c."c_custkey", c."c_name", n."n_name"
        |FROM customer c LEFT JOIN nation n ON c."c_nationkey" = n."n_nationkey"
        |WHERE c."c_acctbal" < 9000
        |ORDER BY c."c_acctbal" DESC, c."c_custkey"
        |FETCH FIRST 50 ROWS ONLY""".stripMargin)
    val expected = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"), "left")
      .filter(col("c_acctbal") < 9000)
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(50)
      .select("c_custkey", "c_name", "n_name")
    assert(pushed.collect().map(_.toSeq).toSeq ===
      expected.collect().map(_.toSeq).toSeq)
  }

  test("table read pushes predicates into the JDBC scan (PushedFilters)") {
    loaded
    val df = Jdbc.readTable(spark, url, "customer")
      .filter(col("c_acctbal") < 1000)
      .select("c_custkey", "c_acctbal")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.toLowerCase.contains("lessthan"),
      s"JDBC scan must carry the pushed predicate:\n$plan")
    assert(df.count() ===
      Tables.customer(spark, sf).filter(col("c_acctbal") < 1000).count())
  }

  test("discovery over JDBC sources ≡ discovery over Parquet (source-agnostic plan)") {
    loaded
    val cust = Jdbc.readTable(spark, url, "customer")
    val nat = Jdbc.readTable(spark, url, "nation")
    val orders = Jdbc.readTable(spark, url, "orders")
    val already = orders
      .filter(col("o_orderdate") >= lit("1995-06-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(
        array_join(
          transform(slice(sort_array(collect_list(col("o_orderkey"))), 1, 100), _.cast("string")),
          ",").as("exclude_ids"),
        count(lit(1)).as("n_downloaded"))
    val viaJdbc = cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
      .join(already, cust("c_custkey") === already("o_custkey"), "left")
      .filter(col("c_acctbal") < 9000)
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(1100)
      .select(
        col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"),
        col("n_name"), col("exclude_ids"),
        coalesce(col("n_downloaded"), lit(0L)).as("n_downloaded"))
    val viaParquet = Relational.discovery(spark, sf)
    assert(viaJdbc.collect().map(_.toSeq).toSeq ===
      viaParquet.collect().map(_.toSeq).toSeq)
  }

  test("upsert is idempotent: replay publishes nothing, new keys append (ON CONFLICT DO NOTHING)") {
    loaded
    Jdbc.execute(url, Seq(
      """CREATE TABLE images ("image_id" BIGINT NOT NULL PRIMARY KEY,
        |  "body_id" BIGINT, "white_frac" DOUBLE, "name" VARCHAR(64))""".stripMargin))
    import spark.implicits._
    val batch1 = (1L to 300L).map(i => (i, i % 7, i / 300.0, s"img-$i"))
      .toDF("image_id", "body_id", "white_frac", "name")
    Jdbc.upsert(batch1, url, "images", Seq("image_id"))
    val after1 = Jdbc.readTable(spark, url, "images")
    assert(after1.count() === 300)

    // exact replay (crash-and-retry contract): nothing new
    Jdbc.upsert(batch1, url, "images", Seq("image_id"))
    assert(Jdbc.readTable(spark, url, "images").count() === 300)

    // overlapping batch WITH in-batch duplicates: only the 100 new keys land
    val batch2 = ((250L to 400L) ++ (350L to 400L)).map(i => (i, i % 7, i / 300.0, s"img-$i"))
      .toDF("image_id", "body_id", "white_frac", "name")
    Jdbc.upsert(batch2, url, "images", Seq("image_id"), numPartitions = 4)
    val finalRows = Jdbc.readTable(spark, url, "images")
    assert(finalRows.count() === 400)
    // values of pre-existing keys are untouched (do-nothing, not replace)
    assert(finalRows.filter(col("image_id") === 250L).select("name").head().getString(0)
      === "img-250")
  }

  test("streaming incremental upsert: micro-batches land exactly once, overlaps do nothing") {
    loaded
    Jdbc.execute(url, Seq(
      """CREATE TABLE stream_images ("image_id" BIGINT NOT NULL PRIMARY KEY,
        |  "name" VARCHAR(64))""".stripMargin))
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_jdbc_stream").toString
    val q = Jdbc.streamUpsert(
      input.toDF().toDF("image_id", "name"), url, "stream_images", Seq("image_id"), ckpt)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(Jdbc.readTable(spark, url, "stream_images").count() === 2)
      // second batch overlaps the first — only the new key lands
      input.addData((2L, "b-replayed"), (3L, "c"))
      q.processAllAvailable()
      val rows = Jdbc.readTable(spark, url, "stream_images").collect()
        .map(r => r.getAs[Long]("image_id") -> r.getAs[String]("name")).toMap
      assert(rows === Map(1L -> "a", 2L -> "b", 3L -> "c"),
        "overlapping keys must keep their first-write values (do-nothing semantics)")
    } finally q.stop()
  }
}
