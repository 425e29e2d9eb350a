package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-first access to the DSv2 tables through a V2 catalog plugin.
  *
  * NOTE Spark caches the catalog INSTANCE at first use — later
  * changes to spark.sql.catalog.* confs do not re-initialize it — so
  * the suite configures one catalog+warehouse up front and every
  * test shares it. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    spark.conf.set("spark.sql.catalog.graft_test", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_test.warehouse", wh)
    wh
  }

  test("the generated image catalog is queryable from plain SQL with pushdown") {
    warehouse
    val n = spark.sql(
      "SELECT count(*) AS n FROM graft_test.db.image_catalog WHERE dataset = 'S2A'")
      .head().getLong(0)
    val expected = (0L until 10000L).count(i =>
      graft.sources.ImageCatalogSource.field(i, "dataset").toString == "S2A")
    assert(n === expected)
  }

  test("CREATE TABLE AS SELECT writes a manifest table readable by name and by path") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE graft_test.db.curated AS SELECT * FROM ctas_src")
    // by catalog name
    val byName = spark.sql("SELECT id FROM graft_test.db.curated")
      .collect().map(_.getLong(0)).sorted
    assert(byName.toSeq === Seq(1L, 2L))
    // the same data through the raw format path (same warehouse)
    val byPath = spark.read.format("graft.sources.ManifestSink")
      .option("path", s"$warehouse/db/curated").load()
    assert(byPath.count() === 2)
    // and it shows up in SHOW TABLES
    val tables = spark.sql("SHOW TABLES IN graft_test.db")
      .collect().map(_.getString(1)).toSet
    assert(tables.contains("curated") && tables.contains("image_catalog"))
    spark.sql("DROP TABLE graft_test.db.curated")
    assert(!spark.sql("SHOW TABLES IN graft_test.db")
      .collect().map(_.getString(1)).contains("curated"))
  }

  test("INSERT INTO appends a new manifest commit") {
    import spark.implicits._
    warehouse
    Seq((1L, "a")).toDF("id", "s").createOrReplaceTempView("ins_src")
    spark.sql("CREATE TABLE graft_test.db.appendable AS SELECT * FROM ins_src")
    spark.sql("INSERT INTO graft_test.db.appendable SELECT 2L AS id, 'b' AS s")
    val got = spark.sql("SELECT id FROM graft_test.db.appendable")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("SQL VERSION AS OF time-travels to any commit; the pin beats reader options") {
    import spark.implicits._
    warehouse
    Seq((1L, "a")).toDF("id", "s").createOrReplaceTempView("tt_src")
    spark.sql("CREATE TABLE graft_test.db.versioned AS SELECT * FROM tt_src")
    spark.sql("INSERT INTO graft_test.db.versioned SELECT 2L AS id, 'b' AS s")
    spark.sql("INSERT INTO graft_test.db.versioned SELECT 3L AS id, 'c' AS s")
    def idsAt(v: Int): Seq[Long] = spark.sql(
      s"SELECT id FROM graft_test.db.versioned VERSION AS OF $v")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(idsAt(1) === Seq(1L))
    assert(idsAt(2) === Seq(1L, 2L))
    assert(idsAt(3) === Seq(1L, 2L, 3L))
    // latest (no version) still sees everything
    assert(spark.sql("SELECT count(*) FROM graft_test.db.versioned")
      .head().getLong(0) === 3L)
    // a non-numeric version is a clear error, not a silent full read
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_test.db.versioned VERSION AS OF 'nope'").collect()
    }
    assert(err.getMessage.contains("logical commit counts"))
    spark.sql("DROP TABLE graft_test.db.versioned")
  }

  test("SQL DELETE: copy-on-write swap keeps survivors, versions, and later appends working") {
    import spark.implicits._
    warehouse
    Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("id", "s")
      .createOrReplaceTempView("del_src")
    spark.sql("CREATE TABLE graft_test.db.deltest AS SELECT * FROM del_src")
    spark.sql("INSERT INTO graft_test.db.deltest SELECT 4L AS id, 'drop' AS s")

    spark.sql("DELETE FROM graft_test.db.deltest WHERE s = 'drop'")
    val after = spark.sql("SELECT id FROM graft_test.db.deltest")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after === Seq(1L, 3L), s"survivors only, got $after")

    // the delete is one more logical commit; the new version is the
    // post-delete snapshot (earlier versions were absorbed — the
    // compaction/snapshot-expiry contract)
    val root = new java.io.File(s"$warehouse/db/deltest")
    assert(graft.sources.ManifestSink.logicalCount(root) === 3)
    val v3 = spark.sql("SELECT id FROM graft_test.db.deltest VERSION AS OF 3")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(v3 === Seq(1L, 3L))

    // the table stays fully writable after the swap
    spark.sql("INSERT INTO graft_test.db.deltest SELECT 5L AS id, 'new' AS s")
    assert(spark.sql("SELECT count(*) FROM graft_test.db.deltest")
      .head().getLong(0) === 3L)

    // delete-everything leaves an empty but intact table
    spark.sql("DELETE FROM graft_test.db.deltest WHERE id > 0")
    assert(spark.sql("SELECT count(*) FROM graft_test.db.deltest")
      .head().getLong(0) === 0L)
    spark.sql("INSERT INTO graft_test.db.deltest SELECT 6L AS id, 'again' AS s")
    assert(spark.sql("SELECT id FROM graft_test.db.deltest")
      .collect().map(_.getLong(0)).toSeq === Seq(6L))
    spark.sql("DROP TABLE graft_test.db.deltest")
  }

  test("SQL DELETE under three-valued logic: NULL-predicate rows survive") {
    import spark.implicits._
    warehouse
    // s IS NULL rows arise naturally in this sink (all-nullable
    // schemas, evolution null-padding); DELETE must remove only rows
    // where the predicate is TRUE — NULL is not TRUE
    Seq((1L, Some("drop")), (2L, Some("keep")), (3L, None), (4L, None))
      .toDF("id", "s").createOrReplaceTempView("nulldel_src")
    spark.sql("CREATE TABLE graft_test.db.nulldel AS SELECT * FROM nulldel_src")

    // direct single-filter path (no analyzer-added IsNotNull guard):
    // `s = 'drop'` evaluates to NULL on rows 3/4 — they must survive
    graft.sources.ManifestDelete.run(s"$warehouse/db/nulldel",
      Array(org.apache.spark.sql.sources.EqualTo("s", "drop")))
    val after = spark.sql("SELECT id FROM graft_test.db.nulldel")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after === Seq(2L, 3L, 4L),
      s"rows with NULL predicate must survive the delete, got $after")

    // and the explicit IS NULL form deletes exactly those rows
    spark.sql("DELETE FROM graft_test.db.nulldel WHERE s IS NULL")
    assert(spark.sql("SELECT id FROM graft_test.db.nulldel")
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    spark.sql("DROP TABLE graft_test.db.nulldel")
  }

  test("FunctionCatalog: graft kernels callable from pure SQL delegate to the same expressions") {
    import org.apache.spark.sql.functions.{col, lit}
    warehouse
    // catalog functions answer from SQL with no temp registration
    assert(spark.sql("SELECT graft_test.db.dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) === 11.0)
    // one kernel, two entry points: SQL catalog call ≡ Column API
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    docs.createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_test.db.polyhash(text) AS h FROM fn_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaColumn = docs.select(col("doc_id"),
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.PolyHash(org.apache.spark.sql.GraftSqlBridge.expression(col("text")))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaColumn, "catalog function must equal the Column-API kernel")
    // z_value from SQL matches the ZOrder helper
    assert(spark.sql("SELECT graft_test.db.z_value(5L, 3L) AS z").head().getLong(0) ===
      spark.range(1).select(graft.functions.ZOrder.zValue(lit(5L), lit(3L), 21)).head().getLong(0))
    // the dHash kernels (r8): SQL catalog call ≡ Column API / driver replay
    val emb = spark.sql(
      "SELECT graft_test.db.vec_dhash(array_repeat(CAST(0.5 AS FLOAT), 64), 0L) AS h")
      .head().getLong(0)
    val embCol = spark.range(1)
      .select(org.apache.spark.sql.functions.expr(
        "array_repeat(CAST(0.5 AS FLOAT), 64)").as("e"))
      .select(graft.functions.ImageHash.vecDhash(col("e"), lit(0L), 0))
      .head().getLong(0)
    assert(emb === embCol, "vec_dhash catalog call must equal the Column kernel")
    val cube = Seq.tabulate(3, 7, 9)((c, y, x) => c + y * 31 + x * 11)
    import spark.implicits._
    Seq(Tuple1(cube)).toDF("px").createOrReplaceTempView("fn_px")
    assert(spark.sql("SELECT graft_test.db.pixel_dhash(px) AS h FROM fn_px")
      .head().getLong(0) === graft.functions.ImageHash.pixelDhashSeq(cube))
    // unknown function is a typed miss, and SHOW FUNCTIONS lists the kernels
    val err = intercept[Exception] {
      spark.sql("SELECT graft_test.db.nope(1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("nope"))
  }

  test("SQL TRUNCATE TABLE empties in one swap; keyed upsert merges like the reference's Postgres sink") {
    import spark.implicits._
    warehouse
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").createOrReplaceTempView("trunc_src")
    spark.sql("CREATE TABLE graft_test.db.merged AS SELECT * FROM trunc_src")
    val path = s"$warehouse/db/merged"

    // upsert: id=2 updated, id=3 inserted, id=1 untouched
    graft.sources.ManifestUpsert.upsert(path,
      Seq((2L, "B2"), (3L, "c")).toDF("id", "s"), Seq("id"))
    def state(): Map[Long, String] = spark.read
      .format("graft.sources.ManifestSink").option("path", path).load()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state() === Map(1L -> "a", 2L -> "B2", 3L -> "c"))

    // replaying the SAME batch is state-idempotent (the reference's
    // on-conflict-update contract under retry)
    graft.sources.ManifestUpsert.upsert(path,
      Seq((2L, "B2"), (3L, "c")).toDF("id", "s"), Seq("id"))
    assert(state() === Map(1L -> "a", 2L -> "B2", 3L -> "c"))

    spark.sql("TRUNCATE TABLE graft_test.db.merged")
    assert(spark.sql("SELECT count(*) FROM graft_test.db.merged")
      .head().getLong(0) === 0L)
    // upsert into the truncated table re-seeds it
    graft.sources.ManifestUpsert.upsert(path,
      Seq((9L, "z")).toDF("id", "s"), Seq("id"))
    assert(state() === Map(9L -> "z"))
    spark.sql("DROP TABLE graft_test.db.merged")
  }
}
