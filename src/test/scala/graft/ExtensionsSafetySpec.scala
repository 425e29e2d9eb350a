package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** Deployment-safety proof for the optimizer extensions: every
  * declared query must return IDENTICAL results on a session with
  * GraftExtensions installed (planner strategy + range-join rewrite
  * rule) as on the plain session. This is what makes the rule safe to
  * ship cluster-wide via spark.sql.extensions: it may only ever swap
  * the physical operator, never change a result — across the whole
  * operator surface, not just the queries written with it in mind. */
class ExtensionsSafetySpec extends AnyFunSuite {
  lazy val plain: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // q41 is sketch-based (engine-deterministic but memory-layout
  // sensitive across sessions is not a concern — HLL is deterministic
  // for identical input partitioning; keep it in and see)
  test("ALL declared queries produce identical results under GraftExtensions") {
    // canonical form on the plain session first (shared cache warm)
    val expected = SparkEntry.queries.map { case (name, fn) =>
      name -> canonical(fn(plain, sf).collect())
    }
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val diffs = SparkEntry.queries.flatMap { case (name, fn) =>
        val got = canonical(fn(ext, sf).collect())
        if (got != expected(name))
          Some(s"$name: ${got.size} vs ${expected(name).size} rows or content diff")
        else None
      }
      assert(diffs.isEmpty, s"queries diverged under extensions:\n${diffs.mkString("\n")}")
    } finally {
      SparkSession.setDefaultSession(plain)
      SparkSession.setActiveSession(plain)
    }
  }

  private def canonical(rows: Array[org.apache.spark.sql.Row]): Map[String, Int] =
    rows.map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("parser extension: GRAFT OPTIMIZE/VACUUM are first-class SQL; stock SQL untouched") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val wh = java.nio.file.Files.createTempDirectory("graft_sqlx_wh").toString
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft_sqlx", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft_sqlx.warehouse", wh)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import ext.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_sql_opt").toString
      (0 until 4).foreach { i =>
        Seq((i.toLong, s"v$i")).toDF("id", "s")
          .write.format("graft.sources.ManifestSink")
          .option("path", dir).mode("append").save()
      }
      // custom maintenance syntax, parsed by the injected parser
      ext.sql(s"GRAFT OPTIMIZE '$dir' FILES 1")
      val live = graft.sources.ManifestSink.filesOf(
        graft.sources.ManifestSink.sortedManifests(new java.io.File(dir)))
      assert(live.size == 1, "OPTIMIZE must bin-pack to one file")
      // default retention (1 h) protects the just-written micro-files;
      // RETAIN 0 HOURS is the explicit maintenance-window override
      assert(ext.sql(s"GRAFT VACUUM '$dir'").head().getLong(0) == 0L)
      val reclaimed = ext.sql(s"GRAFT VACUUM '$dir' RETAIN 0 HOURS").head().getLong(0)
      assert(reclaimed == 4L, s"VACUUM must report the 4 reclaimed micro-files, got $reclaimed")
      assert(ext.read.format("graft.sources.ManifestSink").option("path", dir)
        .load().count() == 4L, "contents untouched by maintenance")
      // the injected session-wide function (third registration tier)
      val viaSql = ext.sql("SELECT graft_polyhash('abc') AS h").head().getLong(0)
      val viaCol = Seq("abc").toDF("s").select(
        org.apache.spark.sql.GraftSqlBridge.column(graft.functions.PolyHash(
          org.apache.spark.sql.GraftSqlBridge.expression(org.apache.spark.sql.functions.col("s")))))
        .head().getLong(0)
      assert(viaSql == viaCol, "injected SQL function must equal the Column kernel")
      // arity is validated at analysis time: zero args must not throw a
      // raw NoSuchElementException, extra args must not be silently
      // dropped (graft_polyhash('a','b') computing polyhash('a') would
      // be a wrong answer that LOOKS right)
      val arity0 = intercept[Exception](ext.sql("SELECT graft_polyhash()").collect())
      assert(!arity0.isInstanceOf[NoSuchElementException] &&
        arity0.getMessage.contains("graft_polyhash"), s"got: $arity0")
      val arity2 = intercept[Exception](
        ext.sql("SELECT graft_polyhash('a', 'b')").collect())
      assert(arity2.getMessage.contains("graft_polyhash"), s"got: $arity2")
      // GRAFT MERGE INTO: keyed upsert as SQL, inline-SELECT source,
      // returns the new logical version; replay is state-idempotent
      val mdir = java.nio.file.Files.createTempDirectory("graft_sql_merge").toString
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")
        .write.format("graft.sources.ManifestSink")
        .option("path", mdir).mode("append").save()
      val v1 = ext.sql(
        s"GRAFT MERGE INTO '$mdir' USING (SELECT 2L AS id, 'B2' AS s UNION ALL SELECT 3L, 'c') KEY (id)")
        .head().getLong(0)
      assert(v1 == 2L, s"merge must be the table's second logical commit, got $v1")
      def rowsOf() = ext.read.format("graft.sources.ManifestSink").option("path", mdir)
        .load().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rowsOf() == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
      // a named temp view works as the source too
      Seq((3L, "C3")).toDF("id", "s").createOrReplaceTempView("merge_src")
      ext.sql(s"GRAFT MERGE INTO '$mdir' USING merge_src KEY (id)")
      assert(rowsOf() == Map(1L -> "a", 2L -> "B2", 3L -> "C3"))
      // ADVICE r07: a top-level parenthesized-UNION source starts with
      // '(' and ends with ')' but the outer parens do NOT match — a
      // naive first/last strip made it unbalanced SQL
      ext.sql(s"GRAFT MERGE INTO '$mdir' USING " +
        "(SELECT 4L AS id, 'd' AS s) UNION ALL (SELECT 5L, 'e') KEY (id)")
      assert(rowsOf() == Map(1L -> "a", 2L -> "B2", 3L -> "C3", 4L -> "d", 5L -> "e"))
      // the catalog-identifier target form: resolved through the
      // session CatalogManager to the manifest table's path
      Seq((1L, "x"), (2L, "y")).toDF("id", "s").createOrReplaceTempView("cat_seed")
      ext.sql("CREATE TABLE graft_sqlx.db.mergetgt AS SELECT * FROM cat_seed")
      val v2 = ext.sql(
        "GRAFT MERGE INTO graft_sqlx.db.mergetgt USING (SELECT 2L AS id, 'Y2' AS s) KEY (id)")
        .head().getLong(0)
      assert(v2 == 2L, s"catalog-form merge must advance the version, got $v2")
      assert(ext.sql("SELECT s FROM graft_sqlx.db.mergetgt WHERE id = 2").head().getString(0) == "Y2")
      assert(ext.sql("SELECT count(*) FROM graft_sqlx.db.mergetgt").head().getLong(0) == 2L)
      // OPTIMIZE/VACUUM take the catalog-identifier form too (resolved
      // through the same CatalogManager path as MERGE): the merge
      // above left CTAS + COW files — compact then reclaim by NAME
      ext.sql("GRAFT OPTIMIZE graft_sqlx.db.mergetgt FILES 1")
      val reclaimedByName = ext.sql(
        "GRAFT VACUUM graft_sqlx.db.mergetgt RETAIN 0 HOURS").head().getLong(0)
      assert(reclaimedByName >= 1L,
        s"identifier-form VACUUM must reclaim the pre-optimize files, got $reclaimedByName")
      assert(ext.sql("SELECT count(*) FROM graft_sqlx.db.mergetgt").head().getLong(0) == 2L,
        "contents untouched by identifier-form maintenance")
      // GRAFT OPTIMIZE ... ZORDER BY (x, y): the rewrite lands through
      // the same optimistic manifest swap, and the new files are
      // 2-D-clustered — footer min/max boxes prune a box predicate
      // where the pre-optimize layout could not
      val zdir = java.nio.file.Files.createTempDirectory("graft_sql_zorder").toString
      val bits = 7
      val zc = org.apache.spark.sql.functions.col _
      ext.range(1L << (2 * bits)).toDF("id")
        .select((zc("id") % 128).as("x"), (zc("id") / 128).cast("long").as("y"))
        .repartitionByRange(8, zc("x")) // linear-by-x micro-files: no y-skipping
        .write.format("graft.sources.ManifestSink").option("path", zdir)
        .mode("append").save()
      val preCount = ext.read.format("graft.sources.ManifestSink")
        .option("path", zdir).load().count()
      ext.sql(s"GRAFT OPTIMIZE '$zdir' FILES 16 ZORDER BY (x, y)")
      val zroot = new java.io.File(zdir)
      assert(graft.sources.ManifestSink.logicalCount(zroot) == 2,
        "ZORDER optimize must land as one more logical commit via the swap")
      val zlive = graft.sources.ManifestSink.filesOf(
        graft.sources.ManifestSink.sortedManifests(zroot))
      assert(zlive.size == 16 && zlive.forall(_.startsWith("opt-")),
        s"16 z-clustered files must replace the linear layout, got $zlive")
      // file-skipping decision, computed from the same per-file
      // min/max a format's stats would carry (the ZOrderSpec
      // assertion, now through SQL + manifest swap; the sink's data
      // files are TSV, so the boxes are computed directly)
      val boxes = zlive.map { f =>
        import scala.jdk.CollectionConverters._
        val cells = java.nio.file.Files
          .readAllLines(new java.io.File(zroot, f).toPath).asScala
          .map(_.split("\t")).map(a => (a(0).toLong, a(1).toLong))
        (cells.map(_._1).min, cells.map(_._1).max,
          cells.map(_._2).min, cells.map(_._2).max)
      }
      def hits(x0: Long, x1: Long, y0: Long, y1: Long): Int =
        boxes.count { case (mnx, mxx, mny, mxy) =>
          mxx >= x0 && mnx <= x1 && mxy >= y0 && mny <= y1 }
      assert(hits(0, 127, 96, 103) * 2 <= 16,
        s"a y-slab must prune to a minority of z-files, hit ${hits(0, 127, 96, 103)}/16")
      assert(hits(32, 39, 96, 103) <= 4,
        s"an 8x8 box must hit <=4 z-files, hit ${hits(32, 39, 96, 103)}")
      // lossless: same rows, one logical commit later
      assert(ext.read.format("graft.sources.ManifestSink").option("path", zdir)
        .load().count() == preCount)
      // stock SQL delegates through unchanged
      assert(ext.sql("SELECT 1 + 1").head().getInt(0) == 2)
      val err = intercept[Exception](ext.sql("GRAFTX NONSENSE"))
      assert(err.getMessage.toLowerCase.contains("syntax") ||
        err.getMessage.contains("GRAFTX"), "non-matching text must fail in the DELEGATE parser")
    } finally {
      SparkSession.setDefaultSession(plain)
      SparkSession.setActiveSession(plain)
    }
  }
}
