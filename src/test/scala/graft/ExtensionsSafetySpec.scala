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
}
