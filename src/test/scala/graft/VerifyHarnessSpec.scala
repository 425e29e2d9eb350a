package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The correctness harness's own failure contract (the driver relies
  * on it): a broken query must cost one red row, never the round's
  * oracle_sql.json artifact. */
class VerifyHarnessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("Verify with a bad sfDir fails per-query yet still writes oracle_sql.json") {
    val out = Files.createTempDirectory("graft_verify_bad").toString
    Verify.run(spark, "/nonexistent/sfdir", out)
    val jsonPath = Paths.get(s"$out/oracle_sql.json")
    assert(Files.exists(jsonPath), "oracle_sql.json must be written even when every query fails")
    val json = Files.readString(jsonPath)
    assert(json.trim.startsWith("{") && json.contains("q01_discovery") &&
      json.contains("q48_session_window"))
    // no result parquet can exist for a failed query
    assert(!Files.exists(Paths.get(s"$out/q01_discovery")))
  }

  test("every oracle is wrapped in the canonical total order") {
    assert(Verify.wrapOracle("SELECT 1").contains("ORDER BY ALL NULLS FIRST"))
  }
}
