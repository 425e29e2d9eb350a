package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Extended

/** The approximate/sketch surface — at 100 TB, exact distinct counts
  * and exact percentiles are shuffle-bound (q34 documents exact
  * percentile as the verified-but-expensive form); HLL++ and
  * approx_percentile are the scale path: single-pass, mergeable
  * partial state, bounded memory. Sketches are nondeterministic
  * across engines, so they are accuracy-tested against the exact
  * answer here rather than DuckDB-oracled. */
class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) is within its rsd bound of exact") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    // default rsd = 0.05; 4 sigma ≈ 20% gives a non-flaky bound while
    // still catching a broken sketch (typical observed error ~1-2%)
    val approx = ev.select(approx_count_distinct(col("user_id"))).head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.20, s"exact=$exact approx=$approx relErr=$relErr")
    // tighter rsd tightens the estimate
    val fine = ev.select(approx_count_distinct(col("user_id"), 0.01)).head().getLong(0)
    val fineErr = math.abs(fine - exact).toDouble / exact
    assert(fineErr < 0.05, s"exact=$exact fine=$fine relErr=$fineErr")
  }

  test("approx_count_distinct partials merge: grouped sketch sums ≈ global") {
    val ev = Tables.events(spark, sf)
    // per-type sketches, then the same sketch globally — the global
    // pass must be consistent with the exact global count even though
    // it merges partial HLL registers across partitions
    val global = ev.select(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(global - exact).toDouble / exact < 0.10)
  }

  test("approx_percentile tracks exact percentile within accuracy bound") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(
      expr("percentile(value, 0.5)"), expr("percentile(value, 0.9)"))
      .head()
    val approx = ev.select(
      expr("approx_percentile(value, 0.5, 10000)"),
      expr("approx_percentile(value, 0.9, 10000)"))
      .head()
    val spread = ev.select(max(col("value")) - min(col("value"))).head().getDouble(0)
    assert(math.abs(approx.getDouble(0) - exact.getDouble(0)) < 0.02 * spread,
      s"p50 exact=${exact.getDouble(0)} approx=${approx.getDouble(0)}")
    assert(math.abs(approx.getDouble(1) - exact.getDouble(1)) < 0.02 * spread,
      s"p90 exact=${exact.getDouble(1)} approx=${approx.getDouble(1)}")
  }

  test("DataSketches HLL: stored base sketch + delta sketch union == full-table sketch (incremental distinct)") {
    // the q76 property for DISTINCT counts — impossible with plain
    // counts, exact-by-construction with mergeable sketches: the
    // materialized base sketch never needs rescanning, only a union
    // with the delta's sketch. Register updates are max() per slot, so
    // the union is order-insensitive and the merged ESTIMATE equals
    // the full-table estimate exactly, not approximately.
    val ev = Tables.events(spark, sf).withColumn("sec", Tables.epochSec(col("ts")))
    val cutoff = 1705276800L
    def sketch(pred: org.apache.spark.sql.Column) = ev.filter(pred)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = sketch(col("sec") < cutoff)
      .unionByName(sketch(col("sec") >= cutoff))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = ev.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == full,
      s"sketch union must be exact w.r.t. the full-table sketch: $merged vs $full")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val relErr = math.abs(merged(t) - n).toDouble / n
      assert(relErr < 0.05, s"$t: estimate ${merged(t)} vs exact $n (relErr $relErr)")
    }
  }

  test("frequent-items sketch (freqItems) captures every true heavy hitter") {
    // Misra-Gries-style sketch: single pass, bounded memory — the
    // scale path for "which keys dominate" when exact top-k would
    // shuffle the full key set. Guarantee is one-sided (no false
    // negatives above the support threshold); we assert exactly that.
    val ev = Tables.events(spark, sf)
    val support = 0.15
    val found = ev.select(col("event_type")).stat.freqItems(Seq("event_type"), support)
      .head().getSeq[String](0).toSet
    val total = ev.count()
    val trueHeavy = ev.groupBy(col("event_type")).count()
      .filter(col("count") > total * support)
      .collect().map(_.getString(0)).toSet
    assert(trueHeavy.subsetOf(found),
      s"sketch missed true heavy hitters: ${trueHeavy -- found}")
    assert(trueHeavy.nonEmpty, "fixture must have heavy hitters at this support")
  }

  test("q41 sketch summary returns one row per event_type with sane bounds") {
    val rows = Extended.sketchSummary(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val nd = r.getAs[Long]("approx_users")
      assert(nd > 0 && nd <= n, s"${r.getString(0)}: approx_users=$nd n=$n")
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
    }
  }
}
