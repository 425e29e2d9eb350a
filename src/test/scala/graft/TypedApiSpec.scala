package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PixelOps, PixelStatsAgg}

/** Typed Dataset API surface: the corpus-level Aggregator vs the
  * per-image expression, and approximate sketches vs exact answers
  * (§2.7 "HLL/approx" row — approximations can't hash-match a
  * different engine's sketch, so they are tolerance-tested here). */
class TypedApiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("PixelStatsAgg over many cubes ≡ pixel-weighted merge of per-image ImageStats") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cubes = Seq.fill(40)(Seq.fill(3)(Seq.fill(4)(Seq.fill(4)(
      if (rnd.nextInt(5) == 0) 0 else rnd.nextInt(256))))
      .map(_.map(_.toSeq).toSeq).toSeq)
    val ds = cubes.toDS()
    val agg = ds.select(PixelStatsAgg.toColumn).head()

    // independent oracle: per-image stats (ImageStats expression)
    // recombined with nonzero-count weights
    val df = cubes.zipWithIndex.map { case (c, i) => (i, c) }.toDF("id", "pixels")
    val per = df.select(
        PixelOps.imageStats(col("pixels")).as("s"),
        expr("size(filter(flatten(element_at(pixels,1)), x -> x != 0))").as("nr"),
        expr("size(filter(flatten(element_at(pixels,2)), x -> x != 0))").as("ng"),
        expr("size(filter(flatten(element_at(pixels,3)), x -> x != 0))").as("nb"))
      .collect()
    def weighted(get: org.apache.spark.sql.Row => (Any, Int)): Option[Double] = {
      val pairs = per.flatMap { r =>
        val (v, n) = get(r)
        if (v == null || n == 0) None else Some((v.asInstanceOf[Double], n))
      }
      if (pairs.isEmpty) None
      else Some(pairs.map { case (v, n) => v * n }.sum / pairs.map(_._2).sum)
    }
    val expR = weighted(r => (r.getStruct(0).get(0), r.getInt(1)))
    assert(math.abs(agg.redAverage.get - expR.get) < 1e-9,
      s"corpus red mean ${agg.redAverage} vs weighted ${expR}")
    assert(agg.inBoundsPixels > 0)
    assert(agg.whiteFraction.exists(f => f >= 0 && f <= 1))
  }

  test("aggregator is merge-associative: one partition ≡ many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cubes = Seq.fill(30)(Seq.fill(3)(Seq.fill(3)(Seq.fill(3)(rnd.nextInt(256))))
      .map(_.map(_.toSeq).toSeq).toSeq)
    val one = cubes.toDS().repartition(1).select(PixelStatsAgg.toColumn).head()
    val many = cubes.toDS().repartition(8).select(PixelStatsAgg.toColumn).head()
    assert(one == many, "partial-buffer merge must be order-insensitive (integer sums)")
  }

  test("approx_count_distinct within 5% of exact; approx_percentile near exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_orderkey"), 0.01)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL estimate (rsd 1%) $approx vs exact $exact")
    val pExact = li.agg(expr("percentile(l_quantity, 0.5)")).head().getDouble(0)
    val pApprox = li.agg(expr("approx_percentile(l_quantity, 0.5, 1000)")).head().getDouble(0)
    assert(math.abs(pApprox - pExact) <= 2.0,
      s"approx median $pApprox vs exact $pExact")
  }
}
