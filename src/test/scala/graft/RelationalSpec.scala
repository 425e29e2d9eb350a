package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local(4)
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("discovery: respects filter, top-K ordering, and left-join semantics") {
    val rows = Relational.discovery(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 1100)
    val bals = rows.map(_.getAs[Double]("acctbal"))
    assert(bals.forall(_ < 9000), "area-limit analog filter")
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b }, "largest-first")
  }

  test("discovery exclude_ids is a sorted, comma-joined id list") {
    val r = Relational.discovery(spark, sf).filter(col("exclude_ids").isNotNull).head()
    val ids = r.getAs[String]("exclude_ids").split(",").map(_.toLong)
    assert(ids.sorted.sameElements(ids))
    // the materialized list is capped at 100 (scale guard); the count
    // is always the full group size
    assert(r.getAs[Long]("n_downloaded") == ids.length || ids.length == 100,
      "n_downloaded must equal the number of aggregated exclude ids (unless capped)")
  }

  test("pricing summary groups are complete and averages consistent") {
    val rows = Relational.pricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_qty")
      val sum = r.getAs[Double]("sum_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(avg - sum / n) < 0.01, s"avg_qty ≈ sum/count for $r")
    }
  }

  test("topK returns exactly K descending rows") {
    val rows = Relational.topK(spark, sf).collect()
    assert(rows.length == 100)
    val ps = rows.map(_.getAs[Double]("totalprice"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }

  test("exclude-set membership semantics ≡ left_anti join (SURVEY §5 property)") {
    // The reference filters candidates by membership in an ARRAY_AGG'd
    // exclude list (main.py:415); the engine plans it as left_anti.
    // Both forms must agree.
    val li = Tables.lineitem(spark, sf)
    val excl = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val viaAnti = li.join(excl, li("l_orderkey") === excl("o_orderkey"), "left_anti").count()
    val exclSet = excl.agg(collect_set(col("o_orderkey"))).head().getSeq[Long](0).toSet
    val viaMembership = li.filter(!col("l_orderkey").isin(exclSet.toSeq: _*)).count()
    assert(viaAnti == viaMembership)
  }

  test("one-pass set-op arithmetic ≡ Spark's set operators on seeded random multisets") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    (1 to 3).foreach { round =>
      // overlapping multisets with duplicates — the case distinct-only
      // reasoning gets wrong
      val xs = Seq.fill(300)(rnd.nextInt(40).toLong)
      val ys = Seq.fill(250)(rnd.nextInt(40).toLong + 20)
      val a = xs.toDF("k")
      val b = ys.toDF("k")
      val ops = Map(
        "except_distinct" -> a.except(b).count(),
        "except_all" -> a.exceptAll(b).count(),
        "intersect_distinct" -> a.intersect(b).count(),
        "intersect_all" -> a.intersectAll(b).count(),
        "union_distinct" -> a.union(b).distinct().count(),
        "union_all" -> a.union(b).count())
      val ca = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = ys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keys = ca.keySet ++ cb.keySet
      val arith = Map(
        "except_distinct" -> keys.count(k => ca.getOrElse(k, 0L) > 0 && cb.getOrElse(k, 0L) == 0).toLong,
        "except_all" -> keys.toSeq.map(k => math.max(ca.getOrElse(k, 0L) - cb.getOrElse(k, 0L), 0L)).sum,
        "intersect_distinct" -> keys.count(k => ca.getOrElse(k, 0L) > 0 && cb.getOrElse(k, 0L) > 0).toLong,
        "intersect_all" -> keys.toSeq.map(k => math.min(ca.getOrElse(k, 0L), cb.getOrElse(k, 0L))).sum,
        "union_distinct" -> keys.size.toLong,
        "union_all" -> (xs.size.toLong + ys.size))
      assert(ops == arith, s"round $round: operators=$ops arithmetic=$arith")
    }
  }

  test("latestPerKey yields one row per key, the max-date one") {
    val df = Relational.latestPerKey(spark, sf)
    val n = df.count()
    val nKeys = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    assert(n == nKeys)
  }

  test("anti ∪ semi partition the customer set for the same predicate") {
    val cust = Tables.customer(spark, sf)
    val ord = Tables.orders(spark, sf).filter(col("o_orderstatus") === "P")
    val anti = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti").count()
    val semi = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi").count()
    assert(anti + semi == cust.count())
  }

  test("all declared queries run on sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle coverage: every query has an oracle unless documented sketch-only") {
    // sketches are engine-specific by construction; their accuracy
    // contract lives in SketchSpec instead of a DuckDB oracle
    val oracleExempt = Set("q41_sketch_summary")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- oracleExempt
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val staleExempt = oracleExempt -- SparkEntry.queries.keySet
    assert(staleExempt.isEmpty, s"exempt list names unknown queries: $staleExempt")
  }

  test("discovery plan broadcasts the dim join and plans top-K without global sort") {
    val plan = Relational.discovery(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "nation dim should broadcast")
    assert(plan.contains("TakeOrderedAndProject"), "orderBy+limit should plan as top-K")
  }

  test("q67 skew profile: buckets are true power-of-two ranges, key and row masses conserved") {
    val rows = Relational.skewProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket_pow2")
      val lo = 1L << (b - 1); val hi = (1L << b) - 1
      assert(r.getAs[Long]("min_cnt") >= lo && r.getAs[Long]("max_cnt") <= hi,
        s"bucket $b range [${r.getAs[Long]("min_cnt")},${r.getAs[Long]("max_cnt")}] outside [$lo,$hi]")
    }
    val orders = graft.Tables.orders(spark, sf)
    assert(rows.map(_.getAs[Long]("n_keys")).sum ==
      orders.select(col("o_custkey")).distinct().count())
    assert(rows.map(_.getAs[Long]("rows_covered")).sum == orders.count())
  }
}
