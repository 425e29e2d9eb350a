package graft

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Extended
import graft.plans.{GraftExtensions, IntervalJoinPlan, IntervalJoins}

/** The custom interval-join operator (logical node → strategy → exec):
  * semantics vs the composed declarative join, [start, end) boundary
  * behavior, null handling, self-join safety, and both registration
  * paths (experimental strategies + SparkSessionExtensions). */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def points = {
    import spark.implicits._
    Seq(
      (1L, 100L, 5L), (1L, 101L, 10L), (1L, 102L, 20L),
      (2L, 103L, 10L), (3L, 104L, 7L))
      .toDF("k", "pid", "pt")
  }

  private def intervals = {
    import spark.implicits._
    Seq(
      (1L, 200L, 5L, 10L),   // [5,10): matches pt=5 only
      (1L, 201L, 10L, 15L),  // [10,15): matches pt=10 only
      (1L, 202L, 0L, 100L),  // [0,100): matches 5, 10, 20
      (2L, 203L, 11L, 12L))  // misses pt=10
      .toDF("ik", "iid", "s", "e")
  }

  test("half-open [start, end) boundary semantics on a hand-checked fixture") {
    val got = IntervalJoins.intervalJoin(points, intervals, "k", "ik", "pt", "s", "e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(
      (100L, 200L), (100L, 202L), // pt=5: in [5,10) and [0,100)
      (101L, 201L), (101L, 202L), // pt=10: excluded from [5,10), in [10,15)
      (102L, 202L)))              // pt=20: only [0,100)
  }

  test("null keys and null bounds produce no matches (inner-join equality)") {
    import spark.implicits._
    val p = Seq((Some(1L), 1L, Some(5L)), (None, 2L, Some(5L)), (Some(1L), 3L, None))
      .toDF("k", "pid", "pt")
    val iv = Seq((Some(1L), 10L, Some(0L), Some(9L)), (None, 11L, Some(0L), Some(9L)),
      (Some(1L), 12L, None, Some(9L)))
      .toDF("ik", "iid", "s", "e")
    val got = IntervalJoins.intervalJoin(p, iv, "k", "ik", "pt", "s", "e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("empty interval side yields an empty result") {
    val got = IntervalJoins.intervalJoin(
      points, intervals.filter(col("iid") < 0), "k", "ik", "pt", "s", "e")
    assert(got.count() === 0)
  }

  test("q37 matches the composed join it replaces (self-join of events)") {
    val custom = Extended.intervalJoinQuery(spark, sf)
    val ev = Tables.events(spark, sf)
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("iv_user"), col("event_id").as("iv_id"),
        col("ts").as("iv_start"), (col("ts") + expr("INTERVAL 2 HOURS")).as("iv_end"))
    val composed = ev.filter(col("event_type") =!= "purchase")
      .join(iv, col("user_id") === col("iv_user") &&
        col("ts") >= col("iv_start") && col("ts") < col("iv_end"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("iv_id"))
    assert(custom.count() === composed.count())
    assert(custom.except(composed).count() === 0)
    assert(composed.except(custom).count() === 0)
  }

  test("plan uses IntervalJoinExec — no cartesian, no nested loop, no residual-filter join") {
    val plan = Extended.intervalJoinQuery(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan.take(500))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("typed interval join returns Dataset[(L, R)] and composes with typed ops") {
    import spark.implicits._
    val pts = Seq(Pt(1L, 100L, 5L), Pt(1L, 101L, 10L), Pt(2L, 102L, 3L)).toDS()
    val ivs = Seq(Iv(1L, 200L, 5L, 12L), Iv(2L, 201L, 10L, 20L)).toDS()
    val joined: org.apache.spark.sql.Dataset[(Pt, Iv)] =
      IntervalJoins.intervalJoinTyped(pts, ivs, "k", "ik", "pt", "s", "e")
    val got = joined
      .filter(p => p._1.pt >= 5L) // typed lambda over the pair
      .map(p => (p._1.pid, p._2.iid))
      .collect().toSet
    assert(got === Set((100L, 200L), (101L, 200L)))
  }

  test("downstream groupBy on the interval-side key reuses the join's exchange") {
    // PartitioningCollection advertises both children's clusterings:
    // aggregating on the RIGHT key immediately after the join must not
    // introduce a third Exchange (2 = one per join input)
    val joined = IntervalJoins.intervalJoin(points, intervals, "k", "ik", "pt", "s", "e")
    val agg = joined.groupBy(col("ik")).count()
    val plan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected no extra shuffle for the right-key agg:\n$plan")
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 5L), (2L, 0L)).filter(_._2 > 0)) // iid 200:1,201:1,202:3 → k=1 count 5
  }

  test("property: custom join ≡ composed join on randomized fixtures (dups, skew, empties)") {
    import spark.implicits._
    import org.scalacheck.Gen
    val keyGen = Gen.chooseNum(0L, 6L) // few keys → heavy per-key collision
    val ptGen = Gen.chooseNum(-50L, 50L)
    val pointsGen = Gen.listOfN(120, Gen.zip(keyGen, ptGen))
    val ivGen = Gen.listOfN(80, for {
      k <- keyGen
      s <- ptGen
      len <- Gen.chooseNum(0L, 30L) // zero-length intervals match nothing
    } yield (k, s, s + len))
    (0 until 5).foreach { round =>
      val seedP = org.scalacheck.rng.Seed(42L + round)
      val seedI = org.scalacheck.rng.Seed(1042L + round)
      val pts = pointsGen.apply(Gen.Parameters.default, seedP).get
        .zipWithIndex.map { case ((k, p), i) => (k, i.toLong, p) }
        .toDF("k", "pid", "pt")
      val ivs = ivGen.apply(Gen.Parameters.default, seedI).get
        .zipWithIndex.map { case ((k, s, e), i) => (k, i.toLong, s, e) }
        .toDF("ik", "iid", "s", "e")
      val custom = IntervalJoins.intervalJoin(pts, ivs, "k", "ik", "pt", "s", "e")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val composed = pts.join(ivs,
          col("k") === col("ik") && col("pt") >= col("s") && col("pt") < col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(custom === composed, s"round $round diverged: " +
        s"only-custom=${(custom -- composed).take(5)} only-composed=${(composed -- custom).take(5)}")
    }
  }

  test("hot key beyond the old fail-fast limit completes by SPILLING (soft warning, no error)") {
    import spark.implicits._
    // one key with 3000 intervals; force the spill machinery with tiny
    // thresholds, and set the old hard limit far below the key width —
    // pre-round-4 behavior was IllegalStateException here
    val prevWarn = spark.conf.getOption("spark.graft.intervalJoin.maxBufferRows")
    val prevSpill = spark.conf.getOption("spark.sql.sortMergeJoinExec.buffer.spill.threshold")
    val prevMem = spark.conf.getOption("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.graft.intervalJoin.maxBufferRows", "100")
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "64")
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "32")
    // AQE wraps the exec in query stages, which hides it from a plain
    // plan.collect — turn it off so the spill metric is reachable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ivs = (0 until 3000).map(i => (1L, i.toLong, i.toLong, i.toLong + 10L))
        .toDF("ik", "iid", "s", "e")
      val pts = Seq((1L, 100L, 1500L), (1L, 101L, 0L), (1L, 102L, 3009L))
        .toDF("k", "pid", "pt")
      val joined = IntervalJoins.intervalJoin(pts, ivs, "k", "ik", "pt", "s", "e")
        .select("pid", "iid")
      val got = joined.collect().map(_.getLong(0))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      // pt=1500 ∈ [s, s+10) for s in 1491..1500 → 10 matches;
      // pt=0 matches s=0 only; pt=3009 matches s=3000-1? no: s max 2999,
      // [2999,3009) excludes 3009 → 0 matches and the key drops out
      assert(got === Map(100L -> 10L, 101L -> 1L))
      // and the buffer REALLY spilled (not just stayed under threshold):
      // the exec's spillSize metric must be positive at these thresholds
      val spillBytes = joined.queryExecution.executedPlan.collect {
        case e: graft.plans.IntervalJoinExec => e.metrics("spillSize").value
      }.sum
      assert(spillBytes > 0, s"expected a real spill, spillSize=$spillBytes")
    } finally {
      def restore(k: String, v: Option[String]) =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore("spark.graft.intervalJoin.maxBufferRows", prevWarn)
      restore("spark.sql.sortMergeJoinExec.buffer.spill.threshold", prevSpill)
      restore("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", prevMem)
      restore("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("spilled buffer produces identical results to the composed join") {
    import spark.implicits._
    val prevSpill = spark.conf.getOption("spark.sql.sortMergeJoinExec.buffer.spill.threshold")
    val prevMem = spark.conf.getOption("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold")
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "64")
    spark.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "32")
    try {
      val rnd = new scala.util.Random(7)
      val ivs = (0 until 800).map(i =>
        (rnd.nextInt(3).toLong, i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong + 50L))
        .toDF("ik", "iid", "s", "e")
      val pts = (0 until 200).map(i =>
        (rnd.nextInt(3).toLong, (1000 + i).toLong, rnd.nextInt(200).toLong))
        .toDF("k", "pid", "pt")
      val custom = IntervalJoins.intervalJoin(pts, ivs, "k", "ik", "pt", "s", "e")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val composed = pts.join(ivs,
          col("k") === col("ik") && col("pt") >= col("s") && col("pt") < col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(custom === composed)
    } finally {
      def restore(k: String, v: Option[String]) =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore("spark.sql.sortMergeJoinExec.buffer.spill.threshold", prevSpill)
      restore("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", prevMem)
    }
  }

  test("SparkSessionExtensions registration path plans the operator") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extSession = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import extSession.implicits._
      val p = Seq((1L, 1L, 5L)).toDF("k", "pid", "pt")
      val iv = Seq((1L, 9L, 0L, 9L)).toDF("ik", "iid", "s", "e")
      // build the logical node directly — no IntervalJoins.register, so
      // only the injected extension can plan it
      def a(df: DataFrame, n: String) = df.queryExecution.analyzed.output.find(_.name == n).get
      val df = GraftSqlBridge.ofRows(extSession, IntervalJoinPlan(
        p.queryExecution.analyzed, iv.queryExecution.analyzed,
        a(p, "k"), a(iv, "ik"), a(p, "pt"), a(iv, "s"), a(iv, "e")))
      assert(df.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      assert(df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === Set((1L, 9L)))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}

case class Pt(k: Long, pid: Long, pt: Long)
case class Iv(ik: Long, iid: Long, s: Long, e: Long)
