package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Extended}

/** Semantic contracts for the round-6 ETL/feature operators
  * (q69–q74): each assertion recomputes the property from the raw
  * fixture on the driver, so a planner or window regression fails
  * loudly rather than only flipping the oracle hash. */
class EtlOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private lazy val rawEvents: Array[(Long, Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), Tables.epochSec(col("ts")),
        col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))

  test("q69 cdcApply: latest op per key wins, tombstones delete the key") {
    val got = Extended.cdcApply(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("last_op"), r.getAs[Long]("last_sec"), r.getAs[Long]("last_cents"))))
      .toMap
    val latest = rawEvents.groupBy(_._2).map { case (u, evs) =>
      u -> evs.maxBy(e => (e._3, e._1))
    }
    val expected = latest.filter(_._2._4 != "error")
      .map { case (u, e) => u -> ((e._4, e._3, e._5)) }
    assert(got == expected, "applied state must be exactly the non-tombstoned latest ops")
    // the fixture must actually exercise the tombstone path
    assert(latest.exists(_._2._4 == "error"), "fixture has no tombstoned user — test is vacuous")
    latest.filter(_._2._4 == "error").keys.foreach(u =>
      assert(!got.contains(u), s"tombstoned user $u leaked into the applied state"))
  }

  test("q70 scd2Build: versions are 1..n, intervals chain, exactly one current row per key") {
    val rows = Extended.scd2Build(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("ver"))
      assert(sorted.map(_.getAs[Int]("ver")).toSeq == (1 to rs.length),
        s"user $u: version numbers must be dense 1..n")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_sec") == b.getAs[Long]("valid_from_sec"),
            s"user $u: interval chain broken at ver ${a.getAs[Int]("ver")}")
        case _ =>
      }
      assert(sorted.count(_.getAs[Int]("is_current") == 1) == 1,
        s"user $u: exactly one current version")
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_sec")),
        s"user $u: the current version must be open-ended")
    }
    val purchases = rawEvents.count(_._4 == "purchase")
    assert(rows.length == purchases, "every purchase event opens exactly one version")
  }

  test("q71 gapFill: dense per-user day grid, zero-filled gaps, forward-filled totals") {
    val rows = Extended.gapFill(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    val daily = rawEvents.groupBy(e => (e._2, e._3 / 86400))
      .map { case (k, es) => k -> es.map(_._5).sum }
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day"))
      val days = sorted.map(_.getAs[Long]("day"))
      assert(days.toSeq == (days.head to days.last).toSeq, s"user $u: day grid must be dense")
      var lastSeen = Long.MinValue
      sorted.foreach { r =>
        val day = r.getAs[Long]("day")
        val isGap = r.getAs[Int]("is_gap") == 1
        daily.get((u, day)) match {
          case Some(cents) =>
            assert(!isGap && r.getAs[Long]("day_cents") == cents,
              s"user $u day $day: observed total mismatch")
            lastSeen = cents
          case None =>
            assert(isGap && r.getAs[Long]("n_events") == 0 && r.getAs[Long]("day_cents") == 0,
              s"user $u day $day: gap row must be zero-filled")
        }
        assert(r.getAs[Long]("filled_cents") == lastSeen,
          s"user $u day $day: forward-fill must carry the last observed total")
      }
    }
  }

  test("q72 fuzzyMatch: equals the brute-force within-block edit-distance join") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sf).select(col("p_name")).distinct()
      .collect().map(_.getString(0))
    val expected = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last
      d = lev(a, b) if d <= Dedup.FuzzyMaxDist
    } yield (a, b, d)).toSet
    val got = Dedup.fuzzyMatch(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == expected, "blocked join must equal brute force within blocks")
    assert(got.nonEmpty, "fixture yields no fuzzy pairs — test is vacuous")
  }

  test("q80 snmMatch: equals the brute-force sorted-window scan; complements blocking") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sf).select(col("p_name")).distinct()
      .collect().map(_.getString(0)).sorted
    val expected = (for {
      i <- names.indices; k <- 1 to Dedup.SnmWindow if i + k < names.length
      d = lev(names(i), names(i + k)) if d <= Dedup.FuzzyMaxDist
    } yield (names(i), names(i + k), d)).toSet
    val got = Dedup.snmMatch(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == expected, "SNM must equal the sorted sliding-window scan")
    assert(got.nonEmpty, "fixture yields no SNM pairs — test is vacuous")
  }

  test("q80 parallel SNM: overlap/rank form == global-sort form on a vocabulary spanning partition boundaries") {
    import spark.implicits._
    // a vocabulary large enough that every range partition holds a
    // contiguous slice and W=3 successors cross boundaries everywhere;
    // near-identical stems make many pairs pass the edit-distance gate
    val vocab = (0 until 400).map(i => f"name${i / 4}%03d v${i % 4}")
    val names = vocab.toDF("p_name").repartition(7) // scrambled input order
    val par = Dedup.snmMatchOf(names, Dedup.SnmWindow, "test.snmRank:boundary")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // the single-partition reference form (what the old q80 planned)
    val sortedV = vocab.sorted
    val expected = (for {
      i <- sortedV.indices; k <- 1 to Dedup.SnmWindow if i + k < sortedV.length
      d = levRef(sortedV(i), sortedV(i + k)) if d <= Dedup.FuzzyMaxDist
    } yield (sortedV(i), sortedV(i + k), d)).toSet
    assert(par == expected,
      "parallel SNM must emit exactly the global-sort form's pairs")
    assert(par.nonEmpty, "boundary vocabulary yields no pairs — vacuous")
    // sanity: the ranked vocabulary really spans >1 range partition at
    // the session's shuffle parallelism (otherwise the case is q80's)
    assert(spark.sessionState.conf.numShufflePartitions > 1)
    graft.CacheRegistry.releaseAll()
  }

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q73 transitionProfile: pair mass conserved, ppm rows sum to ~1e6") {
    val rows = Extended.transitionProfile(spark, sf).collect()
    val totalPairs = rows.map(_.getAs[Long]("n")).sum
    val usersWithEvents = rawEvents.map(_._2).distinct.length
    assert(totalPairs == rawEvents.length - usersWithEvents,
      "each user contributes exactly (events-1) transitions")
    rows.groupBy(_.getAs[String]("from_state")).foreach { case (s, rs) =>
      val ppm = rs.map(_.getAs[Long]("p_ppm")).sum
      // integer div floors each cell, so the row sum is within |cells| of 1e6
      assert(ppm > 1000000L - rs.length && ppm <= 1000000L, s"state $s: ppm row sum $ppm")
    }
  }

  test("q77 temporalJoin: every event priced by the version valid AT ITS TIME — no future leakage") {
    val purchases = rawEvents.filter(_._4 == "purchase")
      .groupBy(_._2).map { case (u, es) =>
        // replay q70: versions in (sec, event_id) order; same-second
        // versions collapse to the latest
        val vers = es.sortBy(e => (e._3, e._1)).zipWithIndex
          .map { case (e, i) => (i + 1, e._3, e._5) }
        u -> vers.groupBy(_._2).map { case (_, vs) => vs.maxBy(_._1) }.toSeq.sortBy(_._2)
      }
    val got = Extended.temporalJoin(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("user_id"), r.getAs[Long]("sec"),
          r.getAs[Int]("asof_ver"), r.getAs[Long]("asof_price"))))
      .toMap
    val facts = rawEvents.filter(_._4 != "purchase")
    var joined = 0
    facts.foreach { e =>
      val vers = purchases.getOrElse(e._2, Seq.empty).filter(_._2 <= e._3)
      if (vers.isEmpty) {
        assert(!got.contains(e._1), s"event ${e._1} priced before any version existed")
      } else {
        joined += 1
        val (ver, _, cents) = vers.maxBy(v => (v._2, v._1))
        assert(got(e._1) == ((e._2, e._3, ver, cents)),
          s"event ${e._1}: expected version $ver/$cents, got ${got(e._1)}")
      }
    }
    assert(joined == got.size, "no extra rows beyond the temporally joinable facts")
    assert(joined > 0 && facts.exists(e =>
      purchases.getOrElse(e._2, Seq.empty).forall(_._2 > e._3)),
      "fixture must exercise both the joined and the before-first-version paths")
  }

  test("q78 snapshotDiff: class rollup equals the driver-replayed reconciliation") {
    val cutoff = 1705276800L
    val byKey = rawEvents.groupBy(e => (e._2, e._4)).map { case (k, es) =>
      k -> ((es.count(_._3 < cutoff).toLong, es.count(_._3 >= cutoff).toLong))
    }
    val expected = byKey.values.groupBy { case (a, b) =>
      if (a == 0) "added" else if (b == 0) "churned"
      else if (a != b) "changed" else "stable"
    }.map { case (cls, vs) =>
      cls -> ((vs.size.toLong, vs.map(_._1).sum, vs.map(_._2).sum))
    }
    val got = Extended.snapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("class") ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("events_before"),
          r.getAs[Long]("events_after"))))
      .toMap
    assert(got == expected, s"got $got expected $expected")
    // event mass is conserved across the diff
    assert(got.values.map(_._2).sum + got.values.map(_._3).sum == rawEvents.length.toLong)
  }

  test("q74 outliers: exactly the rows whose integer z-squared exceeds 9") {
    val byType = rawEvents.groupBy(_._4).map { case (t, es) =>
      t -> ((es.length.toLong, es.map(_._5).sum, es.map(e => e._5 * e._5).sum))
    }
    val expected = rawEvents.filter { e =>
      val (n, s, ss) = byType(e._4)
      val lhs = (BigInt(n) * e._5 - s) * (BigInt(n) * e._5 - s)
      lhs > 9 * (BigInt(n) * ss - BigInt(s) * s)
    }.map(_._1).toSet
    val got = Extended.outliers(spark, sf).collect().map(_.getAs[Long]("event_id")).toSet
    assert(got == expected, "outlier set must match exact integer arithmetic")
    assert(got.nonEmpty, "fixture yields no outliers — test is vacuous")
    // sanity: flagged rows really are >3 sigma in float terms too
    got.foreach { id =>
      val e = rawEvents.find(_._1 == id).get
      val (n, s, ss) = byType(e._4)
      val mu = s.toDouble / n
      val sd = math.sqrt(ss.toDouble / n - mu * mu)
      assert(math.abs(e._5 - mu) > 2.99 * sd, s"event $id not a 3-sigma outlier")
    }
  }
}
