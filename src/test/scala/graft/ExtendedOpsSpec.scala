package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Extended

/** q38–q40: pivot, exact-moment statistics, posexplode. */
class ExtendedOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("pivot cells equal the groupBy counts they reshape") {
    val wide = Extended.pivotAgg(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val long = Tables.events(spark, sf)
      .groupBy((col("user_id") % 10).as("cohort"), col("event_type"))
      .count().collect()
    long.foreach { r =>
      val cohort = r.getLong(0)
      val et = r.getString(1)
      assert(wide(cohort).getAs[Long](et) === r.getLong(2),
        s"cohort=$cohort type=$et")
    }
    // row sums must equal total event count (no row lost in reshaping)
    val total = wide.values.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total === Tables.events(spark, sf).count())
  }

  test("exact-moment stddev/corr match Spark's native aggregates within 1e-9") {
    val exact = Extended.statsMoments(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val native = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(
        avg(col("value")).as("mean"),
        stddev_samp(col("value")).as("sd"),
        corr(col("value"), col("user_id")).as("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === native.keySet)
    exact.foreach { case (et, r) =>
      val nr = native(et)
      assert(math.abs(r.getDouble(2) - nr.getDouble(1)) < 1e-9, s"$et mean")
      assert(math.abs(r.getDouble(3) - nr.getDouble(2)) < 1e-9, s"$et stddev")
      assert(math.abs(r.getDouble(4) - nr.getDouble(3)) < 1e-9, s"$et corr")
    }
  }

  test("dataset split is deterministic, partition-invariant, and ~80/10/10") {
    val a = Extended.datasetSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // partitioning must not change assignments (rand()-based splits fail this)
    val b = Tables.documents(spark, sf).repartition(13)
      .withColumn("bucket", expr(graft.operators.SplitFormulas.bucket))
      .withColumn("split", expr(graft.operators.SplitFormulas.assign))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a === b)
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1, frac.toString)
    assert(frac.getOrElse("val", 0.0) > 0.02 && frac.getOrElse("test", 0.0) > 0.02, frac.toString)
  }

  test("grouping sets (q46): disjoint single-dimension sets, flags complementary") {
    val rows = Extended.groupingSetsAgg(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
    val nStatus = orders.select(col("o_orderstatus")).distinct().count()
    val nPrio = orders.select(col("o_orderpriority")).distinct().count()
    assert(rows.length == nStatus + nPrio, "one row per value of each dimension")
    rows.foreach { r =>
      val (gs, gp) = (r.getAs[Int]("g_status"), r.getAs[Int]("g_priority"))
      assert(gs + gp == 1, s"each row belongs to exactly one grouping set: $r")
      // the grouped-away dimension surfaces as NULL
      assert((gp == 1) == (r.isNullAt(r.fieldIndex("o_orderpriority"))), r.toString)
      assert((gs == 1) == (r.isNullAt(r.fieldIndex("o_orderstatus"))), r.toString)
    }
    // each set independently totals the table
    val total = orders.count()
    Seq(0, 1).foreach { flag =>
      val n = rows.filter(_.getAs[Int]("g_priority") == flag).map(_.getAs[Long]("n")).sum
      assert(n == total, s"set with g_priority=$flag must cover all rows")
    }
  }

  test("session_window (q48): half-open non-overlapping sessions covering all events") {
    val rows = Extended.sessionWindowAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total, "sessions partition the events")
    // session bounds come back as java.sql.Timestamp (LTZ fixtures) or
    // java.time.LocalDateTime (the round-9 TIMESTAMP_NTZ fixtures) —
    // the contract below is type-agnostic epoch arithmetic
    def ms(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => fail(s"unexpected session-bound type: ${other.getClass}")
    }
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r => ms(r.getAs[Any]("session_start")))
      sorted.foreach { r =>
        val s = ms(r.getAs[Any]("session_start"))
        val e = ms(r.getAs[Any]("session_end"))
        assert(e > s, s"end after start for user $u")
      }
      // gap-session contract: the next session must start at or after
      // the previous end, else the operator would have merged them
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(ms(b.getAs[Any]("session_start")) >=
            ms(a.getAs[Any]("session_end")),
            s"overlapping sessions for user $u")
        case _ =>
      }
    }
  }

  test("grouping sets ≡ the union of its per-set groupBys") {
    val orders = Tables.orders(spark, sf)
    val gs = Extended.groupingSetsAgg(spark, sf).collect()
    val statusRows = gs.filter(_.getAs[Int]("g_priority") == 1)
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_price"))).toSet
    val prioRows = gs.filter(_.getAs[Int]("g_status") == 1)
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_price"))).toSet
    def grouped(c: String) = orders.groupBy(col(c))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("s"))).toSet
    assert(statusRows == grouped("o_orderstatus"))
    assert(prioRows == grouped("o_orderpriority"))
  }

  test("gap-boundary semantics pinned: session_window merges at exactly the gap, splits beyond — q33's rule agrees") {
    import spark.implicits._
    // Empirical contract the q48 oracle depends on: Spark merges an
    // event AT prev_end (= last + gap) into the session — the merge
    // boundary is INCLUSIVE despite the [start, last+gap) window print
    // format — and splits strictly beyond. The fixture has no
    // exact-gap pairs, so only this test guards the boundary rule.
    def sessions(ts2: String): Long = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-06-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf(ts2))).toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1))).count()
    assert(sessions("2024-06-01 10:30:00") == 1, "gap == duration must merge")
    assert(sessions("2024-06-01 10:30:00.001") == 2, "gap > duration must split")
    // q33's composed strict-> rule takes the same branch at the boundary
    val byTs = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val composed = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-06-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-06-01 10:30:00"))).toDF("user_id", "ts")
      .withColumn("prev_ms", unix_millis(lag(col("ts"), 1).over(byTs)))
      .withColumn("new_session",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > 30L * 60 * 1000, 1).otherwise(0))
      .agg(sum(col("new_session"))).head().getLong(0)
    assert(composed == 1, "q33's strict-> rule merges the boundary gap too")
  }

  test("posexplode positions index into the original split") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val exploded = Extended.posExplodeWords(spark, sf).collect()
    assert(exploded.nonEmpty)
    exploded.take(2000).foreach { r =>
      val (id, pos, w) = (r.getLong(0), r.getInt(1), r.getString(2))
      assert(docs(id)(pos) === w, s"doc=$id pos=$pos")
      assert(w.nonEmpty)
    }
  }

  test("q63 event features: trailing range frame ≡ brute-force per-user interval scan") {
    val raw = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), graft.Tables.epochSec(col("ts")).as("sec"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = raw.groupBy(_._2)
    val out = Extended.eventFeatures(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_7d"), r.getAs[Long]("cents_7d"), r.getAs[Long]("peak_7d"))).toMap
    assert(out.size == raw.length)
    raw.foreach { case (eid, uid, sec, _) =>
      val frame = byUser(uid).filter(e => e._3 >= sec - 604799L && e._3 <= sec)
      val expect = (frame.length.toLong, frame.map(_._4).sum, frame.map(_._4).max)
      assert(out(eid) == expect, s"event $eid: got ${out(eid)}, want $expect")
    }
  }

  test("q65 retention: offset-0 cell equals cohort size, cells never exceed it, offsets non-negative") {
    val cells = Extended.retention(spark, sf).collect()
      .map(r => (r.getAs[Long]("cohort_w"), r.getAs[Long]("offset_w")) -> r.getAs[Long]("actives"))
      .toMap
    assert(cells.nonEmpty)
    val cohortSize = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr(s"${graft.Tables.epochSecSql} div 604800").as("wk"))
      .groupBy(col("user_id")).agg(min(col("wk")).as("c"))
      .groupBy(col("c")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cells.foreach { case ((cw, ow), n) =>
      assert(ow >= 0, s"negative offset $ow")
      assert(n <= cohortSize(cw), s"cell ($cw,$ow)=$n exceeds cohort ${cohortSize(cw)}")
    }
    // by definition every cohort member is active in their first week
    cohortSize.foreach { case (cw, size) =>
      assert(cells((cw, 0L)) == size, s"cohort $cw offset 0 must equal cohort size $size")
    }
  }

  test("q68 unpivot profile: one row per measure, counts equal the scan, ranges sane") {
    val rows = Extended.unpivotProfile(spark, sf).collect()
    val n = graft.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[String]("col_name")).sorted.toSeq ==
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nonnull") <= n)
      assert(r.getAs[Long]("n_zero") <= r.getAs[Long]("n_nonnull"))
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
    }
    // the unpivot is ONE Expand scan, not 4 unioned scans
    val plan = Extended.unpivotProfile(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"q68 must melt via stack/Expand, not self-union:\n$plan")
  }

  test("q101 group OLS: fixture ≡ BigInt replay of the normal-equation chain; r2 within [0, 1e6]; slope positive on price-vs-qty") {
    val parts = Tables.part(spark, sf).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[String]("p_brand")).toMap
    val pts = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (parts(r.getLong(0)), BigInt(r.getDouble(1).toLong), BigInt(r.getLong(2))))
    val want = pts.groupBy(_._1).flatMap { case (brand, rows) =>
      val n = BigInt(rows.length)
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val deny = n * syy - sy * sy
      if (den > 0 && deny > 0) {
        val slope = (BigInt(1000000) * num) / den // BigInt / truncates toward zero
        Some(brand -> (n.toLong, slope.toLong, ((slope * num) / deny).toLong))
      } else None
    }
    val out = Extended.groupOls(spark, sf).collect()
    assert(out.length == want.size)
    out.foreach { r =>
      val b = r.getAs[String]("p_brand")
      assert((r.getAs[Long]("n"), r.getAs[Long]("slope_ppm"), r.getAs[Long]("r2_ppm"))
        == want(b), s"brand $b")
      // r2 is a squared correlation — the integer chain must land in
      // [0, 1e6] regardless of slope sign (the fixture's synthetic
      // prices are NOT qty-proportional, so slopes go both ways)
      assert(r.getAs[Long]("r2_ppm") >= 0 && r.getAs[Long]("r2_ppm") <= 1000000L,
        s"brand $b r2 in range")
    }
  }

  test("q100 basket lift: fixture top-k ≡ brute-force replay; supported pairs only; lift formula exact") {
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size.toLong
    val itemN = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ps =>
      ps.toSeq.sorted.combinations(2).foreach { case Seq(a, b) =>
        pairN((a, b)) = pairN.getOrElse((a, b), 0L) + 1 }
    }
    val want = pairN.toSeq.filter(_._2 >= 2).map { case ((a, b), nab) =>
      (a, b, nab, (nab * nOrders * 1000000L) / (itemN(a) * itemN(b)))
    }.sortBy { case (a, b, _, l) => (-l, a, b) }.take(50)
    val out = Extended.basketLift(spark, sf).collect()
      .sortBy(_.getAs[Int]("pos"))
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("n_ab"), r.getAs[Long]("lift_ppm")))
    assert(out.nonEmpty, "fixture must contain supported pairs")
    assert(out.toSeq == want, "top-k order and values replay the lift definition")
    out.foreach { case (a, b, nab, _) =>
      assert(a < b, "canonical pair order")
      assert(nab >= 2, "support filter")
    }
  }

  test("q100 mega-basket cap: the pathological basket is excised whole, normal pairs survive, report audits the dropped mass") {
    import spark.implicits._
    // 2 copies of a normal 3-item basket (so its pairs are supported)
    // + one 40-item mega basket sharing item 1
    val normal = Seq(101L, 102L).flatMap(o => Seq(1L, 2L, 3L).map(p => (o, p)))
    val mega = (1L to 40L).map(p => (999L, p))
    val baskets = (normal ++ mega).toDF("o", "p")
    val uncapped = Extended.basketLiftOf(baskets).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))).toSet
    // uncapped: the mega basket pushes pairs like (1,2),(1,3),(2,3) to
    // support 3 and adds nothing else supported — but its C(40,2)
    // candidates were all generated
    assert(uncapped == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val capped = Extended.basketLiftOf(baskets, maxBasket = Some(10)).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("n_ab"), r.getAs[Long]("lift_ppm"))).toSet
    // capped: the mega basket is gone WHOLE — supports, totals, and
    // pairs all reflect only the 2 normal baskets (n_ab = 2,
    // n_orders = 2, n_a = n_b = 2 → lift = 2·2·10⁶/4 = 10⁶ exactly,
    // the internally-consistent-universe property)
    assert(capped == Set((1L, 2L, 2L, 1000000L), (1L, 3L, 2L, 1000000L),
      (2L, 3L, 2L, 1000000L)), s"got $capped")
    val rep = Extended.megaBasketReport(baskets, 10).head()
    assert(rep.getAs[Long]("n_baskets") == 3)
    assert(rep.getAs[Long]("n_mega_baskets") == 1)
    assert(rep.getAs[Long]("rows_dropped") == 40)
    assert(rep.getAs[Long]("pairs_dropped") == 40L * 39 / 2)
    assert(rep.getAs[Long]("max_basket") == 40)
  }

  test("q112 KMV distinct sketch: estimate replays driver-side; k-min-of-union mergeability holds") {
    def knuth(x: Long): Long = (x * 2654435761L) % 4294967296L
    val d = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_orderkey").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = d.groupBy(_._1).map { case (flag, xs) =>
      val hs = xs.map(t => knuth(t._2)).sorted
      val kth = hs(63) // k = 64, 1-indexed k-th minimum
      val est = 63L * 4294967296L / kth
      val exact = xs.length.toLong
      flag -> (exact, kth, est, 1000000L * math.abs(est - exact) / exact)
    }
    val out = Extended.kmvDistinct(spark, sf).collect()
    assert(out.length == want.size, "one row per return flag")
    out.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      assert(want(f) == (r.getAs[Long]("n_exact"), r.getAs[Long]("kth_hash"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("err_ppm")), s"flag $f")
      assert(r.getAs[Long]("kth_hash") > 0L)
    }
    // mergeability: the k smallest hashes of a union are recoverable
    // from the k smallest of each part — the property that lets
    // per-partition heaps act as partial sketches
    val (flag, xs) = d.groupBy(_._1).head
    val hs = xs.map(t => knuth(t._2)).distinct
    val (p1, p2) = hs.partition(_ % 2 == 0)
    val mergedTopK = (p1.sorted.take(64) ++ p2.sorted.take(64)).sorted.take(64).toSeq
    assert(mergedTopK == hs.sorted.take(64).toSeq, s"k-min merge identity for $flag")
  }

  test("q113 priority sampling: HT estimate replays driver-side; heavy items are always kept") {
    def knuth(x: Long): Long = (x * 2654435761L) % 4294967296L
    val rows = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority", "o_orderkey",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (grp, xs) =>
      val pri = xs.map { case (_, k, w) => (w * 4294967296L / (knuth(k) + 1), k, w) }
      val ranked = pri.sortBy { case (q, k, _) => (-q, k) }
      val tau = ranked(32)._1 // (k+1)-th priority, k = 32
      val kept = ranked.take(32)
      val est = kept.map { case (_, _, w) => math.max(w, tau) }.sum
      val exact = xs.map(_._3).sum
      // every item whose weight reaches the threshold must be sampled
      // (q = w/u >= w >= tau, and priorities above tau are the kept set)
      assert(xs.filter(_._3 >= tau).forall(x => kept.exists(_._2 == x._2)),
        s"$grp: heavy item escaped the sample")
      grp -> (xs.length.toLong, exact, tau, est,
        1000000L * math.abs(est - exact) / exact)
    }
    val out = Extended.prioritySample(spark, sf).collect()
    assert(out.length == want.size, "one row per order priority class")
    out.foreach { r =>
      val g = r.getAs[String]("o_orderpriority")
      assert(want(g) == (r.getAs[Long]("n_items"), r.getAs[Long]("exact_total"),
        r.getAs[Long]("tau"), r.getAs[Long]("est_total"), r.getAs[Long]("err_ppm")),
        s"group $g must equal the driver-replayed priority sample")
    }
  }

  test("q115 volume anomaly: full driver replay of the cross-multiplied z² verdict") {
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", s"${Tables.epochSecSql} div 86400 AS day_no")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view
      .mapValues(_.map { case ((_, d), c) => (d, c) }.toSeq).toMap
    val want = daily.flatMap { case (et, days) =>
      val n = days.length.toLong
      val s1 = days.map(_._2).sum
      val s2 = days.map(d => d._2 * d._2).sum
      val thr = 4L * (n * s2 - s1 * s1)
      days.map { case (d, c) =>
        val dev = n * c - s1
        (et, d, c, dev * dev)
      }.sortBy { case (_, d, _, dev2) => (-dev2, d) }.take(3).zipWithIndex
        .map { case ((_, d, c, dev2), i) =>
          (et, d) -> (c, 100L * s1 / n, 400L * dev2 / math.max(thr, 1L),
            if (dev2 > thr) 1 else 0, i + 1)
        }
    }
    val out = Extended.volumeAnomaly(spark, sf).collect()
    assert(out.length == want.size, "top-3 deviation days per event type")
    out.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("day_no"))
      assert(want(key) == (r.getAs[Long]("n_events"), r.getAs[Long]("mean_x100"),
        r.getAs[Long]("z2_x100"), r.getAs[Int]("is_anomaly"), r.getAs[Int]("rk")),
        s"day $key must equal the driver-replayed verdict")
    }
  }

  test("q115 planted spike: a 10x day is flagged, steady days are not") {
    import spark.implicits._
    val steady = for {
      d <- 1L to 29L; i <- 1L to 50L
    } yield ("click", d)
    val spike = (1L to 500L).map(_ => ("click", 30L))
    val out = Extended.volumeAnomalyOf(
        (steady ++ spike).toDF("event_type", "day_no")).collect()
      .map(r => r.getAs[Long]("day_no") ->
        (r.getAs[Int]("is_anomaly"), r.getAs[Int]("rk"))).toMap
    assert(out(30L) == (1, 1), "the spike day must rank first and be flagged")
    assert(out.filterNot(_._1 == 30L).values.forall(_._1 == 0),
      "steady days must not be flagged")
  }

  test("q122 time-split audit: full driver replay of every boundary's leakage row") {
    val ud = Tables.events(spark, sf)
      .selectExpr("user_id", s"${Tables.epochSecSql} div 86400 AS day_no")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mn = ud.map(_._2).min; val mx = ud.map(_._2).max
    val want = Seq(50, 70, 90).map { p =>
      val bday = mn + (mx - mn) * p / 100
      val byUser = ud.groupBy(_._1).view.mapValues { xs =>
        (xs.count(_._2 < bday).toLong, xs.count(_._2 >= bday).toLong)
      }.toMap
      val trainU = byUser.values.count(_._1 > 0).toLong
      val testU = byUser.values.count(_._2 > 0).toLong
      val overlap = byUser.values.count(v => v._1 > 0 && v._2 > 0).toLong
      val testE = byUser.values.map(_._2).sum
      val leakyE = byUser.values.collect { case (tr, te) if tr > 0 => te }.sum
      p -> (bday, trainU, testU, overlap, 1000000L * overlap / testU,
        testE, leakyE, 1000000L * leakyE / testE)
    }.toMap
    val out = Extended.timeSplitAudit(spark, sf).collect()
    assert(out.length == 3, "one row per candidate boundary")
    out.foreach { r =>
      val p = r.getAs[Int]("p")
      assert(want(p) == (r.getAs[Long]("boundary_day"), r.getAs[Long]("n_train_users"),
        r.getAs[Long]("n_test_users"), r.getAs[Long]("n_overlap_users"),
        r.getAs[Long]("user_overlap_ppm"), r.getAs[Long]("n_test_events"),
        r.getAs[Long]("n_leaky_test_events"), r.getAs[Long]("leaky_ppm")),
        s"boundary p=$p must equal the driver replay")
    }
  }

  test("q122 planted churn: churned, persistent, and cold-start users split the " +
      "overlap exactly") {
    import spark.implicits._
    // users 1-10 churn before day 15; 11-20 span the whole window;
    // 21-25 appear only from day 25 (cold-start at every boundary)
    val rows = (for { u <- 1L to 10L; d <- 1L to 10L } yield (u, d)) ++
      (for { u <- 11L to 20L; d <- 1L to 30L by 5 } yield (u, d)) ++
      (for { u <- 21L to 25L; d <- 25L to 30L } yield (u, d))
    val out = Extended.timeSplitAuditOf(rows.toDF("user_id", "day_no"))
      .collect().map(r => r.getAs[Int]("p") -> r).toMap
    val b50 = out(50) // boundary day 15: churned users are train-only,
                      // cold-start users are test-only, persistents leak
    assert(b50.getAs[Long]("boundary_day") == 15L)
    assert(b50.getAs[Long]("n_train_users") == 20L, "churned + persistent")
    assert(b50.getAs[Long]("n_test_users") == 15L, "persistent + cold-start")
    assert(b50.getAs[Long]("n_overlap_users") == 10L, "persistent only")
    assert(b50.getAs[Long]("user_overlap_ppm") == 666666L,
      "overlap must price strictly between all-leak and all-cold")
  }
}
