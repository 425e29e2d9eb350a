package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Components, Dedup}

/** q60 invariants: the oracled components query must agree with the
  * pair set it is derived from, and its labels must be true component
  * minima. (Algorithm-level star-contraction cases — long chains,
  * shuffled paths — live in CorpusPipelineSpec; this spec checks the
  * QUERY contract.) */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q60: endpoints of every verified pair share a rep; rep is the member minimum; csize = member count", Slow) {
    val pairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    val rows = Components.componentsQuery(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep"), r.getAs[Long]("csize"))).toMap

    // exactly the documents that participate in >= 1 pair appear
    assert(rows.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    pairs.foreach { case (a, b) =>
      assert(rows(a)._1 == rows(b)._1, s"pair ($a,$b) split across components")
    }
    rows.groupBy(_._2._1).foreach { case (rep, members) =>
      assert(members.keys.min == rep, s"rep $rep is not the component minimum")
      members.foreach { case (id, (_, csize)) =>
        assert(csize == members.size && csize >= 2, s"bad csize for $id")
      }
    }
    CacheRegistry.releaseAll()
  }

  test("q91 survivorsOf: longest member survives each cluster, ties to smaller id; singletons out of scope") {
    import spark.implicits._
    // cluster {1,2,3} via middleman 3: survivor must be 2 (longest,
    // NOT the min-id rep); cluster {6,7} ties on length → 6; docs 4
    // and 5 touch no pair → no survivorship row.
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 30L), (4L, 7L), (5L, 99L),
      (6L, 20L), (7L, 20L)).toDF("doc_id", "n_chars")
    val edges = Seq((1L, 3L), (2L, 3L), (6L, 7L)).toDF("a", "b")
    val got = Components.survivorsOf(docs, edges).collect()
      .map(r => r.getAs[Long]("rep") -> ((r.getAs[Long]("csize"),
        r.getAs[Long]("survivor_id"), r.getAs[Long]("survivor_chars"),
        r.getAs[Long]("dropped_docs"), r.getAs[Long]("dropped_chars")))).toMap
    assert(got == Map(
      1L -> ((3L, 2L, 50L, 2L, 40L)),
      6L -> ((2L, 6L, 20L, 1L, 20L))), s"survivorship was $got")
  }

  test("q91 dedupSurvivors: one row per q60 cluster; survivor is the argmax member; drop accounting conserves", Slow) {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = Components.componentsQuery(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep")))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val got = Components.dedupSurvivors(spark, sf).collect()
      .map(r => r.getAs[Long]("rep") -> r).toMap
    assert(got.keySet == clusters.keySet, "one survivorship row per cluster")
    got.foreach { case (rep, r) =>
      val members = clusters(rep)
      val best = members.toSeq.map(id => (-docs(id), id)).min._2
      assert(r.getAs[Long]("survivor_id") == best,
        s"cluster $rep survivor should be $best")
      assert(r.getAs[Long]("csize") == members.size)
      assert(r.getAs[Long]("dropped_docs") == members.size - 1)
      assert(r.getAs[Long]("survivor_chars") == docs(best))
      assert(r.getAs[Long]("dropped_chars") ==
        members.toSeq.map(docs).sum - docs(best))
    }
    CacheRegistry.releaseAll()
  }

  test("q94 leakageSplitOf: naive split leaks the planted straddling pair; cluster key contains it", Slow) {
    import spark.implicits._
    // naive buckets: 1→61(train) 2→26(train) 3→87(val) 5→17(train)
    // 11→95(test) 35→19(train). Edge (1,3) straddles train/val under
    // the naive split; the cluster key grp=1 pulls doc 3 into train.
    // Edge (5,35) is train-internal either way. Doc 11 is an
    // unclustered test singleton.
    val docs = Seq(1L, 2L, 3L, 5L, 11L, 35L).toDF("doc_id")
    val edges = Seq((1L, 3L), (5L, 35L)).toDF("a", "b")
    val got = Components.leakageSplitOf(docs, edges).collect()
      .map(r => r.getAs[String]("split") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_clustered_docs"), r.getAs[Long]("pairs_within"),
        r.getAs[Long]("naive_pairs_within")))).toMap
    assert(got == Map(
      "train" -> ((5L, 4L, 2L, 1L)),
      "test" -> ((1L, 0L, 0L, 0L))), s"audit was $got")
  }

  test("q94 leakageSplit: every pair contained; splits partition the corpus; clustered docs co-locate") {
    val docsN = Tables.documents(spark, sf).count()
    val pairsN = Dedup.minhashLsh(spark, sf).count()
    val rows = Components.leakageSplit(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docsN,
      "splits must partition the corpus")
    assert(rows.map(_.getAs[Long]("pairs_within")).sum == pairsN,
      "every near-dup pair must be contained in one split")
    assert(rows.map(_.getAs[Long]("naive_pairs_within")).sum <= pairsN)
    CacheRegistry.releaseAll()
  }

  /** Driver replay of q95's integer PR contract — same floor
    * divisions, same symmetrization, plain Scala maps. */
  private def replayPr(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (es ++ es.map(e => (e._2, e._1))).distinct
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = sym.map(_._1).distinct.map(_ -> Components.PrScale).toMap
    for (_ <- 1 to iters)
      r = sym.map { case (s, t) => t -> (85L * (r(s) / deg(s))) / 100 }
        .groupBy(_._1).map { case (t, cs) =>
          t -> (Components.PrBase + cs.map(_._2).sum) }
    r
  }

  test("q95 linkRankOf: crafted hub graph ≡ exact driver replay; hub ranks first, pendant pair last") {
    import spark.implicits._
    // hub 0 ↔ four leaves; a separate pendant pair 10-12 that only
    // exchanges mass with itself
    val es = Seq((0L, 2L), (0L, 4L), (0L, 6L), (0L, 8L), (10L, 12L))
    val out = Components.linkRankOf(spark, es.toDF("s", "t"), topK = 10).collect()
      .map(r => (r.getAs[Int]("pos"), r.getAs[Long]("entity_id") * 2, // all even ids here
        r.getAs[Long]("rank_score")))
    val want = replayPr(es, Components.PrIters)
    assert(out.length == 7, "all seven nodes rank")
    out.foreach { case (_, id, score) =>
      assert(score == want(id), s"node $id: got $score, replay ${want(id)}")
    }
    assert(out.find(_._1 == 1).get._2 == 0L, "the hub collects the most mass")
    // structure the scores must reflect: the hub aggregates all four
    // leaf shares (top); a pendant bounces its FULL share back and
    // forth (≈ starting mass); a star leaf receives only a quarter of
    // the hub's share — so hub > pendants > leaves
    val hubScore = out.find(_._2 == 0L).get._3
    val pendantScores = out.filter(o => o._2 == 10L || o._2 == 12L).map(_._3)
    val leafScores = out.filter(o => o._2 >= 2L && o._2 <= 8L).map(_._3)
    assert(hubScore > pendantScores.max, "hub outranks the pendant pair")
    assert(pendantScores.min > leafScores.max, "pendants outrank quarter-share leaves")
    CacheRegistry.releaseAll()
  }

  test("q95 lineage control (round-15 verdict #3): checkpointed loop is " +
      "bit-identical to the unbroken-lineage loop, and at iters=50 the plan " +
      "depth stays bounded per round", Slow) {
    import spark.implicits._
    val es = Seq((0L, 2L), (0L, 4L), (0L, 6L), (0L, 8L), (10L, 12L), (4L, 6L))
    // equality: a checkpoint only truncates lineage, never changes rows
    val plain = Components.linkRankOf(spark, es.toDF("s", "t"),
        iters = 12, topK = 10, checkpointEvery = 0)
      .collect().map(_.toSeq).sortBy(_.mkString(" "))
    CacheRegistry.releaseAll()
    val ckpt = Components.linkRankOf(spark, es.toDF("s", "t"),
        iters = 12, topK = 10, checkpointEvery = 3)
      .collect().map(_.toSeq).sortBy(_.mkString(" "))
    CacheRegistry.releaseAll()
    assert(plain.toSeq == ckpt.toSeq,
      "checkpointing must be bit-identical to the unbroken loop")
    // bounded depth: at iters=50 with the default cadence, the FINAL
    // plan's depth reflects at most checkpointEvery rounds of joins,
    // not 50 — an unbroken 50-round lineage would be ~6x deeper (and
    // the run itself would replan every stage of it)
    val out50 = Components.linkRankOf(spark, es.toDF("s", "t"),
      iters = 50, topK = 10)
    val depth50 = out50.queryExecution.optimizedPlan.collect { case p => p }.size
    out50.collect() // completes — the loop is executable at depth
    CacheRegistry.releaseAll()
    val outShallow = Components.linkRankOf(spark, es.toDF("s", "t"),
      iters = Components.PrCheckpointEvery, topK = 10)
    val depthShallow =
      outShallow.queryExecution.optimizedPlan.collect { case p => p }.size
    CacheRegistry.releaseAll()
    // the 50-iter plan may carry at most one extra checkpoint-read +
    // the trailing (iters % cadence) rounds — bound it by shallow + a
    // small constant rather than pinning exact node counts
    assert(depth50 <= depthShallow + 16,
      s"iters=50 plan depth $depth50 must stay near the per-window depth " +
        s"$depthShallow — lineage is not being truncated")
  }

  /** Brute-force per-node triangle counts from an edge list. */
  private def triReplay(es: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val adj = (es ++ es.map(e => (e._2, e._1))).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    adj.map { case (n, nb) =>
      val t = nb.toSeq.combinations(2).count { case Seq(a, b) => adj(a)(b) }.toLong
      val d = nb.size.toLong
      n -> (d, t, if (d >= 2) (2 * t * 1000000L) / (d * (d - 1)) else 0L)
    }
  }

  test("q99 triangleAuditOf: clique is coeff 1e6, chain middle is 0, K4 counts 3 per corner; replay exact") {
    import spark.implicits._
    // triangle {1,2,3} + chain 4-5-6 + K4 {7,8,9,10}
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L)) ++
      Seq((7L, 8L), (7L, 9L), (7L, 10L), (8L, 9L), (8L, 10L), (9L, 10L))
    val out = Components.triangleAuditOf(es.toDF("a", "b")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"), r.getAs[Long]("coeff_ppm"))).toMap
    assert(out == triReplay(es))
    assert(out(1L) == ((2L, 1L, 1000000L)), "triangle corner is a perfect clique locally")
    assert(out(5L) == ((2L, 0L, 0L)), "chain middle has the wedge but no closure")
    assert(out(4L) == ((1L, 0L, 0L)), "degree-1 endpoint")
    assert(out(7L) == ((3L, 3L, 1000000L)), "K4 corner sits on 3 triangles, coeff 1")
    assert(out.values.map(_._2).sum % 3 == 0, "every triangle has exactly 3 corners")
  }

  test("q99 fixture: per-node counts ≡ brute-force over the q18 pair graph; chain-merged clusters expose coeff 0", Slow) {
    val pairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSeq
    val want = triReplay(pairs)
    val out = Components.triangleAudit(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"), r.getAs[Long]("coeff_ppm"))).toMap
    assert(out == want, "distributed enumeration ≡ brute force")
    assert(out.nonEmpty)
    CacheRegistry.releaseAll()
  }

  /** Driver replay of q102's two unnormalized HITS rounds. */
  private def hitsReplay(es: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
    val e = es.distinct
    val a1 = e.groupBy(_._2).map { case (s, v) => s -> v.size.toLong }
    val h1 = e.groupBy(_._1).map { case (c, v) => c -> v.map(x => a1(x._2)).sum }
    val a2 = e.groupBy(_._2).map { case (s, v) => s -> v.map(x => h1(x._1)).sum }
    (h1, a2)
  }

  test("q102 hitsOf: crafted bipartite graph ≡ replay; a hub of popular authorities beats a wider hub of unpopular ones") {
    import spark.implicits._
    // supplier 100 serves customers 1,2,3 (popular, a1=3); suppliers
    // 101/102 serve only customer 4. Customer 1 buys from {100} only;
    // customer 4 buys from {101,102} — wider, but both unpopular, so
    // h(1)=3 strictly beats h(4)=2: depth of endorsement wins over
    // breadth, the defining HITS behavior.
    val es = Seq((1L, 100L), (2L, 100L), (3L, 100L),
      (4L, 101L), (4L, 102L))
    val out = Components.hitsOf(spark, es.toDF("c", "s"), topK = 10).collect()
    val (h1, a2) = hitsReplay(es)
    out.foreach { r =>
      val id = r.getAs[Long]("entity_id")
      val want = if (r.getAs[String]("role") == "hub") h1(id) else a2(id)
      assert(r.getAs[Long]("score") == want, s"${r.getAs[String]("role")} $id")
    }
    assert(h1(1L) == 3L && h1(4L) == 2L, "the planted inequality is real")
    val hubs = out.filter(_.getAs[String]("role") == "hub")
      .sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("entity_id"))
    assert(hubs.take(3).toSeq == Seq(1L, 2L, 3L),
      "single-popular-supplier hubs strictly outrank the wider unpopular hub")
    assert(hubs(3) == 4L)
    val auths = out.filter(_.getAs[String]("role") == "authority")
      .sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("entity_id"))
    assert(auths.head == 100L, "the popular supplier is the top authority")
    CacheRegistry.releaseAll()
  }

  test("q102 hits: fixture ≡ replay over the collected trade edges; both roles present, positions dense") {
    val trade = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (h1, a2) = hitsReplay(trade)
    val out = Components.hits(spark, sf).collect()
    val byRole = out.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet == Set("hub", "authority"))
    byRole.foreach { case (role, rs) =>
      assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to rs.length))
      val m = if (role == "hub") h1 else a2
      // the emitted top-k IS the replay's top-k, in order
      val wantTop = m.toSeq.sortBy { case (id, sc) => (-sc, id) }
        .take(rs.length).map(_._1)
      assert(rs.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("entity_id")).toSeq
        == wantTop, s"$role top-k")
      rs.foreach(r => assert(r.getAs[Long]("score") == m(r.getAs[Long]("entity_id"))))
    }
    CacheRegistry.releaseAll()
  }

  test("q95 linkRank: fixture graph ≡ driver replay; positions dense; kinds consistent with id parity") {
    val trade = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .select(org.apache.spark.sql.functions.expr("o_custkey * 2").as("s"),
        org.apache.spark.sql.functions.expr("l_suppkey * 2 + 1").as("t"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = replayPr(trade, Components.PrIters)
    val out = Components.linkRank(spark, sf).collect()
    assert(out.map(_.getAs[Int]("pos")).toSeq == (1 to out.length),
      "positions are dense from 1")
    out.foreach { r =>
      val id = r.getAs[Long]("entity_id") * 2 +
        (if (r.getAs[String]("kind") == "supplier") 1 else 0)
      assert(r.getAs[Long]("rank_score") == want(id),
        s"${r.getAs[String]("kind")} ${r.getAs[Long]("entity_id")}")
    }
    // top-k must be the replay's global top-k (ties → smaller id)
    val wantTop = want.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(out.length).map(_._1)
    val gotTop = out.sortBy(_.getAs[Int]("pos")).map { r =>
      r.getAs[Long]("entity_id") * 2 +
        (if (r.getAs[String]("kind") == "supplier") 1 else 0) }
    assert(gotTop.toSeq == wantTop, "top-k set and order match the replay")
    CacheRegistry.releaseAll()
  }
}
