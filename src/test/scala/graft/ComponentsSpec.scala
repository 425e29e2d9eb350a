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

  test("q60: endpoints of every verified pair share a rep; rep is the member minimum; csize = member count") {
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

  test("q91 dedupSurvivors: one row per q60 cluster; survivor is the argmax member; drop accounting conserves") {
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

  test("q94 leakageSplitOf: naive split leaks the planted straddling pair; cluster key contains it") {
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
}
