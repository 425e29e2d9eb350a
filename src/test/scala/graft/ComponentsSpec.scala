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
}
