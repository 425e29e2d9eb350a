package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.operators.Similarity

/** The single-pass vector expressions must be BIT-identical to the
  * HOF folds they replace (same fold order ⇒ same doubles), with
  * codegen fallback disabled so the generated Java is what runs. */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("DotProduct ≡ aggregate(zip_with(...)) bit-exactly on the fixture corpus") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val v = Similarity.vectorsForSpec(spark, sf).limit(200).cache()
      val pairs = v.as("a").crossJoin(v.as("b").limit(20))
        .select(
          VectorOps.dot(col("a.e"), col("b.e")).as("fast"),
          expr("aggregate(zip_with(a.e, b.e, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
            .as("hof"))
        .collect()
      assert(pairs.nonEmpty)
      pairs.foreach { r =>
        // bit comparison, not epsilon: the fold order is the contract
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
      v.unpersist()
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("DotProduct null semantics mirror the HOF (null element / length mismatch)") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val rows = df.select(
      VectorOps.dot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
        .as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }

  test("HyperplaneBucket ≡ the HOF bucket fold on every fixture vector") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val v = Similarity.vectorsForSpec(spark, sf)
      val rows = v.select(
        VectorOps.hyperplaneBucket(col("e"), 4, 64).as("fast"),
        Similarity.bucketHofExpr.as("hof")).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
      // buckets must actually spread (sanity against a constant-0 bug)
      assert(rows.map(_.getInt(0)).distinct.length > 4)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
