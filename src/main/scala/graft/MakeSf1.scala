package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 fixture generator for the OVERFLOW-PROOF capture (round-10
  * verdict ask #4): several queries widen intermediates to
  * DECIMAL(38,0) (q54/q74/q101/q115/q118) or route through log-space
  * (q81/q90/q92) specifically for magnitudes BEYOND sf0.1 — claims so
  * far proven by analysis, not measurement. This main materializes a
  * 10×-sf0.1 ("sf1") corpus so those exact queries can be hash-matched
  * against DuckDB at the magnitudes the widening exists for.
  *
  * Construction: fact tables replicate 10× with offset PRIMARY keys
  * while every foreign key keeps its original value — replicas of
  * lineitem keep l_partkey/l_suppkey, replicas of orders keep
  * o_custkey — so dimension joins stay coherent at 1× dims (how a fact
  * table actually grows against slowly-changing dimensions). The
  * lineitem↔orders key pair offsets by the SAME rule, so order-line
  * joins stay coherent too. Dimensions copy through unchanged.
  * Everything reads the RAW parquet (no ts conversion), so the sf1
  * fixture carries the identical physical types the driver's fixtures
  * have — the Spark and DuckDB readers face the same files both times.
  *
  * The correctness claim this feeds is SELF-CONSISTENT (Spark vs
  * DuckDB over the same files), so the generator's distributions don't
  * need to match a hypothetical driver sf1 drop — only the magnitudes
  * matter: 6M lineitem rows, 1M events, 50k docs' token mass, 10× the
  * per-group sums everywhere.
  *
  * Run: `sbt "runMain graft.MakeSf1 /tmp/graft_sf1 10"` then
  * `sbt "runMain graft.Verify /tmp/graft_sf1 /tmp/verify_sf1 <subset>"`
  * and `python3 tools/check_oracle.py /tmp/graft_sf1 /tmp/verify_sf1`
  * (capture recorded in CORRECTNESS_SF1.md).
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(10)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val reps = broadcast(spark.range(n).toDF("r"))

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    /** Replicate with per-column key offsets; FKs not named keep their
      * original values so 1× dimension joins stay coherent. */
    def rep(name: String, offsets: (String, Long)*): Unit =
      write(offsets.foldLeft(Tables.load(spark, src, name).crossJoin(reps)) {
        case (d, (c, o)) => d.withColumn(c, col(c) + col("r") * lit(o))
      }.drop("r"), name)

    // facts: 10× rows, offset primary keys, coherent FKs
    rep("lineitem", "l_orderkey" -> 1000000000L)
    rep("orders", "o_orderkey" -> 1000000000L) // same rule as l_orderkey
    rep("events", "event_id" -> 1000000000L, "user_id" -> 1000000L)
    rep("documents", "doc_id" -> 10000000L)
    rep("embeddings", "vec_id" -> 10000000L)
    // dimensions: copied through at 1×
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(Tables.load(spark, src, t), t))
    println(s"""{"sf1_dir": "$out", "mult": $n, "src": "$src"}""")
    spark.stop()
  }
}
