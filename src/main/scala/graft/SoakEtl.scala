package graft

import org.apache.spark.sql.functions._

/** Scale soak for the events-family ETL operators (q69–q77): replicate
  * the sf0.1 events table N× with offset user_ids — N× users at the
  * SAME per-user density, which is how an event corpus actually grows —
  * and time each operator at 1× and N×. Near-linear growth (at fixed
  * parallelism) is the pass criterion: every operator here is one
  * key-partitioned pass, so there is no super-linear term to hide.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SoakEtl [N]"`
  * Writes the replicated corpus under /tmp/graft_soak_etl (one-off).
  */
object SoakEtl {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import spark.implicits._

    val base = Tables.events(spark, sfDir)
    val soakDir = "/tmp/graft_soak_etl"
    val reps = spark.range(n).toDF("r")
    base.crossJoin(broadcast(reps))
      .withColumn("user_id", col("user_id") + col("r") * lit(1000000L))
      .withColumn("event_id", col("event_id") + col("r") * lit(1000000000L))
      .drop("r")
      .write.mode("overwrite").parquet(s"$soakDir/events.parquet")

    val ops: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "q69_cdc_apply" -> operators.Extended.cdcApply _,
        "q70_scd2_build" -> operators.Extended.scd2Build _,
        "q71_gap_fill" -> operators.Extended.gapFill _,
        "q73_transition_profile" -> operators.Extended.transitionProfile _,
        "q74_outliers" -> operators.Extended.outliers _,
        "q76_incremental_agg" -> operators.Extended.incrementalAgg _,
        "q77_temporal_join" -> operators.Extended.temporalJoin _)

    def time(dir: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).write.format("noop").mode("overwrite")
      rows.save()
      val dt = (System.nanoTime() - t0) / 1e9
      val cnt = fn(spark, dir).count()
      (dt, cnt)
    }

    println(f"## ETL soak: sf0.1 events x$n (users x$n, same per-user density)")
    ops.foreach { case (name, fn) =>
      val (t1, c1) = time(sfDir, fn)
      val (tn, cn) = time(soakDir, fn)
      println(f"$name%-24s 1x: $t1%6.2f s ($c1%9d rows)   ${n}x: $tn%6.2f s ($cn%10d rows)   growth ${tn / t1}%4.1fx")
    }
    spark.stop()
  }
}

/** Documents-family soak: replicate the sf0.1 documents table N× with
  * offset doc_ids (N× docs, same text distribution — the bigram count
  * table keeps its vocab²-bounded size while every per-doc stage gets
  * N× rows) and time the text operators whose scale story depends on
  * that boundedness. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SoakDocs [N]"` */
object SoakDocs {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val soakDir = "/tmp/graft_soak_docs"
    val reps = spark.range(n).toDF("r")
    Tables.documents(spark, sfDir).crossJoin(broadcast(reps))
      .withColumn("doc_id", col("doc_id") + col("r") * lit(10000000L))
      .drop("r")
      .write.mode("overwrite").parquet(s"$soakDir/documents.parquet")

    val ops: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "q54_tfidf_topk" -> operators.TextAnalysis.tfidfTopK _,
        "q66_source_divergence" -> operators.TextAnalysis.sourceDivergence _,
        "q79_lm_score" -> operators.TextAnalysis.lmScore _,
        // q83 is a linear pipeline (windows ∝ chars; the dup-hash set is
        // bounded by DISTINCT windows, which replication leaves fixed).
        // The PAIR operators (q18/q85) are deliberately absent: N×
        // replication makes every copy a near-dup of its N−1 siblings,
        // so pair counts grow N² by construction of the soak data, not
        // of the algorithm — the honest pair-scale evidence is the
        // bucket-boundedness PlanAudit/DedupSpec assert, not a
        // replicated-corpus wall clock.
        "q83_substring_dedup" -> operators.Dedup.substringDedup _)

    println(f"## Documents soak: sf0.1 x$n (docs x$n, same text distribution)")
    ops.foreach { case (name, fn) =>
      def time(dir: String): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      time(sfDir) // warm: codegen + JIT, unmeasured (the Bench.scala rule)
      val t1 = time(sfDir)
      val tn = time(soakDir)
      println(f"$name%-24s 1x: $t1%6.2f s   ${n}x: $tn%6.2f s   growth ${tn / t1}%4.1fx")
    }
    spark.stop()
  }
}

/** ANN-ladder timing: the four index tiers over the same corpus and
  * query set, timed end-to-end INCLUDING index build (assignment /
  * training) — the honest comparison, since the exact scan has no
  * build cost to amortize. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SoakAnn"` */
object SoakAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val tiers: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "q21 exact cosine top-k" -> (() => operators.Similarity.cosineTopK(spark, sfDir)),
      "q22 multi-probe LSH" -> (() => operators.Similarity.annTopK(spark, sfDir)),
      "q44 IVF (coarse quantizer)" -> (() => operators.Similarity.ivfTopK(spark, sfDir)),
      "PQ-ADC full scan" -> (() => operators.Similarity.pqTopK(spark, sfDir)),
      "IVF+PQ+exact rerank" -> (() => operators.Similarity.ivfPqTopK(spark, sfDir)))
    println(s"## ANN ladder at $sfDir (end-to-end incl. index build, warm 2nd run)")
    tiers.foreach { case (name, fn) =>
      fn().write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
