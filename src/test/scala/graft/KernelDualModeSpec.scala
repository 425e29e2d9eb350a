package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.{TextHash, VectorOps}

/** Every round-6 kernel must produce IDENTICAL results from its
  * doGenCode and nullSafeEval paths (the IvfSpec NearestCell pattern
  * generalized): run the same frame once with codegen forced-on
  * (Janino errors throw) and once with NO_CODEGEN, compare exactly.
  * Interpreted eval is what Spark falls back to under memory pressure
  * or >64KB generated methods — divergence there is a silent
  * correctness bug, not a perf bug. */
class KernelDualModeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def dualMode(build: => Array[String]): Unit = {
    val saved = Seq("spark.sql.codegen.fallback", "spark.sql.codegen.wholeStage",
      "spark.sql.codegen.factoryMode").map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val viaCodegen = build
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val viaInterpreter = build
      assert(viaCodegen.toSeq == viaInterpreter.toSeq,
        "doGenCode and nullSafeEval must agree")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private lazy val tokenRows: DataFrame = {
    import spark.implicits._
    val tokGen = Gen.listOf(Gen.frequency(
      (6, Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)),
      (1, Gen.const("")),
      (1, Gen.const("é日")),
      (1, Gen.const(null: String))))
    (Gen.listOfN(80, tokGen).sample.get ++
      Seq(Nil, List("a"), List(null, null), List("a", "b", "c", "d", "e")))
      .map(Tuple1(_)).toDF("t")
  }

  private lazy val hashRows: DataFrame = {
    import spark.implicits._
    (Gen.listOfN(80, Gen.listOf(Gen.chooseNum(0L, 1000000006L))).sample.get :+ Nil)
      .map(Tuple1(_)).toDF("hh")
  }

  test("WordNGramHashes dual-mode (n=1..4, step 1 and 3)") {
    for (n <- 1 to 4; step <- Seq(1, 3)) dualMode {
      tokenRows.select(TextHash.wordNGramHashes(col("t"), n, step).as("v"))
        .collect().map(_.toString)
    }
  }

  test("WinnowAnchors dual-mode (k=4 and 48, p=2 and 16; short/empty/unicode strings)") {
    import spark.implicits._
    val strGen = Gen.listOf(Gen.frequency(
      (8, Gen.alphaLowerChar), (2, Gen.const(' ')), (1, Gen.const('é'))))
      .map(_.mkString)
    val rows = (Gen.listOfN(60, strGen).sample.get ++
      Seq("", "abc", "a" * 48, "z" * 200, null))
      .map(Tuple1(_)).toDF("s")
    for (k <- Seq(4, 48); p <- Seq(2, 16)) dualMode {
      rows.select(graft.functions.TextHash.winnowAnchors(col("s"), k, p).cast("string"))
        .collect().map(String.valueOf(_))
    }
  }

  test("MinHashSig dual-mode") {
    dualMode {
      hashRows.select(TextHash.minhashSig(col("hh"), 12).as("v"))
        .collect().map(_.toString)
    }
  }

  test("TokenClassStats dual-mode") {
    import org.apache.spark.sql.GraftSqlBridge
    dualMode {
      tokenRows.select(GraftSqlBridge.column(graft.functions.TokenClassStats(
        GraftSqlBridge.expression(col("t")))).as("v"))
        .collect().map(_.toString)
    }
  }

  test("HashEmbed dual-mode (incl. wrap-overflow inputs)") {
    import spark.implicits._
    val rows = (Gen.listOfN(60, Gen.listOf(Gen.chooseNum(0L, 1000000006L))).sample.get ++
      Seq(Nil, List(Long.MaxValue / 128, 1000000006L))) // force the wrap path
      .map(Tuple1(_)).toDF("hh")
    dualMode {
      rows.select(VectorOps.hashEmbed(col("hh"), 16).as("v"))
        .collect().map(_.toString)
    }
  }

  test("QuantizeVec dual-mode (scales 1, 1024, 2^20; negatives, empties, null elements)") {
    import spark.implicits._
    val vecGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-8.0, 8.0), Gen.const(0.0), Gen.const(-0.0))))
    val rows = (Gen.listOfN(60, vecGen).sample.get ++
      Seq(Nil, List(1.9999999, -1.9999999), List(1e9, -1e9)))
      .map(Tuple1(_)).toDF("e")
    for (scale <- Seq(1L, 1024L, 1048576L)) dualMode {
      rows.select(VectorOps.quantizeVec(col("e"), scale).as("v"))
        .collect().map(_.toString)
    }
  }

  test("VecDHash dual-mode (amp 0 and 8; sub-grid and negative dims)") {
    import spark.implicits._
    import graft.functions.ImageHash
    val vecGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1.5f, 1.5f)))
    val rows = (Gen.listOfN(60, vecGen).sample.get ++
      Seq(Nil, List.fill(63)(-0.25f), List.fill(64)(1.0f)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
    for (amp <- Seq(0, 8)) dualMode {
      rows.select(ImageHash.vecDhash(col("emb"), col("id"), amp).as("v"))
        .collect().map(_.toString)
    }
  }

  test("VecEnvHash dual-mode (amp 0/4, gain 1/3; sub-envelope and negative dims)") {
    import spark.implicits._
    import graft.functions.AudioHash
    val vecGen = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1.5f, 1.5f)))
    val rows = (Gen.listOfN(60, vecGen).sample.get ++
      Seq(Nil, List.fill(56)(-0.25f), List.fill(64)(1.0f)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
    for ((amp, gain) <- Seq((0, 1), (4, 3))) dualMode {
      rows.select(AudioHash.vecEnvHash(col("emb"), col("id"), amp, gain).as("v"))
        .collect().map(_.toString)
    }
  }

  test("PcmEnvHash dual-mode (incl. short arrays → null, negative samples)") {
    import spark.implicits._
    import graft.functions.AudioHash
    val pcmGen = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-32768, 32767)))
    val rows = (Gen.listOfN(60, pcmGen).sample.get ++
      Seq(Nil, List.fill(56)(100), List.fill(57)(-7)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "samples")
    dualMode {
      rows.select(AudioHash.pcmEnvHash(col("samples")).as("v"))
        .collect().map(_.toString)
    }
  }

  test("GrayDHash dual-mode (incl. sub-grid frames → null, short payloads → null)") {
    import spark.implicits._
    import graft.functions.VideoHash
    val frameGen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 30)
      bytes <- Gen.listOfN(w * h, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (w, h, bytes.toArray)
    val rows = (Gen.listOfN(60, frameGen).sample.get ++ Seq(
      (9, 7, Array.fill[Byte](63)(5)),   // exactly grid-sized
      (8, 7, Array.fill[Byte](56)(5)),   // sub-grid width → null
      (20, 10, Array.fill[Byte](50)(1)), // short payload → null
      (0, 0, Array.empty[Byte])))
      .zipWithIndex.map { case ((w, h, p), i) => (i.toLong, p, w, h) }
      .toDF("id", "payload", "w", "h")
    dualMode {
      rows.select(VideoHash.grayDhash(col("payload"), col("w"), col("h")).as("v"))
        .collect().map(_.toString)
    }
  }

  test("PixelDHash dual-mode (incl. sub-grid images → null)") {
    import spark.implicits._
    import graft.functions.ImageHash
    def cube(c: Int, h: Int, w: Int, seed: Int): Seq[Seq[Seq[Int]]] =
      Seq.tabulate(c, h, w)((ch, y, x) => (ch * 91 + y * 31 + x * 11 + seed * 7) % 256)
    val rows = Seq(
      cube(3, 56, 72, 1), cube(3, 7, 9, 2), cube(1, 14, 18, 3),
      cube(3, 6, 9, 4), cube(3, 7, 8, 5) // below-grid → null
    ).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "pixels")
    dualMode {
      rows.select(ImageHash.pixelDhash(col("pixels")).as("v"))
        .collect().map(_.toString)
    }
  }

  private lazy val longVecRows: DataFrame = {
    import spark.implicits._
    val vGen = Gen.listOfN(8, Gen.chooseNum(-600000L, 600000L))
    (Gen.listOfN(60, Gen.zip(vGen, vGen)).sample.get ++
      Seq((Nil, Nil),                       // empty vectors
        (List(1L, 2L, 3L), List(4L, 5L)),   // length mismatch → null
        (List(Long.MaxValue / 2048, 0L), List(0L, 0L))))
      .toDF("a", "b")
  }

  test("SqDistL2 / NearestOfL2 / UpperTriProducts dual-mode (mismatch → null)") {
    import graft.functions.FixedPointOps
    dualMode {
      longVecRows.select(FixedPointOps.sqDistL2(col("a"), col("b")).as("v"))
        .collect().map(_.toString)
    }
    dualMode {
      longVecRows.select(FixedPointOps.nearestOfL2(col("a"),
          array(col("b"), col("a"), col("b"))).as("v"))
        .collect().map(_.toString)
    }
    dualMode {
      longVecRows.select(FixedPointOps.upperTriProducts(col("a")).as("v"))
        .collect().map(_.toString)
    }
  }

  test("Nearest2OfL2 dual-mode (ties to smaller cid; < 2 centroids → null)") {
    import graft.functions.FixedPointOps
    // 4-candidate list incl. a duplicate (b twice → the tie lands on
    // the smaller index) and the vector itself (dist 0 wins slot 1)
    dualMode {
      longVecRows.select(FixedPointOps.nearest2OfL2(col("a"),
          array(col("b"), col("a"), col("b"), col("a"))).as("v"))
        .collect().map(_.toString)
    }
    // one-candidate list: no second probe → null
    dualMode {
      longVecRows.select(FixedPointOps.nearest2OfL2(col("a"),
          array(col("b"))).as("v"))
        .collect().map(_.toString)
    }
    // agreement with the top-1 kernel on (dist1, cid1)
    val both = longVecRows.filter(size(col("a")) === size(col("b")))
      .select(
        FixedPointOps.nearest2OfL2(col("a"),
          array(col("b"), col("a"), col("b"))).as("p2"),
        FixedPointOps.nearestOfL2(col("a"),
          array(col("b"), col("a"), col("b"))).as("p1"))
      .collect()
    both.foreach { r =>
      val p2 = r.getStruct(0); val p1 = r.getStruct(1)
      assert(p2.getLong(0) == p1.getLong(0) && p2.getInt(1) == p1.getInt(1),
        "top-2 kernel slot 1 must equal the top-1 kernel")
    }
  }

  test("Nearest2OfL2 randomized: kernel == brute-force top-2 by (dist, cid) " +
      "over 200 seeded cases, both codegen and interpreted") {
    import spark.implicits._
    import graft.functions.FixedPointOps
    val rnd = new scala.util.Random(1337)
    // dims 1..6, k 2..7, coords in a narrow band to force distance ties
    val cases = (0 until 200).map { i =>
      val d = 1 + rnd.nextInt(6)
      val k = 2 + rnd.nextInt(6)
      val x = Seq.fill(d)(rnd.nextInt(5).toLong - 2L)
      val cents = Seq.fill(k)(Seq.fill(d)(rnd.nextInt(5).toLong - 2L))
      (i.toLong, x, cents)
    }
    def brute(x: Seq[Long], cents: Seq[Seq[Long]]): (Long, Int, Long, Int) = {
      val ds = cents.zipWithIndex.map { case (c, j) =>
        (x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }.sortBy(identity)
      (ds(0)._1, ds(0)._2, ds(1)._1, ds(1)._2)
    }
    val df = cases.toDF("id", "x", "cents")
      .select(col("id"), FixedPointOps.nearest2OfL2(col("x"), col("cents")).as("p"))
    Seq("true", "false").foreach { cg =>
      spark.conf.set("spark.sql.codegen.wholeStage", cg)
      try {
        val got = df.collect().map(r => r.getLong(0) -> {
          val p = r.getStruct(1)
          (p.getLong(0), p.getInt(1), p.getLong(2), p.getInt(3))
        }).toMap
        cases.foreach { case (id, x, cents) =>
          assert(got(id) == brute(x, cents),
            s"case $id (codegen=$cg): ${got(id)} != ${brute(x, cents)}")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("MatVecCentered dual-mode (centered and zero-means; float and double inputs)") {
    import spark.implicits._
    import graft.functions.VectorOps
    val fGen = Gen.listOfN(6, Gen.chooseNum(-0.6f, 0.6f))
    val rows = (Gen.listOfN(50, fGen).sample.get ++
      Seq(Nil, List(1.0f, 2.0f)) /* length mismatch → null */)
      .toDF("f")
    val means = Array(0.1, -0.2, 0.0, 0.3, -0.1, 0.05)
    val basis = Array(
      Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.5, 0.5, 0.0, 0.0, 0.0),
      Array(0.1, 0.1, 0.1, 0.1, 0.1, 0.1))
    for (m <- Seq(means, Array.fill(6)(0.0))) {
      dualMode {
        rows.select(VectorOps.matVecCentered(col("f"), m, basis).as("v"))
          .collect().map(_.toString)
      }
      dualMode {
        rows.select(VectorOps.matVecCentered(
            col("f").cast("array<double>"), m, basis).as("v"))
          .collect().map(_.toString)
      }
    }
  }

  test("QuantizeFixed dual-mode (float and double inputs; scales 1 and 2^20)") {
    import spark.implicits._
    import graft.functions.FixedPointOps
    val fGen = Gen.listOfN(6, Gen.chooseNum(-0.6f, 0.6f))
    val rows = (Gen.listOfN(60, fGen).sample.get ++ Seq(Nil, List(0.0f, -0.0f, 1e-9f)))
      .toDF("f")
    for (scale <- Seq(1L, 1L << 20)) {
      dualMode {
        rows.select(FixedPointOps.quantizeFixed(col("f"), scale).as("v"))
          .collect().map(_.toString)
      }
      dualMode {
        rows.select(FixedPointOps.quantizeFixed(
            col("f").cast("array<double>"), scale).as("v"))
          .collect().map(_.toString)
      }
    }
  }
}
