package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Accuracy contract for the char-trigram language classifier (q43) on
  * a held-out fixture of real sentences — the capability bar the
  * stopword-ratio form (q24) cannot meet on short or stopword-poor
  * text. Fixture sentences are common public phrases, ASCII-folded.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val fixture: Seq[(String, String)] = Seq(
    // English
    "en" -> "The quick brown fox jumps over the lazy dog",
    "en" -> "It was the best of times and it was the worst of times",
    "en" -> "To be or not to be that is the question",
    "en" -> "The rain in spain stays mainly in the plain",
    "en" -> "A journey of a thousand miles begins with a single step",
    "en" -> "Ask not what your country can do for you",
    "en" -> "The only thing we have to fear is fear itself",
    "en" -> "This is the house that jack built in the town",
    "en" -> "All the children are playing in the garden today",
    "en" -> "Reading books is one of the best things in life",
    // German
    "de" -> "Der schnelle braune Fuchs springt ueber den faulen Hund",
    "de" -> "Das ist ein schoener Tag und die Sonne scheint",
    "de" -> "Ich habe einen Traum und ich werde ihn nicht vergessen",
    "de" -> "Die Kinder spielen im Garten und singen ein Lied",
    "de" -> "Wir muessen die Rechnung bezahlen bevor wir gehen",
    "de" -> "Der Zug faehrt um acht Uhr vom Bahnhof ab",
    "de" -> "Das Wetter ist heute sehr schoen und warm",
    "de" -> "Ich verstehe nicht was du damit sagen willst",
    "de" -> "Die deutsche Sprache ist eine schoene Sprache",
    "de" -> "Ein gutes Buch ist ein treuer Freund des Menschen",
    // Spanish
    "es" -> "El rapido zorro marron salta sobre el perro perezoso",
    "es" -> "La casa de mi abuela esta cerca de la playa",
    "es" -> "Los ninos juegan en el parque con una pelota",
    "es" -> "Es importante que los estudiantes aprendan una lengua",
    "es" -> "El tiempo es oro y no debemos perderlo nunca",
    "es" -> "La comida espanola es famosa en todo el mundo",
    "es" -> "Los libros son una ventana al conocimiento del mundo",
    "es" -> "El sol sale por el este y se pone por el oeste",
    "es" -> "La vida es un viaje que debemos disfrutar cada dia",
    "es" -> "Quiero aprender a cocinar como lo hace mi madre",
    // French
    "fr" -> "Le renard brun rapide saute par dessus le chien paresseux",
    "fr" -> "La vie est belle quand on la regarde avec le coeur",
    "fr" -> "Les enfants jouent dans le jardin pres de la maison",
    "fr" -> "Il faut manger pour vivre et non pas vivre pour manger",
    "fr" -> "Le temps est un grand maitre qui regle bien des choses",
    "fr" -> "Nous allons au marche pour acheter des fruits et des legumes",
    "fr" -> "La langue francaise est une des plus belles langues du monde",
    "fr" -> "Les etoiles brillent dans le ciel pendant la nuit",
    "fr" -> "Paris est la capitale de la france et une grande ville",
    "fr" -> "Je pense donc je suis disait le philosophe",
    // Mandarin pinyin (the fixture corpus's zh docs are romanized)
    "zh" -> "wo men jin tian qu gong yuan wan",
    "zh" -> "ni hao ma wo hen hao xie xie ni",
    "zh" -> "ta shi wo de hao peng you",
    "zh" -> "wo xi huan chi zhong guo cai",
    "zh" -> "ming tian tian qi zen me yang",
    "zh" -> "wo men yi qi qu kan dian ying ba",
    "zh" -> "ta men zai xue xiao xue xi han yu",
    "zh" -> "zhong guo shi yi ge hen da de guo jia",
    "zh" -> "wo bu zhi dao zhe shi shen me",
    "zh" -> "zhe ge dong xi hao bu hao chi")

  test("trigram classifier: >= 90% accuracy on the held-out fixture, every language >= 80%") {
    import spark.implicits._
    val df = fixture.toDF("expected", "text")
    val pred = TextAnalysis.classifyTrigram(df, "text")
      .select("expected", "predicted_lang", "text").collect()
    val wrong = pred.filter(r => r.getString(0) != r.getString(1))
    val acc = 1.0 - wrong.length.toDouble / pred.length
    assert(acc >= 0.9, s"accuracy $acc; misclassified:\n" +
      wrong.map(r => s"  ${r.getString(0)} -> ${r.getString(1)}: ${r.getString(2)}").mkString("\n"))
    fixture.map(_._1).distinct.foreach { l =>
      val ofLang = pred.filter(_.getString(0) == l)
      val ok = ofLang.count(r => r.getString(0) == r.getString(1))
      assert(ok.toDouble / ofLang.length >= 0.8,
        s"$l accuracy ${ok.toDouble / ofLang.length}")
    }
  }

  test("short stopword-poor phrases — where the q24 stopword form breaks down") {
    import spark.implicits._
    val short = Seq(
      "de" -> "der bahnhof ist geschlossen",
      "fr" -> "les enfants du quartier",
      "es" -> "los perros del pueblo",
      "en" -> "the cats are sleeping",
      "zh" -> "wo men de xue xiao").toDF("expected", "text")
    val pred = TextAnalysis.classifyTrigram(short, "text")
      .select("expected", "predicted_lang", "text").collect()
    val wrong = pred.filter(r => r.getString(0) != r.getString(1))
    assert(wrong.length <= 1, "short phrases must classify by orthography:\n" +
      wrong.map(r => s"  ${r.getString(0)} -> ${r.getString(1)}: ${r.getString(2)}").mkString("\n"))
  }

  test("TrigramLangScores expression ≡ per-language HOF specification (codegen.fallback=false)", Slow) {
    import org.apache.spark.sql.GraftSqlBridge
    import graft.functions.{TrigramLangScores, TrigramProfiles}
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
    // the declarative spec the DuckDB oracle mirrors: aggregate over
    // codepoint windows with a weight CASE per language
    val docs = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 3)
      .withColumn("graft_lt", concat(lit(" "), lower(col("text")), lit(" ")))
    val hof = docs.select(Seq(col("doc_id")) ++
      TrigramProfiles.profiles.map { case (l, ws) =>
        expr(
          s"""aggregate(sequence(1, length(graft_lt) - 2), CAST(0 AS BIGINT),
             |  (acc, i) -> acc + ${TextAnalysis.triLadder("substr(graft_lt, i, 3)", ws)})""".stripMargin)
          .as(s"t_${l}")
      }: _*).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val fast = docs.select(col("doc_id"),
      GraftSqlBridge.column(TrigramLangScores(
        GraftSqlBridge.expression(col("graft_lt")))).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).map(x => x: Any)).toMap
    assert(hof.keySet === fast.keySet)
    hof.foreach { case (id, spec) =>
      assert(fast(id) == spec, s"doc $id: expression ${fast(id)} != spec $spec")
    }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("property: TrigramLangScores ≡ HOF on random unicode strings") {
    import org.apache.spark.sql.GraftSqlBridge
    import graft.functions.{TrigramLangScores, TrigramProfiles}
    import org.scalacheck.Gen
    import spark.implicits._
    val charGen = Gen.frequency(
      (6, Gen.alphaLowerChar),
      (3, Gen.const(' ')),
      (1, Gen.oneOf('é', 'ü', 'ß', '中', '文', '→')))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val strs = Gen.listOfN(200, strGen).apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(78L)).get :+ " th" :+ "the" :+ "中the文" :+ "é th é"
    // padded, lowered — same preprocessing as classifyTrigram
    val df = strs.toDF("text")
      .withColumn("lt", concat(lit(" "), lower(col("text")), lit(" ")))
    val spec = df.select(TrigramProfiles.profiles.map { case (l, ws) =>
        expr(
          s"""aggregate(sequence(1, length(lt) - 2), CAST(0 AS BIGINT),
             |  (acc, i) -> acc + ${graft.operators.TextAnalysis.triLadder("substr(lt, i, 3)", ws)})""".stripMargin)
          .as(s"t_$l")
      }: _*).collect().map(_.toSeq)
    val fast = df.select(GraftSqlBridge.column(TrigramLangScores(
        GraftSqlBridge.expression(col("lt")))).as("s"))
      .collect().map(_.getSeq[Long](0).map(x => x: Any))
    fast.zip(spec).zipWithIndex.foreach { case ((f, s), i) =>
      assert(f == s, s"random string $i: '${strs(i)}' expression $f != spec $s")
    }
  }

  test("q43 over the documents fixture is deterministic and total") {
    val out = TextAnalysis.langIdTrigram(spark, sf)
    val docs = Tables.documents(spark, sf).filter(length(col("text")) >= 3).count()
    assert(out.count() === docs)
    assert(out.filter(col("predicted_lang").isNull).count() === 0)
    // deterministic: same result on re-run
    assert(out.collect().map(_.toSeq).toSet ===
      TextAnalysis.langIdTrigram(spark, sf).collect().map(_.toSeq).toSet)
  }
}
