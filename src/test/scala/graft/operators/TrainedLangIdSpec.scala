package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TrainedLangId]] — the trained model must BEAT the q_t3 stopword
  * heuristic on the gate corpus (the r16 VERDICT's done-bar), plus the
  * contracts the arithmetic gate can't probe: empty/short docs score
  * on priors, determinism across repartitioning, model grid
  * completeness.
  */
class TrainedLangIdSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.Tables.load(spark, sf(), "documents").localCheckpoint(true)

  test("trained NB beats the stopword heuristic on declared labels") {
    // the testdata text is synthetic English-ish word salad for every
    // declared lang, so NO model can score highly against `lang` here;
    // what a TRAINED model can do — and the heuristic cannot — is
    // exploit whatever per-label distributional skew exists. The bar
    // is strictly-beats, with the real-language competence pinned by
    // the multilingual-corpus test below.
    val n = docs.count()
    val trained = TrainedLangId
      .trainAndPredict(docs, "doc_id", "text", "lang")
    val trainedAcc = trained
      .filter(col("lang_predicted") === col("lang_declared"))
      .count().toDouble / n
    val heuristicAcc = docs
      .select(col("lang"),
        graft.functions.TextAnalysis.langId(col("text")).as("p"))
      .filter(col("p") === col("lang")).count().toDouble / n
    assert(trainedAcc > heuristicAcc,
      s"trained=$trainedAcc heuristic=$heuristicAcc")
  }

  test("on a REAL multilingual corpus: >=0.9 holdout accuracy") {
    val phrases = Map(
      "en" -> Seq("the quick brown fox jumps over the lazy dog",
        "we should think about what this means for everyone",
        "there is nothing better than a quiet morning with coffee",
        "knowledge of the world grows with every question asked"),
      "fr" -> Seq("le renard brun saute par dessus le chien paresseux",
        "nous devrions penser sérieusement à ce que cela signifie",
        "il n'y a rien de mieux qu'un matin calme avec du café",
        "la connaissance du monde grandit à chaque question posée"),
      "de" -> Seq("der schnelle braune fuchs springt über den faulen hund",
        "wir sollten darüber nachdenken was das für alle bedeutet",
        "es gibt nichts besseres als einen ruhigen morgen mit kaffee",
        "das wissen über die welt wächst mit jeder gestellten frage"),
      "es" -> Seq("el rápido zorro marrón salta sobre el perro perezoso",
        "deberíamos pensar en lo que esto significa para todos",
        "no hay nada mejor que una mañana tranquila con café",
        "el conocimiento del mundo crece con cada pregunta hecha"))
    // 40 docs/lang: deterministic phrase rotations, so train and
    // holdout docs differ while sharing the language's orthography
    val rows = for {
      (lang, ps) <- phrases.toSeq
      i <- 0 until 40
    } yield {
      val txt = (0 until 3)
        .map(j => ps((i + j * (1 + i % 3)) % ps.length)).mkString(". ")
      (lang.hashCode.toLong * 1000 + i, txt, lang, i >= 32)
    }
    val df = rows.toDF("doc_id", "text", "lang", "holdout")
      .localCheckpoint(true)
    val (model, priors) = TrainedLangId
      .train(df.filter(!col("holdout")), "text", "lang")
    val ho = df.filter(col("holdout"))
    val acc = TrainedLangId
      .predict(ho, "doc_id", "text", model, priors)
      .join(ho.select("doc_id", "lang"), Seq("doc_id"))
      .filter(col("lang_predicted") === col("lang"))
      .count().toDouble / ho.count()
    assert(acc >= 0.9, s"holdout accuracy $acc")
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(model)
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(priors)
  }

  test("empty and sub-n docs score on priors alone (argmax prior)") {
    val tiny = Seq((1L, "", "en"), (2L, "ab", "fr"), (3L, null, "es"))
      .toDF("doc_id", "text", "lang")
    val (model, priors) = TrainedLangId.train(docs, "text", "lang")
    val got = TrainedLangId
      .predict(tiny, "doc_id", "text", model, priors)
      .select("doc_id", "lang_predicted")
      .as[(Long, String)].collect().toMap
    // the corpus' majority class carries the max prior
    val top = priors.orderBy(col("prior").desc, col("label").asc)
      .select("label").as[String].head()
    assert(got === Map(1L -> top, 2L -> top, 3L -> top))
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(model)
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(priors)
  }

  test("model is the complete labels x buckets grid") {
    val (model, priors) = TrainedLangId
      .train(docs, "text", "lang", buckets = 64)
    val nLabels = priors.count()
    assert(model.count() === nLabels * 64)
    assert(model.filter(col("ll").isNull).count() === 0)
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(model)
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(priors)
  }

  test("predictions are partition-proof (exact decimal argmax)") {
    val a = TrainedLangId.trainAndPredict(docs, "doc_id", "text", "lang")
      .select("doc_id", "lang_predicted", "score")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = TrainedLangId.trainAndPredict(
      docs.repartition(13, col("doc_id")), "doc_id", "text", "lang")
      .select("doc_id", "lang_predicted", "score")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a === b)
  }
}
