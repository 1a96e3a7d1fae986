package graft

import org.apache.spark.sql.functions._

import graft.operators.{LangIdModel, TextAnalysis}

/** The C9b lang-id classifier's ACCURACY contract. The documents table's
  * `lang` label is synthetic noise (a word-NB trained on half the corpus
  * scores below the majority prior on the other half — measured 0.37 vs
  * 0.43 at sf0.01), so accuracy is pinned where it means something: real
  * sentences per language, HELD OUT from the exemplar training corpus.
  * The stopword heuristic (C9) can only answer en/unknown; the n-gram NB
  * must beat it by actually separating the five languages.
  */
class LangIdSpec extends GraftSuite {

  /** Held-out fixture — none of these appear in LangIdModel.Exemplars. */
  private val heldOut: Seq[(String, String)] = Seq(
    "de" -> "morgen früh fahren wir mit dem auto zu meiner schwester nach münchen",
    "de" -> "ich habe den schlüssel auf dem tisch in der küche vergessen",
    "de" -> "welche straßenbahn muss ich nehmen um ins museum zu kommen",
    "de" -> "nach dem regen war die luft frisch und die straßen waren leer",
    "en" -> "tomorrow morning we will drive to my sister's house near the lake",
    "en" -> "i left the keys on the table in the kitchen this morning",
    "en" -> "which bus should i take to get to the museum from here",
    "en" -> "after the rain the air was fresh and the streets were empty",
    "es" -> "mañana por la mañana iremos en coche a casa de mi hermana",
    "es" -> "dejé las llaves sobre la mesa de la cocina esta mañana",
    "es" -> "qué autobús debo tomar para llegar al museo desde aquí",
    "es" -> "después de la lluvia el aire estaba fresco y las calles vacías",
    "fr" -> "demain matin nous irons en voiture chez ma sœur près du lac",
    "fr" -> "j'ai laissé les clés sur la table de la cuisine ce matin",
    "fr" -> "quel bus dois je prendre pour aller au musée d'ici",
    "fr" -> "après la pluie l'air était frais et les rues étaient vides",
    "zh" -> "明天早上我们开车去我姐姐家",
    "zh" -> "今天早上我把钥匙忘在厨房的桌子上了",
    "zh" -> "我应该坐哪路公共汽车去博物馆",
    "zh" -> "雨后空气很新鲜街上没有人")

  test("n-gram NB classifies held-out real sentences; the heuristic cannot") {
    val nbAcc = heldOut.count { case (lang, s) =>
      LangIdModel.classify(s) == lang
    }.toDouble / heldOut.size
    // the C9 heuristic's best case: every en sentence right, everything
    // else wrong (it only answers en/unknown, and 'unknown' matches no label)
    val heuristicCeiling =
      heldOut.count(_._1 == "en").toDouble / heldOut.size
    assert(nbAcc >= 0.9, s"held-out accuracy $nbAcc < 0.9")
    assert(nbAcc > heuristicCeiling,
      s"must beat the stopword heuristic's ceiling $heuristicCeiling")
  }

  test("the Spark expression, the Scala reference, and determinism agree") {
    import spark.implicits._
    val df = heldOut.map(_._2).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val scored = df.select(col("doc_id"),
      graft.functions.VectorExpressions.ngramLangScores(
        col("text"), LangIdModel.weights, LangIdModel.priors, LangIdModel.B).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    heldOut.map(_._2).zipWithIndex.foreach { case (s, i) =>
      assert(scored(i.toLong) == LangIdModel.scoresOf(s).toSeq,
        s"expression and reference scorer disagree on fixture $i")
    }
  }

  test("q_langid_ngram is deterministic and total over the corpus") {
    val q = SparkEntry.queries("q_langid_ngram")(spark, sf)
    val docs = graft.io.Tables.documents(spark, sf).count()
    assert(q.count() == docs, "one prediction per document")
    assert(q.where(col("predicted").isin(LangIdModel.Langs.toSeq: _*)).count() == docs)
    val h1 = q.orderBy("doc_id").collect().toSeq
    val h2 = SparkEntry.queries("q_langid_ngram")(spark, sf)
      .orderBy("doc_id").collect().toSeq
    assert(h1 == h2, "re-run must be bit-identical")
  }

  test("gramBucket matches the oracle's ascii-polynomial, by CODE POINT") {
    assert(LangIdModel.gramBucket(LangIdModel.codePoints("abc"), 0)
      == ('a' * 961 + 'b' * 31 + 'c') % LangIdModel.B)
    assert(LangIdModel.gramBucket(LangIdModel.codePoints("xabc"), 1)
      == LangIdModel.gramBucket(LangIdModel.codePoints("abc"), 0))
    // an astral character is ONE gram position (what DuckDB's substr /
    // length see), not two UTF-16 surrogates
    val astral = "a😀b" // a 😀 b
    assert(LangIdModel.codePoints(astral).length == 3)
    assert(LangIdModel.gramBucket(LangIdModel.codePoints(astral), 0)
      == (97 * 961 + 128512 * 31 + 98) % LangIdModel.B)
    // the Spark expression agrees with the reference scorer on it
    import spark.implicits._
    val got = Seq(astral).toDF("text").select(
      graft.functions.VectorExpressions.ngramLangScores(
        col("text"), LangIdModel.weights, LangIdModel.priors, LangIdModel.B))
      .collect().head.getSeq[Long](0)
    assert(got == LangIdModel.scoresOf(astral).toSeq)
  }

  test("the model is bounded serving state: B×langs weights, one prior per lang") {
    assert(LangIdModel.weights.length == LangIdModel.B * LangIdModel.Langs.length)
    assert(LangIdModel.priors.length == LangIdModel.Langs.length)
    // micro-log likelihoods are strictly negative integers
    assert(LangIdModel.weights.forall(_ < 0L))
  }
}
