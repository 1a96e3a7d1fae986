package graft.operators

/** Hashed character-trigram Naive-Bayes language-id model — the
  * fastText/CLD architecture at its smallest useful size: every trigram of
  * a document hashes into one of [[B]] buckets, each bucket carries one
  * integer log-likelihood weight per language, and a document's score per
  * language is the plain SUM of its grams' weights (+ a class prior). The
  * model is `B × langs` longs (32 KB) at ANY corpus size — a
  * model-as-literals serving artifact on the same footing as the ANN
  * codebooks, so classification is a zero-shuffle narrow scan.
  *
  * Training data is a built-in exemplar corpus (common everyday sentences
  * per language, authored here) rather than the `documents.lang` column:
  * that label is synthetic NOISE — measured on sf0.01, a word-level NB
  * trained on half the corpus scores 0.37 holdout accuracy against a 0.43
  * majority prior, i.e. the text carries no signal about the label, and no
  * classifier can beat anything on it. The honest test of a lang-id
  * operator is real language text; LangIdSpec holds out unseen sentences
  * per language and pins accuracy there (the stopword heuristic of
  * [[TextAnalysis.langId]] can only ever answer en/unknown).
  *
  * Everything is EXACT INTEGER end-to-end: weights are micro-log units
  * (round(1e6 · ln p) via StrictMath.log, bit-stable across JVMs), scores
  * are integer sums, and the DuckDB oracle embeds the SAME weight table as
  * a VALUES literal — so the cross-engine hash-match checks the entire
  * serving path (gram extraction → hash → lookup → sum → argmax) with no
  * FP anywhere.
  *
  * Replaces the toy stopword-ratio heuristic as the C9 classifier
  * (reference has no lang-id; nearest shape is the per-category token
  * counting of examples/.../topicalwordcount).
  */
object LangIdModel {

  /** Hash buckets. 4096 ≈ 10× the distinct-trigram count of the exemplar
    * corpus — few collisions, and the weight table stays a 4096-row VALUES
    * literal the oracle can carry.
    */
  val B: Int = 4096

  /** Languages, sorted — index IS the score-array position everywhere. */
  val Langs: Array[String] = Array("de", "en", "es", "fr", "zh")

  /** Tiny per-language training corpus: common everyday sentences. Ten per
    * language so the priors are uniform by construction.
    */
  val Exemplars: Map[String, Seq[String]] = Map(
    "de" -> Seq(
      "ich gehe heute mit meinen freunden in die stadt und wir kaufen ein",
      "das wetter ist schön und die sonne scheint über den bergen",
      "er hat gesagt dass er morgen nicht zur arbeit kommen kann",
      "wir haben gestern einen langen film gesehen und danach gegessen",
      "die kinder spielen im garten während die eltern kaffee trinken",
      "können sie mir bitte sagen wie ich zum bahnhof komme",
      "ich möchte ein zimmer mit blick auf das meer reservieren",
      "sie liest jeden abend ein buch bevor sie schlafen geht",
      "der zug fährt um acht uhr vom ersten gleis ab",
      "das essen in diesem restaurant war wirklich sehr gut und günstig"),
    "en" -> Seq(
      "i am going to the city with my friends today and we will shop",
      "the weather is beautiful and the sun is shining over the mountains",
      "he said that he cannot come to work tomorrow morning",
      "we watched a long movie yesterday and then had dinner together",
      "the children are playing in the garden while the parents drink coffee",
      "could you please tell me how to get to the train station",
      "i would like to book a room with a view of the sea",
      "she reads a book every evening before she goes to sleep",
      "the train leaves at eight from the first platform",
      "the food in this restaurant was really very good and cheap"),
    "es" -> Seq(
      "hoy voy a la ciudad con mis amigos y vamos a comprar",
      "el tiempo es hermoso y el sol brilla sobre las montañas",
      "él dijo que no puede venir al trabajo mañana por la mañana",
      "ayer vimos una película larga y después cenamos juntos",
      "los niños juegan en el jardín mientras los padres toman café",
      "puede decirme por favor cómo llegar a la estación de tren",
      "me gustaría reservar una habitación con vista al mar",
      "ella lee un libro cada noche antes de dormirse",
      "el tren sale a las ocho desde el primer andén",
      "la comida en este restaurante era muy buena y barata"),
    "fr" -> Seq(
      "je vais en ville avec mes amis aujourd'hui et nous allons acheter",
      "le temps est beau et le soleil brille sur les montagnes",
      "il a dit qu'il ne peut pas venir au travail demain matin",
      "nous avons regardé un long film hier et ensuite nous avons dîné",
      "les enfants jouent dans le jardin pendant que les parents boivent du café",
      "pouvez vous me dire comment aller à la gare s'il vous plaît",
      "je voudrais réserver une chambre avec vue sur la mer",
      "elle lit un livre chaque soir avant de s'endormir",
      "le train part à huit heures du premier quai",
      "la nourriture dans ce restaurant était vraiment très bonne"),
    "zh" -> Seq(
      "我今天和朋友们一起去城里买东西",
      "天气很好太阳照在山上",
      "他说他明天早上不能来上班",
      "我们昨天看了一部很长的电影然后一起吃了晚饭",
      "孩子们在花园里玩父母在喝咖啡",
      "请问去火车站怎么走",
      "我想预订一间海景房",
      "她每天晚上睡觉前都看书",
      "火车八点从第一站台出发",
      "这家餐厅的菜真的很好吃而且便宜"))

  /** Trigram → bucket: a tiny positional polynomial over Unicode CODE
    * POINTS — the exact semantics of the oracle's `ascii(substr(text,i,1))`
    * / `length(text)`, so gram counts and hashes agree on ANY text, not
    * just BMP (a UTF-16-unit formulation would split astral characters
    * into surrogates and silently diverge cross-engine).
    */
  def gramBucket(cps: Array[Int], i: Int): Int =
    (cps(i) * 961 + cps(i + 1) * 31 + cps(i + 2)) % B

  /** Code-point view of a string — the unit every gram position counts. */
  def codePoints(s: String): Array[Int] = s.codePoints().toArray

  /** Flat [bucket × lang] weight table in micro-log units:
    * w(b,l) = round(1e6 · ln((cnt(b,l)+1) / (tot_l + B))) — add-1-smoothed
    * multinomial NB. StrictMath.log for cross-JVM bit-stability; after the
    * round the model is pure integers shared verbatim with the oracle.
    */
  lazy val weights: Array[Long] = {
    val counts = Array.ofDim[Long](B * Langs.length)
    val totals = new Array[Long](Langs.length)
    Langs.zipWithIndex.foreach { case (lang, l) =>
      Exemplars(lang).foreach { s =>
        val cps = codePoints(s)
        var i = 0
        while (i < cps.length - 2) {
          counts(gramBucket(cps, i) * Langs.length + l) += 1
          totals(l) += 1
          i += 1
        }
      }
    }
    Array.tabulate(B * Langs.length) { j =>
      val l = j % Langs.length
      math.round(1e6 * StrictMath.log(
        (counts(j) + 1).toDouble / (totals(l) + B)))
    }
  }

  /** Per-language prior in micro-log units, ln(n_l / N) over exemplar
    * counts — uniform by construction here, carried anyway so the model
    * stays a correct NB if the corpus ever becomes unbalanced.
    */
  lazy val priors: Array[Long] = {
    val n = Langs.map(l => Exemplars(l).size.toLong)
    val total = n.sum
    n.map(c => math.round(1e6 * StrictMath.log(c.toDouble / total)))
  }

  /** Plain-Scala reference scorer (specs + held-out fixture): integer
    * score per language for `text`, identical arithmetic to the Spark
    * expression and the oracle.
    */
  def scoresOf(text: String): Array[Long] = {
    val s = priors.clone()
    val cps = codePoints(text)
    var i = 0
    while (i < cps.length - 2) {
      val off = gramBucket(cps, i) * Langs.length
      var l = 0
      while (l < Langs.length) { s(l) += weights(off + l); l += 1 }
      i += 1
    }
    s
  }

  /** Argmax with the deterministic tie-break both engines use: highest
    * score, then alphabetically first language.
    */
  def classify(text: String): String = {
    val s = scoresOf(text)
    var best = 0
    var l = 1
    while (l < s.length) { if (s(l) > s(best)) best = l; l += 1 }
    Langs(best)
  }
}
