package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash._
import graft.io.Tables

/** Text-analysis operators for corpus curation (SURVEY.md §2 C8–C11, A14/15).
  * All per-document features are narrow (no shuffle); only the model
  * aggregations shuffle, keyed on (category, word).
  */
object TextAnalysis {

  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** C8 — token statistics per document (narrow). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_unique"))

  /** C9 — language id via stopword-hit ratio heuristic; checked against the
    * table's `lang` label.
    */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        size(filter(col("toks"), t => t.isInCollection(EnStopwords))).cast("long").as("en_hits"),
        size(col("toks")).cast("long").as("n_tokens"))
      .withColumn("predicted",
        when(col("en_hits").cast("double") / col("n_tokens") >= 0.05, lit("en"))
          .otherwise(lit("unknown")))
      .select(col("doc_id"), col("lang"), col("predicted"),
        (col("predicted") === col("lang")).as("correct"))

  /** C10 — quality score: rational-arithmetic-only formula so any engine
    * reproduces it exactly (no exp/log).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks"))).as("unique_ratio"),
        (size(filter(col("toks"), t => t.isInCollection(EnStopwords))).cast("double")
          / size(col("toks"))).as("stop_ratio"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("unique_ratio"), 6).as("unique_ratio"),
        round(col("stop_ratio"), 6).as("stop_ratio"),
        round(lit(0.5) * col("stop_ratio") + lit(0.3) * col("unique_ratio")
          + lit(0.2) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)), 6).as("quality"))

  /** C8b — BPE-ish token count: regex tokenizer (letter runs / digit runs /
    * single punctuation), the pre-merge shape of byte-pair tokenizers.
    * Pattern restricted to constructs Java regex and RE2 agree on.
    */
  def tokenCountBpe(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_bpe_tokens"))

  /** C11b — polynomial rolling hash of the full text (base 31 mod 2³¹-1),
    * the streaming-friendly content fingerprint; a narrow codegen scan
    * ([[graft.functions.RollingHash31]] — the HOF fold it replaces
    * allocated a string per character).
    */
  def rollingHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.VectorExpressions.rollingHash31(col("text"), 7L, P).as("rh"))

  /** C11 — document fingerprint: minimum 60-bit shingle hash (the classic
    * min-hash-of-shingles content fingerprint). Narrow.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_min(graft.functions.VectorExpressions.shingleHash3(
          col("toks"), 0L)).as("fp"))

  /** A14 — Naive Bayes training: per-(category, word) counts + per-category
    * token totals, category = source. One shuffle keyed (source, word); the
    * per-category total rides a window over the same exchange... but source
    * cardinality is tiny so a second tiny agg + broadcast join is cheaper at
    * scale.
    */
  def nbTrain(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
    val counts = words.groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt"))
    val totals = words.groupBy(col("source")).agg(count(lit(1)).as("cat_total"))
    counts.join(broadcast(totals), "source")
      .select(col("source"), col("word"), col("cnt"), col("cat_total"))
  }

  /** A15 — Naive Bayes classification of each doc into a source category:
    * add-1-smoothed multinomial argmax. The model is broadcast; scoring is
    * a per-doc-word join + one groupBy(doc, cat) + argmax window.
    */
  def nbClassify(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val docWords = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("wcnt"))
    // The four docWords consumers (scoring join, model, vocab, category
    // totals) each re-run the explode: subtrees containing lambda functions
    // (tokens = filter(split(...))) never canonicalize equal, so neither
    // ReuseExchange nor AQE stage reuse dedupes them (verified REUSED=0).
    // Both materialization escapes measured WORSE at sf0.1: .cache()
    // degraded join planning 3.5× (2.0→7.1 s), .localCheckpoint() paid more
    // in partition writes than the saved explodes (2.0→2.5 s). Deriving the
    // model from docWords' shape (join the tiny doc→source map,
    // re-aggregate — same counts as nbTrain's direct derivation) is what
    // actually helped: 2.27→1.98 s.
    val docSource = broadcast(docs.select(col("doc_id"), col("source")))
    val model = docWords.join(docSource, "doc_id")
      .groupBy(col("source"), col("word")).agg(sum(col("wcnt")).as("cnt"))
    val vocab = broadcast(model.select(countDistinct(col("word")).as("v")))
    val cats = broadcast(model.groupBy(col("source")).agg(sum(col("cnt")).as("cat_total")))
    // score(doc, cat) = Σ_w wcnt * ln((cnt(cat,w)+1) / (cat_total+V))
    val scored = docWords
      .join(cats)          // doc-word × category
      .join(broadcast(model.select(col("source"), col("word"), col("cnt"))),
        Seq("source", "word"), "left")
      .join(vocab)
      .select(col("doc_id"), col("source"),
        (col("wcnt") * log((coalesce(col("cnt"), lit(0L)) + 1).cast("double")
          / (col("cat_total") + col("v")))).as("term"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("term")).as("score"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("source"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("source").as("predicted"))
  }
}
