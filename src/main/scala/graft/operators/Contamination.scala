package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash.tokens
import graft.functions.VectorExpressions
import graft.io.Tables

/** Cross-document n-gram operators for training-data hygiene: benchmark
  * decontamination and repeated-span (memorization-risk) detection.
  * Pangool has no analogue — these are training-pipeline additions
  * (SURVEY.md §2C); the n-gram-collision decontamination convention follows
  * the published LLM data-curation practice (8–13-gram overlap with an
  * evaluation set marks a training document as contaminated).
  *
  * Both operators ride [[graft.functions.ShingleHashN]]: one fused pass
  * producing 60-bit md5 shingle hashes, so nothing larger than a long ever
  * leaves the scan — at 100 TB the shuffled keys are 8-byte gram hashes,
  * never gram text.
  */
object Contamination {

  /** Benchmark decontamination: for every corpus document NOT in the
    * benchmark set, count its distinct n-grams that collide with any
    * benchmark document's n-grams. `contaminated` flags docs a curation
    * pipeline would drop (or audit) before training.
    *
    * The benchmark set here is the deterministic subset doc_id % every == 0
    * (stand-in for an external eval suite, which this environment lacks).
    *
    * Scale shape: benchmark suites are small by nature (≤ millions of
    * grams), so the gram-hash join broadcasts the benchmark side; the
    * corpus side is one narrow scan + explode, and the only shuffle is the
    * per-doc hit count (doc_id, count) — bytes per doc, never text. The
    * final left join re-attaches zero-hit docs; its left side is the
    * compact (doc_id, n_grams) projection.
    */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 8,
      every: Int = 50): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .where(size(col("w")) >= n)
      // materialize the gram array before fan-out (explode-inlining trap)
      .select(col("doc_id"),
        VectorExpressions.shingleHashN(col("w"), n, 0L, distinct = true).as("grams"))
    val bench = docs.where(col("doc_id") % every === 0)
      .select(explode(col("grams")).as("g")).distinct()
      .withColumn("hit", lit(1))
    // ONE gram-hash pass over the corpus: exploded grams left-join the
    // broadcast benchmark set, count(hit) counts the non-null matches.
    // (A separate hits-join + join-back consumed the ShingleHashN subtree
    // twice — Catalyst does not reuse differently-pruned subtrees; the
    // md5 pass ran 2×, measured 1.17 s vs 0.7 s at sf0.1.)
    docs.where(col("doc_id") % every =!= 0)
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("g"))
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy("doc_id", "n_grams").agg(count(col("hit")).as("n_hit"))
      .withColumn("contaminated", col("n_hit") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_hit"), col("contaminated"))
  }

  /** Repeated-span detection: n-gram (span) hashes that occur in at least
    * `minDocs` DISTINCT documents — the spans an LLM is most likely to
    * memorize verbatim, and the unit of substring-level dedup. Emits one
    * row per repeated span hash with its document frequency, total
    * occurrence count and smallest containing doc.
    *
    * One scan + one aggregation keyed by the 8-byte span hash; partial
    * (map-side) aggregation shrinks the shuffle to the distinct-gram count
    * per partition. The `n_docs` distinct-count expands to a two-phase agg
    * under Catalyst — still only hashes on the wire.
    */
  def repeatedSpans(spark: SparkSession, dir: String, n: Int = 6,
      minDocs: Int = 2): DataFrame = {
    val spans = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"),
        // distinct=false: every position counts as one occurrence
        explode(VectorExpressions.shingleHashN(col("w"), n, 0L, distinct = false)).as("span"))
    spans.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_total"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= minDocs)
  }

  /** C55 — q_decontaminate_semantic: EMBEDDING-level benchmark
    * decontamination — the leak the 8-gram check ([[decontaminate]])
    * structurally misses: a paraphrased/translated/reformatted benchmark
    * item shares no 8-gram with its source but sits next to it in
    * embedding space (the published practice pairs both checks; n-grams
    * catch verbatim leaks, embeddings catch semantic ones). The
    * benchmark is the FIRST `benchCap` vectors of the C19 %-subset
    * convention (vec_id % every == 0 AND vec_id < every·benchCap — real
    * eval suites are fixed-size); EVERY other vector is corpus —
    * including %every ids beyond the cap — and gets a verdict: the
    * closest benchmark vector, its 4dp-rounded cosine, and the
    * contaminated flag at `threshold`.
    *
    * Scale shape: benchmark suites are SMALL by nature → the benchmark
    * side broadcasts (the C19 economics with vectors for grams); the
    * corpus never shuffles for scoring, and the best-match reduction is a
    * map-side-partial `max(struct(cos4, −bench_id))` — the shuffle
    * carries ONE tiny row per corpus vector, never the |corpus|×|bench|
    * fan-out (a window over the fanned rows would shuffle all of it; the
    * struct-max is the same rk=1 row the oracle's window selects, ties
    * broken to the smallest benchmark id). The exact |corpus|×|bench|
    * dot-product compute is inherent to the exact check; a benchmark too
    * large for it routes through the C7 LSH / C7b IVF candidate path
    * first, same as any other vector search.
    */
  def decontaminateSemantic(spark: SparkSession, dir: String,
      every: Int = 50, threshold: Double = 0.25,
      benchCap: Int = 100): DataFrame = {
    val v = Ann.normed(spark, dir)
    // benchCap bounds the benchmark at `benchCap` vectors (ids 0, every,
    // 2*every, …) — real eval suites are FIXED-size, so the exact check's
    // |corpus|x|bench| compute must stay corpus-LINEAR as the corpus
    // grows; an uncapped %-subset would quietly turn quadratic at 100 TB
    val bench = broadcast(v.where(pmod(col("vec_id"), lit(every)) === 0
        && col("vec_id") < every.toLong * benchCap)
      .select(col("vec_id").as("bench_id"), col("e").as("be"), col("nrm").as("bn")))
    // corpus = everything NOT in the capped benchmark — %every vectors
    // beyond the cap are ordinary corpus members and MUST get verdicts
    // (r17 review: the naive %-complement left them in neither set, and
    // the mirrored oracle filter made the gate blind to the hole)
    v.where(pmod(col("vec_id"), lit(every)) =!= 0
        || col("vec_id") >= every.toLong * benchCap)
      .join(bench)
      .select(col("vec_id"),
        round(Ann.cosine(col("e"), col("be"), col("nrm"), col("bn")), 4).as("cos4"),
        col("bench_id"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos4"), (-col("bench_id")).as("nb"))).as("m"))
      .select(col("vec_id"),
        (-col("m.nb")).as("bench_id"),
        col("m.cos4").as("cos4"),
        (col("m.cos4") >= threshold).as("contaminated"))
  }

  /** q_benchmark_exposure — the TRANSPOSE of [[decontaminate]]/C55
    * (r17 verdict item #6): one row per benchmark ITEM with the numbers
    * an eval owner reads to decide which items to retire — how many
    * corpus documents collide with it verbatim (distinct docs sharing ≥1
    * n-gram, plus how many of the item's grams leaked at all) and its
    * nearest corpus embedding (cosine 4dp, ties to the smallest corpus
    * vec id). The corpus-side checks flag training docs to drop; this
    * report flags EVAL items already too exposed for the corpus to be
    * dropped around.
    *
    * Benchmark membership uses C55's CAPPED convention on BOTH
    * modalities (`id % every == 0 AND id < every·benchCap` — real eval
    * suites are fixed-size; C19's uncapped %-subset is its documented
    * stand-in), which is also what keeps this linear: the benchmark side
    * of each join broadcasts, corpus text/vectors never shuffle raw, and
    * the two reductions shuffle (item, doc) hit pairs — ≤ benchCap rows
    * per corpus doc — and one best-match row per (item, partition)
    * respectively. The item id spaces join FULL OUTER: the documents and
    * embeddings tables ship row-aligned in this corpus, but the report
    * must not silently drop an item present in only one modality.
    */
  def benchmarkExposure(spark: SparkSession, dir: String, n: Int = 8,
      every: Int = 50, threshold: Double = 0.25,
      benchCap: Int = 100): DataFrame = {
    def isBench(id: Column) =
      pmod(id, lit(every)) === 0 && id < every.toLong * benchCap
    // n-gram side — the C19 gram derivation verbatim (same hash, same
    // ≥n-token floor), split bench/corpus by the capped rule
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"),
        VectorExpressions.shingleHashN(col("w"), n, 0L, distinct = true).as("grams"))
    val benchGrams = docs.where(isBench(col("doc_id")))
      .select(col("doc_id").as("item_id"), explode(col("grams")).as("g"))
    val hits = docs.where(!isBench(col("doc_id")))
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(benchGrams), Seq("g"))
    val ngram = hits.groupBy(col("item_id"))
      .agg(countDistinct(col("doc_id")).as("n_leak_docs"),
        countDistinct(col("g")).as("n_leak_grams"))
    // every benchmark item appears, zero-leak items included (from the
    // RAW table — an item under the n-token floor still belongs in the
    // report; it just cannot leak verbatim)
    val items = Tables.documents(spark, dir)
      .where(isBench(col("doc_id"))).select(col("doc_id").as("item_id"))
      .join(ngram, Seq("item_id"), "left")
      .na.fill(0L, Seq("n_leak_docs", "n_leak_grams"))
    // semantic side — C55's capped broadcast with the reduction keyed by
    // the BENCHMARK id instead of the corpus id
    val v = Ann.normed(spark, dir)
    val bench = broadcast(v.where(isBench(col("vec_id")))
      .select(col("vec_id").as("item_id"), col("e").as("be"), col("nrm").as("bn")))
    val sem = v.where(!isBench(col("vec_id")))
      .join(bench)
      .select(col("item_id"),
        round(Ann.cosine(col("e"), col("be"), col("nrm"), col("bn")), 4).as("cos4"),
        col("vec_id"))
      .groupBy(col("item_id"))
      .agg(max(struct(col("cos4"), (-col("vec_id")).as("nv"))).as("m"))
      .select(col("item_id"), (-col("m.nv")).as("nearest_vec"),
        col("m.cos4").as("nearest_cos4"))
    items.join(sem, Seq("item_id"), "full_outer")
      .select(col("item_id"), col("n_leak_docs"), col("n_leak_grams"),
        col("nearest_vec"), col("nearest_cos4"),
        (coalesce(col("n_leak_docs"), lit(0L)) > 0
          || coalesce(col("nearest_cos4") >= threshold, lit(false))).as("exposed"))
  }
}
