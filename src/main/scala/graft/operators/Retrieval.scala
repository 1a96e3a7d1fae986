package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Text retrieval over the documents corpus: the inverted index and BM25
  * ranking — the search-engine counterpart of the ANN family (SURVEY.md
  * §2C). Pangool's MultiShakespeareIndexer
  * (reference: examples/src/main/java/com/datasalt/pangool/examples/
  * multishakespeare/MultiShakespeareIndexer.java) builds exactly this
  * artifact (word → per-play posting lines) as a MapReduce job with named
  * outputs; here the index is a DataFrame a downstream ranker can join.
  */
object Retrieval {

  /** C41 — inverted index with champion lists: per word, document
    * frequency, corpus frequency, and the top-`champions` postings by
    * (tf desc, doc_id) as a bounded `doc:tf` string — the impact-ordered
    * truncated posting list real engines keep for query-time pruning
    * (champion lists / impact ordering), and the reason an output row
    * stays O(champions) even for stopwords over a 100 TB corpus.
    *
    * Plan shape — Zipf-safe by construction (nothing ever materializes a
    * df-sized partition, so a stopword appearing in EVERY document of a
    * 100 TB corpus costs no single task more than a bounded heap):
    * ONE corpus scan fans out (word, doc_id) occurrences into the tf
    * aggregate (map-side combine collapses each task to its distinct
    * (word, doc) pairs — the only data-sized shuffle, carrying 16-byte
    * pairs, never text; the tf exchange is REUSED by both derivations
    * below, pinned in PlanSpec). From tf:
    *   - df/cf are a word-keyed hash AGGREGATE — partial_count/partial_sum
    *     combine per map task, so the word exchange carries one row per
    *     (word, task), never df rows, no matter how hot the key;
    *   - champion lists are a rank window whose `row_number() <= k`
    *     filter Spark compiles to a WindowGroupLimit PARTIAL before the
    *     word exchange (pinned in PlanSpec), capping a stopword's shuffle
    *     volume (and its window partition) at champions × tasks instead
    *     of df. The final postings groupBy rides the window's word
    *     partitioning (array_sort on the rank makes the collect_list
    *     order deterministic).
    * The stats⋈champions join aligns two already-word-partitioned sides —
    * no extra data-sized exchange (at small SF the stats side broadcasts).
    * The r10 form derived df/cf AND the rank as windows riding one
    * exchange — one exchange fewer at small SF, but the count/sum windows
    * forced each word's FULL partition to materialize on one task
    * (df≈|corpus| for a true stopword), exactly the skew that kills a
    * full-corpus index job (the reference's MultiShakespeareIndexer is
    * this job, stopwords included). The skewed fixture in RetrievalSpec
    * pins the bounded behavior. Champion pruning deliberately stays the
    * rank-window form rather than [[TopK.perGroup]]: for the exact
    * `row_number() <= k` pattern Spark plans the WindowGroupLimit partial
    * itself, entirely inside whole-stage codegen, where perGroup pays row
    * de/serialization on the whole tf table (A/B at sf0.1: window 0.64 s
    * vs perGroup 0.71 s best-of-3, identical results — PLANS.md r11).
    */
  def invertedIndex(spark: SparkSession, dir: String, champions: Int = 8): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val champs = tf.withColumn("rk", row_number().over(
        Window.partitionBy(col("word")).orderBy(col("tf").desc, col("doc_id"))))
      .where(col("rk") <= champions)
      .groupBy(col("word"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rk"),
            concat(col("doc_id"), lit(":"), col("tf")).as("p")))),
          s => s.getField("p")),
        ",").as("postings"))
    stats.join(champs, "word")
      .select(col("word"), col("df"), col("cf"), col("postings"))
  }

  /** C42 — BM25 document ranking for a query term set, in EXACT integer
    * ppm so both engines produce bit-identical scores (the graft-parity
    * money/ppm rule: no log, no FP accumulation). Two deviations from
    * textbook BM25, both monotone stand-ins chosen for integer exactness:
    * idf uses the ratio form ((N−df+1)·10⁶ div (df+1)) instead of its
    * log, and avgdl is quantized to deci-tokens (b10 = 10T div N). The
    * saturation term keeps k1=1.2, b=0.75 exactly — multiplying
    * tf + k1(1−b+b·dl/avgdl) through by 10·avgdl gives the all-integer
    * tfc_ppm = 22·b10·tf·10⁶ div (10·b10·tf + 3·b10 + 90·dl). Overflow
    * audit at the 100 TB point: b10 ≲ 10⁵ (10k-token avg docs), tf ≤ dl,
    * so the widest product 22·b10·tf·10⁶ stays under 2⁶³ for docs to
    * ~40k tokens; N−df+1 ≤ N ~ 10⁹ docs × 10⁶ fits.
    *
    * Plan shape: ONE corpus scan. The tokenize fan-out folds every
    * non-query token to a NULL key, so the first aggregate collapses each
    * doc to ≤|Q|+1 rows — (doc, term) tf counts plus the null-group rest —
    * with map-side combine doing the collapse before the only data-sized
    * shuffle. That compact table is checkpointed once (the Q9/lm_score
    * single-scan pattern) and serves all four derivations: doc length
    * (per-doc sum including the null group), the term tf rows, the corpus
    * stats (N, T) and the per-term df — the latter two 1-row/|Q|-row
    * broadcasts. The only join is doc-keyed tf⋈dl between two
    * pre-aggregated sides, and the final top-k plans as
    * TakeOrderedAndProject (per-partition bounded top-k, k-row merge —
    * never a global sort).
    */
  def bm25(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("join", "scan", "window", "vector"),
      k: Int = 20): DataFrame = {
    val cnt = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .select(col("doc_id"),
        when(col("word").isin(terms: _*), col("word")).as("qword"))
      .groupBy(col("doc_id"), col("qword")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val dl = cnt.groupBy(col("doc_id")).agg(sum(col("c")).as("dl"))
    val tfq = cnt.where(col("qword").isNotNull)
      .select(col("doc_id"), col("qword").as("word"), col("c").as("tf"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tok"))
    val dfT = tfq.groupBy(col("word")).agg(count(lit(1)).as("df"))
    tfq.join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(dfT), "word")
      .withColumn("b10", expr("10L * t_tok div n_docs"))
      .withColumn("idf_ppm", expr("(n_docs - df + 1) * 1000000L div (df + 1)"))
      .withColumn("tfc_ppm",
        expr("22L * b10 * tf * 1000000L div (10L * b10 * tf + 3L * b10 + 90L * dl)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("idf_ppm * tfc_ppm div 1000000L")).as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
  }

  /** C43 — exact text k-NN: for each probe document, the top-`k` most
    * similar corpus documents by 3-shingle Jaccard — the text-side twin of
    * C6's brute-force embedding k-NN (same role: the exact baseline the
    * LSH paths (C2/C4) are recall-measured against, and the honest scale
    * shape for SMALL probe sets: the probe shingle sets broadcast, the
    * corpus scans ONCE and never shuffles text; per-pair cost is the
    * array intersect, fanned out probe-count times on the narrow side).
    * Shingle hashes and the round-6dp Jaccard reuse the C2 kernels
    * ([[Dedup.shingleHashedOf]]), so scores are comparable across the
    * dedup family. The per-probe top-k window partitions on probe_id —
    * probe-count groups, WindowGroupLimit prunes map-side.
    */
  def textKnn(spark: SparkSession, dir: String, nProbes: Int = 10, k: Int = 3): DataFrame = {
    // sorted-distinct shingle sets let the per-pair score run through the
    // fused SortedJaccard merge kernel (one O(m+n) pass, no per-pair hash
    // set) — property-tested value-equal to the intersect/union composed
    // form, and the sort is a narrow once-per-doc cost amortized over
    // nProbes comparisons
    val sh = Dedup.shingleHashedOf(Tables.documents(spark, dir))
      .select(col("doc_id"), sort_array(array_distinct(col("h0"))).as("h0"))
    val probes = broadcast(sh.where(col("doc_id") < nProbes)
      .select(col("doc_id").as("probe_id"), col("h0").as("ph")))
    val scored = probes.join(sh, col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"), col("doc_id"),
        round(graft.functions.VectorExpressions.sortedJaccard(col("ph"), col("h0")), 6).as("jac"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("jac").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("doc_id"), col("jac"))
  }

  /** C44 — reciprocal-rank fusion of the lexical (C42 BM25) and dense
    * (C6 embedding k-NN) rankings — the hybrid-search combiner
    * (Cormack et al. SIGIR'09: score = Σ 1/(60+rank), robust to the two
    * systems' incomparable score scales because only RANKS enter). Exact
    * integer ppm: each contribution is 10⁶ div (60+rank), absent-in-list
    * contributes 0 and reports rank −1. Embeddings row i is taken as the
    * embedding of document i (the synthetic tables are aligned by id) —
    * the join is doc_id = vec_id.
    *
    * Scale shape: both inputs are top-k lists — k-row tables regardless
    * of corpus size — so the fusion itself (full outer join + re-rank) is
    * a driver-trivial operation; ALL the data-scale work lives in the two
    * upstream retrievals, which keep their own audited plans. This is the
    * right decomposition at 100 TB: fuse ranked heads, never raw scores
    * over the corpus.
    */
  def rankFusion(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val lexical = bm25(spark, dir, k = k)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score_ppm").desc, col("doc_id"))).as("bm25_rk"))
    val dense = Ann.bruteForceTopK(spark, dir, nQueries = 1, k = k)
      .select(col("neighbor_id").as("doc_id"), col("rk").as("ann_rk"))
    lexical.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("bm25_rk"), lit(-1)).as("bm25_rk"),
        coalesce(col("ann_rk"), lit(-1)).as("ann_rk"),
        (when(col("bm25_rk").isNotNull, expr("1000000L div (60 + bm25_rk)")).otherwise(0L) +
          when(col("ann_rk").isNotNull, expr("1000000L div (60 + ann_rk)")).otherwise(0L))
          .as("rrf_ppm"))
      .withColumn("fused_rk", row_number().over(
        Window.orderBy(col("rrf_ppm").desc, col("doc_id"))))
  }
}
