package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Corpus-curation operators a large-scale training-data pipeline needs on
  * top of pairwise dedup (SURVEY.md §2C, round 2).
  *
  * Pangool has no analogue — these are the Spark-era additions; the closest
  * reference shape is iterative MapReduce jobs like
  * examples/.../GameOfLife.java (driver-side loop over full passes).
  */
object Curation {

  /** Connected components by iterative min-label propagation over an edge
    * list: every node ends up labeled with the smallest node id reachable
    * from it. One hop of propagation per iteration → converges in
    * O(component diameter) passes; near-dup graphs are unions of small
    * dense clusters, so diameter is tiny. Each pass is a shuffle-join on
    * dst + a groupBy min — no driver-side graph state, and the lineage is
    * cut per pass with localCheckpoint so plans don't grow with iterations.
    *
    * At 100 TB-corpus scale (billions of nodes, path-shaped adversarial
    * components) the O(log n) large-star/small-star variant [Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"] replaces this loop;
    * the per-pass dataflow (join + min-agg) is identical.
    *
    * Convergence probe: labels only ever decrease, so the global sum is a
    * strictly-decreasing monotone — one scalar agg per pass, no diff join.
    */
  /** Strategy dispatch: a few rounds of min-label propagation first — on the
    * graphs dedup actually produces (unions of small dense clusters,
    * diameter 2–3) it converges immediately and is ~1.5× cheaper per round
    * than star contraction (measured 1.7 s vs 2.6 s at sf0.1) — then, if
    * unconverged (deep components), finish with the O(log n)
    * large-star/small-star contraction on the QUOTIENT graph (edges mapped
    * through the partial labels, collapsed components dropped), composing
    * the star roots back over the propagate labels. The fallback is what
    * makes this safe at 100 TB: an adversarial path component costs
    * O(log n) star rounds on a graph that propagation already shrank,
    * instead of O(n) propagation rounds — and the common-case cliques never
    * reach the star loop at all.
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 60): DataFrame = {
    // Materialize ONE symmetric edge table before anything branches. The
    // edge plan is the caller's whole upstream pipeline (for dedupCluster,
    // the full MinHash-LSH verify); the fallback path used to rebuild from
    // that raw plan — recomputing the pipeline twice more (working edge
    // set + node set), a measured 72→322 s cliff at sf10 the first time a
    // component's diameter pushed past the propagate budget. r19-opt: the
    // former shape paid TWO materialization barriers (raw e0 checkpoint,
    // then propagate's symmetrized union checkpointed on top of it); the
    // explode emits both directions in a single narrow scan of the
    // upstream plan, so the pipeline runs exactly once and the working
    // (symmetric) set is the only one stored. The star fallback's quotient
    // maps these rows through the labels — its parallel duplicates die in
    // the existing distinct, and star is multiplicity-insensitive.
    val und = edges.select(col(src).as("u"), col(dst).as("v"))
      .select(explode(array(struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint()
    val (labels, converged) = propagateRoundsSym(und, rounds = 4)
    if (converged) labels
    else {
      // CONTRACT the graph through the partial labels instead of re-running
      // star over the full edge list (+shortcuts), which made the fallback
      // pay per-round cost proportional to |E| — the measured 12.3× sf10
      // residual on q_dedup_cluster. Map each endpoint to its propagate
      // label and drop now-internal (self-loop) edges: after 4 propagate
      // rounds every component of diameter ≤ 4 — the LSH-clique common
      // case — has fully collapsed and VANISHES from the quotient, so
      // star-contraction runs only on the deep components' label graph.
      // Exactness: a component-minimum node's propagate label is itself
      // (min-labels never decrease), so the quotient's component minima ARE
      // the original minima and final(id) = starRoot(label(id)); labels
      // absent from the quotient (collapsed components) keep their
      // propagate label via the left join.
      val lu = labels.select(col("id").as("u"), col("label").as("lu"))
      val lv = labels.select(col("id").as("v"), col("label").as("lv"))
      val quotient = und.join(lu, "u").join(lv, "v")
        .select(col("lu").as("u"), col("lv").as("v"))
        .where(col("u") =!= col("v"))
        .distinct() // parallel edges collapse before the first star groupBy
      val roots = connectedComponentsStar(quotient, "u", "v", maxIter)
        .select(col("id").as("label"), col("label").as("root"))
      labels.join(roots, Seq("label"), "left")
        .select(col("id"), coalesce(col("root"), col("label")).as("label"))
    }
  }

  /** Connected components by alternating large-star/small-star contraction
    * [Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14] — O(log n) rounds even on adversarial path graphs, vs
    * O(diameter) for [[connectedComponentsPropagate]]. This is the 100 TB
    * default: a billion-node path component converges in ~30 rounds here vs
    * a billion rounds of propagation.
    *
    * Per round (2 shuffles, no distinct — the groupBy's collect_set dedups
    * the emitted multi-edges for free):
    *   large-star: group the symmetric edge list by u; with
    *     m = min(Γ(u) ∪ {u}), emit (v, m) for every neighbor v > u.
    *   small-star: group canonical (big, small) edges by the big end; with
    *     m = min(Γ⁻(u) ∪ {u}) = array_min, emit (v, m) for every
    *     v ∈ Γ⁻(u) ∪ {u}, v ≠ m.
    * At the fixed point every edge is (node, component-min) — a star. The
    * convergence probe is a set checksum (count + sum of xxhash64) on the
    * per-round localCheckpoint, so each round costs exactly one job.
    *
    * Output schema/semantics match [[connectedComponentsPropagate]]: one row
    * per distinct endpoint in the input, labeled with the smallest reachable
    * node id (self-loop edges yield self-labeled singletons).
    */
  def connectedComponentsStar(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 60): DataFrame = {
    // One materialization of the argument: the node set and the working
    // edge set both scan it, and callers pass arbitrarily expensive plans.
    // (nodes must come from the UNFILTERED list — self-loops carry
    // singleton endpoints — which is why it can't derive from `e`.)
    val e0 = edges.select(col(src).as("u"), col(dst).as("v")).localCheckpoint()
    val nodes = e0.select(col("u").as("id"))
      .union(e0.select(col("v").as("id"))).distinct()
    var e = e0.where(col("u") =!= col("v"))
      .localCheckpoint()
    // (count, hash-sum) set checksum: labels-only probes can't see edge-set
    // churn between rounds, this can
    def checksum(df: DataFrame): (Long, String) = {
      // decimal sum: full-range long hashes would overflow an ANSI long sum
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(20,0)"))).first()
      (r.getLong(0), String.valueOf(r.get(1)))
    }
    var prev = checksum(e)
    var converged = prev._1 == 0L
    var i = 0
    while (!converged && i < maxIter) {
      // large-star over the symmetric neighborhood
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val large = sym.groupBy("u").agg(collect_set("v").as("nbrs"))
        .select(col("u"), least(col("u"), array_min(col("nbrs"))).as("m"),
          explode(filter(col("nbrs"), n => n > col("u"))).as("vv"))
        .select(col("vv").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
      // small-star over canonical (big end, small end) edges
      val can = large.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      e = can.groupBy("u").agg(collect_set("v").as("nbrs"))
        .select(col("u"), array_min(col("nbrs")).as("m"), col("nbrs"))
        .select(col("m"),
          explode(concat(filter(col("nbrs"), n => n > col("m")), array(col("u")))).as("vv"))
        .select(col("vv").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .localCheckpoint(false) // lazy: the checksum action materializes it
      val s = checksum(e)
      converged = s == prev
      prev = s
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponentsStar stopped at maxIter=$maxIter before the " +
          "fixed point; labels may not be component minima")
    // Distinct-per-node edges are only guaranteed AT the fixed point; if the
    // loop exhausted maxIter first, collapse (node, min label) so the final
    // left join can't fan out duplicate rows per id.
    val lbls = e.groupBy(col("u").as("id")).agg(min(col("v")).as("lbl"))
    nodes.join(lbls, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("label"))
  }

  /** O(diameter) min-label propagation — the simple twin for
    * property-testing [[connectedComponentsStar]] and for graphs known to
    * have tiny diameter where per-round cost matters more than round count.
    */
  def connectedComponentsPropagate(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 25): DataFrame =
    propagateRounds(edges, src, dst, maxIter)._1

  private def propagateRounds(edges: DataFrame, src: String, dst: String,
      rounds: Int): (DataFrame, Boolean) =
    propagateRoundsSym(
      edges.select(col(src).as("u"), col(dst).as("v"))
        .select(explode(array(struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .localCheckpoint(),
      rounds)

  /** The propagate loop over an ALREADY-SYMMETRIZED AND MATERIALIZED
    * (u, v) edge table — [[connectedComponents]] passes its one
    * checkpointed working set straight in (the former path checkpointed
    * the raw list and the symmetrized union separately: two
    * materialization barriers for one working set).
    */
  private def propagateRoundsSym(und0: DataFrame,
      rounds: Int): (DataFrame, Boolean) = {
    val und = und0.select(col("u").as("src"), col("v").as("dst"))
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false) // lazy: the fused probe below materializes it
    def labelSum(df: DataFrame): Long = // empty frame sums to null → 0
      df.agg(coalesce(sum("label"), lit(0L))).first().getLong(0)
    // one fused (count, sum) probe instead of isEmpty + labelSum — each
    // scalar agg here is a full job at local scheduling granularity
    val init = labels.agg(count(lit(1)), coalesce(sum("label"), lit(0L))).first()
    var prevSum = init.getLong(1)
    var converged = init.getLong(0) == 0L
    var i = 0
    while (!converged && i < rounds) {
      val nbrMin = und.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy("src").agg(min("label").as("nmin"))
        .withColumnRenamed("src", "id")
      // lazy checkpoint: the convergence probe's action below materializes
      // it, so each pass costs ONE job (eager would run a second)
      labels = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(false)
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    (labels, converged)
  }

  /** Near-dup CLUSTERS: MinHash-LSH pairs ([[Dedup.minhashLsh]]) closed
    * under transitivity — the deliverable of a dedup pipeline is "keep one
    * doc per cluster", not the raw pair list. Output: every doc that appears
    * in at least one near-dup pair, labeled with its cluster id (= smallest
    * doc_id in the component, i.e. the canonical keeper).
    */
  def dedupCluster(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    connectedComponents(
      Dedup.minhashLsh(spark, dir, threshold).select(col("d1"), col("d2")),
      "d1", "d2")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))

  /** C32 — canonical-document selection, the dedup pipeline's final
    * verdict: near-dup clusters ([[dedupCluster]]) composed with a quality
    * signal — within each cluster the doc with the MOST WORDS wins (ties →
    * smaller doc_id), everything else drops. A min-id keeper
    * ([[graft.operators.Dedup.exact]]'s rule) discards the best-written
    * copy whenever a longer variant exists; production curation keeps by
    * quality. Emits one row per clustered doc: cluster id, word count,
    * keep verdict.
    *
    * Scale shape: adds to the cluster computation one doc_id-keyed join
    * against a narrow word-count scan and ONE window exchange keyed by
    * cluster id over only the clustered docs (near-dup members, a small
    * fraction of the corpus).
    */
  def dedupKeepBest(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long").as("n_words"))
    val w = Window.partitionBy("cluster_id").orderBy(col("n_words").desc, col("doc_id"))
    dedupCluster(spark, dir, threshold)
      .join(words, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("n_words"), col("keep"))
  }

  /** C40 — the end-to-end curation verdict (q_curate_pipeline): the
    * composed filter-then-dedup pipeline every corpus build runs —
    * (1) the C26 quality cascade gates the raw corpus (cheap narrow scan
    * first, so the expensive pairing never sees rejected docs — the
    * standard pipeline order), (2) MinHash-LSH near-dup clusters are
    * computed over the SURVIVORS ONLY, (3) each cluster keeps its
    * most-words member (C32's rule), singleton survivors keep themselves.
    * One row per surviving doc: (doc_id, cluster_id, n_words, keep);
    * `keep = true` IS the curated corpus.
    *
    * Scale shape: the gate rides the ingest scan; the LSH pairing costs
    * what C2 costs on the (smaller) gated corpus; the keep-best window
    * runs ONLY over clustered docs (one cluster-keyed exchange over the
    * near-dup fraction), while singletons take the anti-join branch with
    * no window at all — the full-corpus window a naive single-branch
    * formulation would pay is exactly what this split avoids at 100 TB.
    * The survivor id+word table localCheckpoints once and serves the
    * semi-join, the keep-best join and the singleton anti-join.
    */
  def curatePipeline(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val survivors = Quality.qualityFilterOn(docs).where(col("keep"))
      .select(col("doc_id"), col("n_words"))
      .localCheckpoint(false)
    val gated = docs.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi")
    val clusters = connectedComponents(
      Dedup.minhashLshOf(gated, threshold).select(col("d1"), col("d2")),
      "d1", "d2")
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    val w = Window.partitionBy("cluster_id").orderBy(col("n_words").desc, col("doc_id"))
    val clustered = clusters.join(survivors, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("n_words"), col("keep"))
    val singles = survivors.join(clusters, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"), col("n_words"),
        lit(true).as("keep"))
    clustered.unionByName(singles)
  }

  /** Deterministic train/val/test split (8/1/1) by a salted content-id hash
    * — the standard leak-proof way to split a corpus: membership is a pure
    * function of the id (stable across runs, machines and engines — the
    * md5-prefix hash is the same engine-portable construction the dedup
    * oracles use), no shuffle, no RNG state.
    */
  /** The 0–9 split bucket of a doc id — the salted md5-prefix hash shared
    * by [[hashSplit]] (the declared query) and [[trainingBatchesSorted]]
    * (which gates on it INLINE instead of semi-joining a second documents
    * scan; membership is a pure function of the id, so the filter form is
    * value-identical).
    */
  private[graft] def splitBucket(docId: Column): Column = pmod(
    conv(substring(md5(concat(lit("split:"), docId.cast("string"))), 1, 15), 16, 10)
      .cast("long"),
    lit(10))

  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), splitBucket(col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("source"), col("split"))
  }

  /** C47 — seeded deterministic global shuffle: the training-order
    * assignment every epoch of a data pipeline needs. Each doc's sort key
    * is the salted md5-prefix hash of (seed, doc_id) — the same
    * engine-portable construction as [[hashSplit]] — so the permutation is
    * a pure function of (seed, id): stable across runs, machines, engines,
    * and resumable mid-epoch. Different seed → independent permutation.
    *
    * The contiguous position is stamped WITHOUT a single-partition window
    * (the naive row_number() OVER (ORDER BY ...) serializes the corpus
    * through one task — the textbook scale-killer): range-partition by the
    * key (the global sort Spark already does distributively), then
    * zipWithIndex adds per-partition offsets with one extra count-only
    * job — the sorted frame is localCheckpointed first so that count pass
    * reads the materialized partitions instead of re-running the
    * range-shuffle sort (two full sorts of a 100 TB corpus otherwise; the
    * checkpoint holds only the 16-byte (doc_id, skey) projection).
    * RDD zipWithIndex is the justified mapPartitions-tier escape:
    * no builtin computes a contiguous global index distributively
    * (monotonically_increasing_id leaves gaps). Range boundaries may vary
    * with sampling, but the TOTAL order (skey, doc_id) doesn't — pos is
    * deterministic regardless of partitioning.
    */
  /** C48 — the training-data emission END-TO-END: curate (C40's
    * quality-gate + near-dup keep-best) → leak-proof train split (C14's
    * salted id hash) → epoch shuffle order (C47's seeded permutation) →
    * pack into maxLen-token sequences with GLOBAL batch positions. Every
    * stage is the exact-integer construction its standalone query uses, so
    * the whole composition has a full SQL oracle — this is the query that
    * proves the stages CHAIN, the way q_curate_pipeline proved the
    * curation side.
    *
    * Scale shape: no new exchange beyond the stages' own. Curate/split
    * gates are semi-joins on doc_id; skey/tokens are narrow; the single
    * new shuffle is C47's range-partition by (skey, doc_id). Global `pos`
    * AND global token `offset` come from ONE two-pass distributed prefix
    * sum over the localCheckpointed sorted partitions (per-partition
    * (count, token-total) → driver scan of #partitions pairs → stamping
    * pass) — the textbook scan algorithm, same justified mapPartitions
    * tier as C47's zipWithIndex, where a global window would serialize
    * the epoch through one task. Offsets are a pure function of the
    * (skey, doc_id) TOTAL order, so the result is partitioning-independent.
    */
  /** The declarative stage chain of [[trainingBatches]] UP TO the
    * checkpoint boundary — exposed so specs can pin the executed plan
    * (after the localCheckpoint the composition is a LogicalRDD and any
    * plan assertion would be vacuously inspecting an empty lineage; the
    * stamping passes that follow are windowless RDD maps by construction).
    */
  private[graft] def trainingBatchesSorted(spark: SparkSession, dir: String,
      seed: String = "epoch0"): DataFrame = {
    val curated = curatePipeline(spark, dir).where(col("keep")).select("doc_id")
    val skey = conv(substring(md5(
        concat(lit(s"shuffle:$seed:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    Tables.documents(spark, dir)
      .join(curated, Seq("doc_id"), "left_semi")
      // train membership is a pure function of doc_id ([[splitBucket]] < 8
      // ≡ hashSplit's split = 'train'): gate inline on the scan instead of
      // semi-joining a SECOND full documents pass (guide §2.1 — one fewer
      // corpus scan and one fewer exchange at any scale; value-identical)
      .where(splitBucket(col("doc_id")) < 8)
      .select(col("doc_id"), skey.as("skey"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .repartitionByRange(col("skey"), col("doc_id"))
      .sortWithinPartitions("skey", "doc_id")
  }

  def trainingBatches(spark: SparkSession, dir: String, seed: String = "epoch0",
      maxLen: Int = 512): DataFrame = {
    val sorted = trainingBatchesSorted(spark, dir, seed)
      .localCheckpoint(false) // lazy: the count pass below materializes it
    val rdd = sorted.rdd
    // pass 1: per-partition (row count, token total) — #partitions pairs
    // to the driver, bounded by cluster size not data size
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var rows = 0L; var toks = 0L
      it.foreach { r => rows += 1; toks += r.getLong(2) }
      Iterator((i, rows, toks))
    }.collect().sortBy(_._1)
    val posBase = totals.scanLeft(0L)(_ + _._2).init
    val offBase = totals.scanLeft(0L)(_ + _._3).init
    // pass 2: stamp positions/offsets off the checkpointed partitions
    val stamped = rdd.mapPartitionsWithIndex { (i, it) =>
      var pos = posBase(i); var off = offBase(i)
      it.map { r =>
        val out = (r.getLong(0), pos, r.getLong(2), off)
        pos += 1; off += r.getLong(2)
        out
      }
    }
    spark.createDataFrame(stamped).toDF("doc_id", "pos", "n_tokens", "offset")
      .select(col("doc_id"), col("pos"), col("n_tokens"), col("offset"),
        expr(s"offset div $maxLen").as("seq_first"),
        expr(s"(offset + n_tokens - 1) div $maxLen").as("seq_last"),
        (col("offset") % maxLen).as("offset_in_seq"))
  }

  def shuffleOrder(spark: SparkSession, dir: String, seed: String = "epoch0"): DataFrame = {
    val skey = conv(substring(md5(
        concat(lit(s"shuffle:$seed:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val keyed = Tables.documents(spark, dir).select(col("doc_id"), skey.as("skey"))
    val sorted = keyed
      .repartitionByRange(col("skey"), col("doc_id"))
      .sortWithinPartitions("skey", "doc_id")
      .localCheckpoint(false) // lazy: the count pass below materializes it
    val stamped = sorted.rdd.zipWithIndex.map { case (r, i) => (r.getLong(0), i) }
    spark.createDataFrame(stamped).toDF("doc_id", "pos")
  }

  /** TF-IDF top terms per document, in EXACT integer arithmetic:
    * score = tf · 10⁶ · N / (|d| · df) with integer (floor) division, so
    * both engines produce bit-identical scores (no log, no FP accumulation
    * — see graft-parity rules on cross-engine rounding divergence).
    * Plan shape: the corpus is scanned and exploded ONCE into the compact
    * (doc, word, tf) aggregate; |d| and df are WINDOW sums over that table
    * (joins back to re-derived aggregates would re-scan the raw text — Spark
    * can't reuse the subtrees because each consumer prunes them differently;
    * measured as 3 extra corpus scans). Everything after the first shuffle
    * moves only the tf triples, never text. N broadcasts from a count-only
    * scan (no columns read). The final per-doc top-N window rides the same
    * doc_id partitioning as the |d| window (sort, no extra exchange) and
    * gets WindowGroupLimit partial pruning from the rank filter.
    */
  def tfidf(spark: SparkSession, dir: String, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val ndocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
      .withColumn("dlen", sum("tf").over(Window.partitionBy("doc_id")))
      .crossJoin(broadcast(ndocs))
      .select(col("doc_id"), col("word"),
        expr("(tf * 1000000 * n_docs) div (dlen * df)").as("tfidf_scaled"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf_scaled").desc, col("word").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= topN)
      .select(col("doc_id"), col("rk"), col("word"), col("tfidf_scaled"))
  }

  /** Revenue per supplier through [[Skew.saltedJoin]] — row-level results
    * are identical to the plain equi-join (the oracle IS the plain join),
    * while the hot-key fact rows spread over `salts` reducers. The dim side
    * after explode is still dim-sized×salts, so Catalyst broadcasts it and
    * the fact side never shuffles at all.
    */
  def saltedSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    // revenue accumulates EXACTLY (integer 1e-4 units through
    // SumCentsExact — order-independent like the decimal form it
    // replaced, but on the codegen long fast path). The double-sum form
    // diverged from the oracle by one cent at sf1 (per-supplier groups
    // grew to ~600 rows → partial-agg order 1-ulp drift landed on a cent
    // boundary for 1 of 10k suppliers).
    val li = Tables.lineitem(spark, dir).select(col("l_suppkey"),
      ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    Skew.saltedJoin(li, sup, "l_suppkey", salts = 8)
      .groupBy("s_name")
      .agg(ExactMoney.sumUnits4Col(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** Deterministic uniform sample WITHOUT replacement: rank by a salted
    * engine-portable hash and keep the k smallest — reproducible across
    * runs/engines (unlike TABLESAMPLE/rand), and the plan is
    * TakeOrderedAndProject: per-partition bounded top-k then a k-row merge,
    * never a global sort — the only sane "give me a 50-doc sample of
    * 100 TB" shape.
    */
  def hashSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val h = conv(substring(md5(concat(lit("sample:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), h.as("h"))
      .orderBy(col("h"))
      .limit(k)
      .select(col("doc_id"), col("source"))
  }

  /** Sorted-vocabulary listagg per source: collect_set + array_sort +
    * array_join is the order-deterministic (hence oracle-checkable) form of
    * list aggregation — the Spark twin of DuckDB's
    * `string_agg(DISTINCT w, ',' ORDER BY w)`.
    */
  def vocabPerSource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("source")
      .agg(array_sort(collect_set(col("word"))).as("ws"))
      .select(col("source"), array_join(col("ws"), ",").as("vocab"),
        size(col("ws")).cast("long").as("n_vocab"))

  /** Token-budget sequence packing — the concat-and-chunk layout LLM
    * training pipelines use to fill fixed-length sequences: documents are
    * concatenated in a deterministic order and split at exact `maxLen`
    * token boundaries (a doc may span sequences). Emits, per doc, the
    * global token offset within its shard and the first/last sequence ids
    * it lands in.
    *
    * Sharding is a pure salted-hash function of doc_id (same portable
    * md5-prefix construction as [[hashSplit]]), so packing is reproducible
    * across runs and engines with no RNG. Shards are the parallelism unit:
    * one shuffle keyed by shard, then a single window cumulative sum —
    * at 100 TB you'd set `shards` ≈ output-file count (thousands), keeping
    * every partition independent and the window per-shard-sequential but
    * cross-shard parallel.
    */
  def packSequences(spark: SparkSession, dir: String, maxLen: Int = 512,
      shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(
      conv(substring(md5(concat(lit("pack:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long"),
      lit(shards))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), shard.as("shard"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("offset"),
        expr(s"offset div $maxLen").as("seq_first"),
        expr(s"(offset + n_tokens - 1) div $maxLen").as("seq_last"),
        (col("offset") % maxLen).as("offset_in_seq"))
  }

  /** C46 — sliding-window chunking with overlap, the RAG-index prep stage
    * (the retrieval-side complement of [[packSequences]]: packing builds
    * training batches across docs, chunking splits each doc into
    * overlapping retrieval units that never cross doc boundaries). Chunk
    * starts step by `stride` (< `size` → overlap keeps boundary context
    * retrievable); chunk count = 1 + max(0, ceil((n−size)/stride)) so a
    * short doc is exactly one chunk and the final partial chunk is kept.
    * The negative-numerator corner runs INSIDE greatest(0, ·) — Spark
    * `div` truncates while DuckDB `//` floors, and the guard makes both
    * land on 0 (documented cross-engine corner).
    *
    * Scale shape: pure narrow fan-out (tokenize → bounded sequence
    * explode → slice), zero shuffles; output rows ≈ corpus tokens/stride,
    * each chunk O(size) — the shape that feeds C41/C42/C6 indexing
    * downstream.
    */
  def chunkOverlap(spark: SparkSession, dir: String,
      size: Int = 16, stride: Int = 12): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.TextHash.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        org.apache.spark.sql.functions.size(col("toks")).as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"), explode(sequence(lit(0),
        greatest(lit(0), expr(s"((n - $size) + ${stride - 1}) div $stride")))).as("ci"))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
        (col("ci") * stride).cast("long").as("start_tok"),
        expr(s"concat_ws(' ', slice(toks, ci * $stride + 1, $size))").as("chunk_text"),
        least(lit(size), col("n") - col("ci") * stride).cast("long").as("chunk_tokens"))

  /** Deterministic mixture resampling: downsample each domain (source) to a
    * target rate — how a curation pipeline rebalances a crawl toward the
    * desired training mixture. Rates are integer parts-per-million;
    * membership is the salted md5-prefix hash of doc_id (the same
    * leak-proof device as [[hashSplit]]: a pure function of the id, no RNG
    * state, identical on any engine). The demo policy keeps source index
    * i at rate 1/(1 + i mod 4), halved again for non-English docs — a
    * stand-in for the quality/language-aware mixture weights a real
    * pipeline derives upstream.
    *
    * Scale shape: one narrow scan, zero shuffles — acceptance is per-row
    * arithmetic, so this composes with any downstream op at 100 TB for
    * free (and the sampled fraction is exact in expectation per domain,
    * independent of partitioning).
    */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    // div, not "/": Spark's / on integers is double division
    val ratePm = expr("1000000 div (1 + CAST(substring(source, 4, 10) AS BIGINT) % 4)")
    val eff = when(col("lang") === "en", ratePm).otherwise(expr(
      "(1000000 div (1 + CAST(substring(source, 4, 10) AS BIGINT) % 4)) div 2"))
    val h = pmod(
      conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("long"),
      lit(1000000L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), h.as("h"), eff.as("rate_pm"))
      .where(col("h") < col("rate_pm"))
      .select(col("doc_id"), col("source"), col("lang"), col("rate_pm"))
  }

  /** C38 — DSIR-style importance weights [Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023]: score every
    * document by how target-like its HASHED n-gram feature distribution is
    * relative to the raw corpus. Features are bigrams hashed into a FIXED
    * number of buckets (the paper's 10⁴-bucket hashed n-gram model) — the
    * published reason the method scales: both distribution models are
    * `buckets`-row tables no matter the corpus size. Target = lang='en'
    * documents, raw = the whole corpus; per-bucket ratio with add-1
    * smoothing, in EXACT integer ppm ((c_tgt+1)·10⁶ div (c_raw+1)), and
    * the per-doc weight is the floor-mean of that ratio over the doc's
    * bigram occurrences — ratio-of-counts instead of the paper's
    * sum-of-log-ratios, so both engines compute bit-identical integers (no
    * log, no FP accumulation; the ranking it induces is the same
    * "target-like up, raw-like down" signal). Documents with <2 tokens
    * carry no bigram evidence and are excluded (the q_lm_score convention).
    *
    * Plan shape (the q_lm_score train+score lesson, measured at sf10):
    * TRAIN scan fans bigram occurrences straight into the bucket agg —
    * map-side combine collapses every task to ≤`buckets` partials, so the
    * only train shuffle is model-sized (one agg carries BOTH corpus
    * counters; lang rides the scan, no join). SCORE re-derives the
    * occurrences with a second narrow scan (re-deriving beat materializing
    * the occurrence table at sf10) and joins the BROADCAST model — at
    * 100 TB the model is still `buckets` rows; the corpus never shuffles
    * except the map-side-combined per-doc agg.
    */
  def dsirWeight(spark: SparkSession, dir: String, buckets: Int = 4096,
      targetLang: String = "en"): DataFrame = {
    // per-position bigram bucket ids in ONE fused pass (ShingleHashN n=2,
    // mod=buckets: space-joined shingle → hash60 % buckets — the same value
    // the composed concat→md5→conv→pmod column chain produces, without the
    // per-occurrence hex-string round-trip; null = <2 tokens, the
    // no-bigram-evidence exclusion). Composed form measured 15.8 s at sf1
    // vs 6.6 s fused — the md5 expression chain WAS the query.
    def occ = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        graft.functions.VectorExpressions.shingleHashN(
          graft.functions.TextHash.tokens(col("text")), 2, buckets.toLong,
          distinct = false).as("hs"))
      .where(col("hs").isNotNull)
      .select(col("doc_id"), col("lang"), explode(col("hs")).as("b"))
    val model = occ.groupBy(col("b"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("c_tgt"))
      .select(col("b"), expr("(c_tgt + 1L) * 1000000L div (c_raw + 1L)").as("r_ppm"))
    occ.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(r_ppm) div count(1)").as("dsir_ppm"))
  }

  /** C38b — DSIR importance RESAMPLING: accept each document with
    * probability proportional to its [[dsirWeight]] score, deterministically
    * — the same salted portable-hash acceptance rule as [[domainMix]]
    * (accept iff hash60("dsir:"+doc_id) mod 10⁶ < dsir_ppm), so the sampled
    * corpus is reproducible and oracle-checkable rather than RNG-dependent.
    * dsir_ppm is already a ppm-scaled ratio whose corpus-wide mean is ~10⁶·
    * P(target)/1 — docs far above the raw distribution's target share are
    * kept with certainty, raw-typical docs are thinned proportionally.
    * Output is the accepted set with its weight (audit columns kept).
    */
  def dsirResample(spark: SparkSession, dir: String, buckets: Int = 4096,
      targetLang: String = "en"): DataFrame = {
    val h = pmod(graft.functions.TextHash.hash60(
      concat(lit("dsir:"), col("doc_id").cast("string"))), lit(1000000L))
    dsirWeight(spark, dir, buckets, targetLang)
      .where(h < col("dsir_ppm"))
      .select(col("doc_id"), col("n_bigrams"), col("dsir_ppm"))
  }
}
