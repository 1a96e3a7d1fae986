package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ composition (SURVEY.md §2 C7d) — the standard billion-scale ANN
  * layout [Jégou et al., PQ for Nearest Neighbor Search, §V]: the corpus is
  * partitioned by the IVF coarse quantizer AND stored as PQ codes, so a
  * query's ADC table scans only its nprobe cells' code lists instead of the
  * full code table — at 100 TB that's the difference between touching
  * nprobe/C of the corpus and all of it, with the same 8-lookup integer ADC
  * per candidate ([[Pq.topK]] scans every code row; [[Ivf.topK]] prunes to
  * cells but pays full dot products on candidates; this does both prunings).
  *
  * Codebooks are the deterministic seed constructions of both parents
  * (iters=0: raw first-C / first-K vectors, zero FP accumulation), so the
  * whole pipeline — assignment, codes, probe list, ADC sums, ranking —
  * hash-matches the DuckDB re-derivation exactly, like C7b/C7c.
  *
  * Codes quantize the RAW vector, not the per-cell residual (FAISS's
  * by_residual refinement): residuals would buy finer per-cell resolution
  * at the cost of a per-row centroid subtraction in the encode kernel —
  * the documented next refinement, not needed for the pruning economics.
  */
object IvfPq {

  /** Residual variant (FAISS by_residual, the production IVF-PQ layout):
    * PQ quantizes r = e − centroid(cell) instead of e, so each cell's
    * sub-codebooks only span the cell's local spread — finer resolution
    * from the same 8 bytes. The query's ADC table is PER PROBED CELL
    * (residual w.r.t. that cell's centroid), matching the candidates'
    * encoding cell by construction.
    *
    * Determinism: the residual codebook seeds from vectors K..2K−1 — the
    * first K ARE the IVF centroids (their residuals are exactly zero, a
    * degenerate codebook), the next K give real per-cell offsets with zero
    * FP accumulation, so the whole pipeline oracle-checks like the raw
    * variant. The per-row centroid subtraction is [[graft.functions
    * .SubCentroid]]; its Scala twin below reproduces the plan's assignment
    * arithmetic exactly (left-to-right dots, |e|²−2e·c+|c|², ties → lower
    * cid) to derive the seed residuals driver-side.
    */
  /** The deterministic residual model every residual variant shares: IVF
    * centroids = first c vectors; residual PQ seeds = vectors K..2K−1 minus
    * their assigned centroid (Scala twin of Ivf.nearestCid's arithmetic —
    * same FP op order — so the derivation matches the plan's assignment).
    */
  private[operators] case class ResModel(seeds: Array[Array[Double]],
      centroids: Seq[(Int, Seq[Double])], cenFlat: Array[Double],
      cenR: IndexedSeq[IndexedSeq[Seq[Double]]], dim: Int)

  private[operators] def resModel(spark: SparkSession, dir: String, c: Int): ResModel =
    resModelOn(Ann.normed(spark, dir), c)

  /** [[resModel]] over a pre-[[Ann.normedOf]]'d frame (must contain seed
    * vec_ids 0..max(c, 2·Ksub)−1 — what [[AnnIndex.buildOn]] requires of
    * its initial corpus).
    */
  private[operators] def resModelOn(normed: DataFrame, c: Int): ResModel = {
    val seeds = normed.select(col("vec_id"), col("e"))
      .where(col("vec_id") < math.max(c, 2 * Pq.Ksub)).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    require(seeds.length == math.max(c, 2 * Pq.Ksub),
      s"residual model needs seed vec_ids 0..${math.max(c, 2 * Pq.Ksub) - 1} " +
        s"in the corpus frame; found ${seeds.length} " +
        "(AnnIndex.buildOn requires the initial corpus to contain the seed id range)")
    val centroids: Seq[(Int, Seq[Double])] =
      seeds.take(c).zipWithIndex.map { case (e, i) => (i, e.toSeq) }.toSeq
    val cenFlat = seeds.take(c).flatten.toArray
    def dotLR(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cidOf(e: Array[Double]): Int = {
      var best = Double.PositiveInfinity; var bestC = 0
      for (ci <- 0 until c) {
        val ce = seeds(ci)
        val d = dotLR(e, e) - 2.0 * dotLR(e, ce) + ce.map(x => x * x).sum
        if (d < best) { best = d; bestC = ci }
      }
      bestC
    }
    val resSeeds = seeds.slice(Pq.Ksub, 2 * Pq.Ksub).map { e =>
      val ce = seeds(cidOf(e))
      e.indices.map(i => e(i) - ce(i))
    }
    val cenR = (0 until Pq.M).map(m => resSeeds.toIndexedSeq
      .map(_.slice(m * Pq.Dsub, (m + 1) * Pq.Dsub): Seq[Double]))
    ResModel(seeds, centroids, cenFlat, cenR, seeds.head.length)
  }

  def topKResidual(spark: SparkSession, dir: String, nQueries: Int = 20, k: Int = 5,
      c: Int = 16, nprobe: Int = 4): DataFrame = {
    val idx = residualIndex(spark, dir, c, materialize = false)
    val queries = Ann.normed(spark, dir).where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    searchResidual(idx, queries, k, nprobe)
  }

  /** A built residual index for [[AnnIndex]]-style serving: the model
    * artifact plus the (vec_id, cid, codes) corpus table — 8 bytes of
    * codes per vector, the billion-scale storage layout. `materialize`
    * lazily checkpoints the codes table so repeated search batches reuse
    * it; the registered query keeps the un-materialized plan (identical
    * oracle arithmetic either way).
    */
  private[operators] case class ResIndex(mdl: ResModel, corpus: DataFrame)

  private[operators] def residualIndex(spark: SparkSession, dir: String,
      c: Int = 16, materialize: Boolean = true): ResIndex =
    residualIndexOn(Ann.normed(spark, dir), c, materialize)

  private[operators] def residualIndexOn(normed: DataFrame,
      c: Int = 16, materialize: Boolean = true): ResIndex = {
    val mdl = resModelOn(normed, c)
    val corpus = encodeResidual(normed, mdl)
    ResIndex(mdl, if (materialize) corpus.localCheckpoint(false) else corpus)
  }

  /** Frozen-model residual encode of any pre-[[Ann.normedOf]]'d frame to
    * the (vec_id, cid, codes) corpus layout — the build-time corpus pass
    * and the [[AnnIndex.append]] ingest pass are the same arithmetic by
    * construction.
    */
  private[operators] def encodeResidual(normed: DataFrame, mdl: ResModel): DataFrame = {
    val residual = (e: org.apache.spark.sql.Column, cid: org.apache.spark.sql.Column) =>
      graft.functions.VectorExpressions.subCentroid(e, cid, mdl.cenFlat, mdl.dim)
    normed
      .select(col("vec_id"), col("e"), Ivf.nearestCid(col("e"), mdl.centroids).as("cid"))
      .select(col("vec_id"), col("cid"),
        Pq.codesCol(residual(col("e"), col("cid")), mdl.cenR).as("codes"))
  }

  /** Integer-ADC search over a built [[ResIndex]] for ANY broadcast
    * (query_id, qe) batch: nprobe nearest cells per query, per-probed-cell
    * residual distance tables, table-lookup sums over the candidates'
    * codes. Same arithmetic as the registered q_ann_ivfpq_res query
    * (which routes through here with the corpus-row batch).
    * `excludeSelf` must be false for external batches whose query ids may
    * coincide with corpus vec_ids — a colliding id would silently drop a
    * legitimate neighbor.
    */
  private[operators] def searchResidual(idx: ResIndex, queries: DataFrame,
      k: Int = 5, nprobe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    val mdl = idx.mdl
    val residual = (e: org.apache.spark.sql.Column, cid: org.apache.spark.sql.Column) =>
      graft.functions.VectorExpressions.subCentroid(e, cid, mdl.cenFlat, mdl.dim)
    val rq = residual(col("qe"), col("cid"))
    val q = broadcast(queries
      .select(col("query_id"), col("qe"),
        explode(Ivf.probeCids(col("qe"), mdl.centroids, nprobe)).as("cid"))
      // rq materialized in its own projection before the dtab kernel
      // consumes it (the explode-inlining trap from minhash applies)
      .select(col("query_id"), col("cid"), rq.as("rq"))
      .select(col("query_id"), col("cid"),
        Pq.dtabCol(col("rq"), mdl.cenR).as("dtab")))
    val adc = graft.functions.VectorExpressions.adcSum(col("dtab"), col("codes"))
    val scored = q.join(idx.corpus, Seq("cid"))
      .where(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adc.as("adc_scaled"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_scaled").asc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("adc_scaled"))
  }

  /** Per-cell Lloyd refinement of the residual sub-codebooks — FAISS's
    * production layout taken one step further than [[topKResidual]]'s
    * single global residual codebook: each IVF cell trains its OWN M×K
    * sub-codebooks over the residuals of the vectors assigned to it, so
    * the 8 bytes per vector spend their resolution on the cell's local
    * spread only. Seeded per cell from the global residual seed codebook;
    * assignment runs as one fused [[graft.functions.PqEncodeCell]] pass
    * (codebook slab selected by cid per row), update is one shuffle keyed
    * (cid, m, code) whose output — ≤ c·M·K rows of Dsub means — is the
    * collected model artifact, exactly like [[Ivf.train]]. Empty (cell,
    * code) slots keep their previous centroid. Refined centroids are
    * FP-accumulation-order-sensitive (same caveat as Ivf/Pq refinement),
    * so this path is recall-spec'd, not oracle-checked; the registered
    * query stays the deterministic seed construction.
    */
  private[operators] def refineResidualPerCell(spark: SparkSession, dir: String,
      mdl: ResModel, iters: Int): IndexedSeq[IndexedSeq[IndexedSeq[Seq[Double]]]] =
    refineResidualPerCellOn(Ann.normed(spark, dir), mdl, iters)

  /** [[refineResidualPerCell]] over a pre-[[Ann.normedOf]]'d frame. */
  def refineResidualPerCellOn(normed: DataFrame, mdl: ResModel,
      iters: Int): IndexedSeq[IndexedSeq[IndexedSeq[Seq[Double]]]] = {
    val c = mdl.centroids.length
    val v = normed
    // consumed fully by the per-iteration collects below → cache +
    // finally-unpersist (the Ivf.train pattern), never left pinned
    val rows = v
      .select(col("e"), Ivf.nearestCid(col("e"), mdl.centroids).as("cid"))
      .select(col("cid"), graft.functions.VectorExpressions
        .subCentroid(col("e"), col("cid"), mdl.cenFlat, mdl.dim).as("r"))
      .cache()
    try {
      var cells: IndexedSeq[IndexedSeq[IndexedSeq[Seq[Double]]]] =
        IndexedSeq.fill(c)(mdl.cenR)
      for (_ <- 1 to iters) {
        val cenFlat = (for {
          ci <- 0 until c; m <- 0 until Pq.M; kk <- 0 until Pq.Ksub
          d <- 0 until Pq.Dsub
        } yield cells(ci)(m)(kk)(d)).toArray
        val ccFlat = (for { ci <- 0 until c; m <- 0 until Pq.M; kk <- 0 until Pq.Ksub }
          yield cells(ci)(m)(kk).map(x => x * x).sum).toArray
        val updated = rows
          .select(col("cid"), col("r"), graft.functions.VectorExpressions
            .pqEncodeCell(col("r"), col("cid"), cenFlat, ccFlat,
              Pq.M, Pq.Ksub, Pq.Dsub).as("codes"))
          .select(col("cid"), col("r"), posexplode(col("codes")).as(Seq("m", "code")))
          .groupBy(col("cid"), col("m"), col("code"))
          .agg(array((0 until Pq.Dsub).map(d =>
            avg(element_at(col("r"), col("m") * Pq.Dsub + d + 1))): _*).as("cen"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getSeq[Double](3))
          .toMap
        cells = (0 until c).map(ci => (0 until Pq.M).map(m =>
          (0 until Pq.Ksub).map(kk =>
            updated.getOrElse((ci, m, kk), cells(ci)(m)(kk)): Seq[Double])))
      }
      cells
    } finally rows.unpersist(blocking = false)
  }

  /** [[topKResidual]] searching with the per-cell Lloyd-refined residual
    * sub-codebooks. The corpus encode is the fused per-cell kernel; the
    * query side's per-probed-cell ADC tables are computed driver-side from
    * the collected query vectors (bounded by nQueries — the same footing as
    * the codebook seed collects; at scale the query set is a small
    * broadcast workload, never the corpus). Recall-spec'd vs the global
    * residual codebook; not oracle-checked (refined centroids are
    * FP-order-sensitive).
    */
  def topKResidualRefined(spark: SparkSession, dir: String, nQueries: Int = 20,
      k: Int = 5, c: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val mdl = resModel(spark, dir, c)
    val cells = refineResidualPerCell(spark, dir, mdl, iters)
    val corpus = refinedCorpus(spark, dir, mdl, cells)
    // driver-side probe lists + per-cell ADC tables for the bounded query set
    val queries = Ann.normed(spark, dir).where(col("vec_id") < nQueries)
      .select(col("vec_id"), col("e")).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    searchRefined(mdl, cells, corpus, queries, k, nprobe, excludeSelf = true)
  }

  /** Per-cell-refined corpus layout: (vec_id, cid, codes) with codes from
    * the fused [[graft.functions.PqEncodeCell]] kernel over the cell's own
    * sub-codebooks — shared by [[topKResidualRefined]] and the
    * "ivfpq_res_refined" [[AnnIndex]] layout.
    */
  private[operators] def refinedCorpus(spark: SparkSession, dir: String,
      mdl: ResModel, cells: IndexedSeq[IndexedSeq[IndexedSeq[Seq[Double]]]]): DataFrame =
    encodeRefined(Ann.normed(spark, dir), mdl, cells)

  /** Frozen-model per-cell-refined encode of any pre-[[Ann.normedOf]]'d
    * frame — shared by the build-time corpus pass and
    * [[AnnIndex.append]]'s ingest pass.
    */
  private[operators] def encodeRefined(normed: DataFrame,
      mdl: ResModel, cells: IndexedSeq[IndexedSeq[IndexedSeq[Seq[Double]]]]): DataFrame = {
    val cenFlat = (for {
      ci <- cells.indices; m <- 0 until Pq.M; kk <- 0 until Pq.Ksub
      d <- 0 until Pq.Dsub
    } yield cells(ci)(m)(kk)(d)).toArray
    val ccFlat = (for { ci <- cells.indices; m <- 0 until Pq.M; kk <- 0 until Pq.Ksub }
      yield cells(ci)(m)(kk).map(x => x * x).sum).toArray
    normed
      .select(col("vec_id"), col("e"), Ivf.nearestCid(col("e"), mdl.centroids).as("cid"))
      .select(col("vec_id"), col("cid"), graft.functions.VectorExpressions
        .pqEncodeCell(graft.functions.VectorExpressions
          .subCentroid(col("e"), col("cid"), mdl.cenFlat, mdl.dim),
          col("cid"), cenFlat, ccFlat, Pq.M, Pq.Ksub, Pq.Dsub).as("codes"))
  }

  /** ADC search over a per-cell-refined corpus for a COLLECTED query batch
    * (probe lists and per-probed-cell distance tables computed driver-side
    * from the refined codebooks — bounded by the batch size, the same
    * footing as the codebook collects; the corpus side only ever sees the
    * broadcast (query_id, cid, dtab) rows and its own 8-byte codes).
    */
  private[operators] def searchRefined(mdl: ResModel,
      cells: IndexedSeq[IndexedSeq[IndexedSeq[Seq[Double]]]], corpus: DataFrame,
      queries: Array[(Long, Array[Double])], k: Int, nprobe: Int,
      excludeSelf: Boolean): DataFrame = {
    import corpus.sparkSession.implicits._
    def sq(a: Array[Double], ce: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - ce(i); s += d * d; i += 1 }
      s
    }
    val qRows = queries.toSeq.flatMap { case (qid, e) =>
      val probes = mdl.centroids
        .map { case (cid, ce) => (sq(e, ce), cid) }.sorted.take(nprobe)
      probes.map { case (_, cid) =>
        val rq = e.indices.map(i => e(i) - mdl.cenFlat(cid * mdl.dim + i))
        val dtab = (0 until Pq.M).map { m =>
          (0 until Pq.Ksub).map { kk =>
            val cc = cells(cid)(m)(kk)
            var s = 0.0; var d = 0
            while (d < Pq.Dsub) {
              val diff = rq(m * Pq.Dsub + d) - cc(d); s += diff * diff; d += 1
            }
            math.floor(s * 1000000.0).toLong
          }
        }
        (qid, cid, dtab)
      }
    }
    val q = broadcast(qRows.toDF("query_id", "cid", "dtab"))
    val adc = graft.functions.VectorExpressions.adcSum(col("dtab"), col("codes"))
    val scored = q.join(corpus, Seq("cid"))
      .where(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adc.as("adc_scaled"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_scaled").asc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("adc_scaled"))
  }

  /** Top-k by ADC within the query's nprobe nearest IVF cells. */
  def topK(spark: SparkSession, dir: String, nQueries: Int = 20, k: Int = 5,
      c: Int = 16, nprobe: Int = 4): DataFrame = {
    val v = Ann.normed(spark, dir)
    // one seed collect feeds BOTH codebooks (Ivf.train + Pq.codebook would
    // each run the same first-K job; the constructions are identical)
    val seeds = v.select(col("vec_id"), col("e"))
      .where(col("vec_id") < math.max(c, Pq.Ksub)).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1))
    val centroids: Seq[(Int, Seq[Double])] =
      seeds.take(c).zipWithIndex.map { case (e, i) => (i, e) }.toSeq
    val cen = (0 until Pq.M).map(m => seeds.take(Pq.Ksub).toIndexedSeq
      .map(_.slice(m * Pq.Dsub, (m + 1) * Pq.Dsub)))
    // corpus layout: (cell id, PQ codes) — one narrow encode pass
    val corpus = v.select(col("vec_id"),
      Ivf.nearestCid(col("e"), centroids).as("cid"),
      Pq.codesCol(col("e"), cen).as("codes"))
    val q = broadcast(v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), Pq.dtabCol(col("e"), cen).as("dtab"),
        explode(Ivf.probeCids(col("e"), centroids, nprobe)).as("cid")))
    val adc = graft.functions.VectorExpressions.adcSum(col("dtab"), col("codes"))
    val scored = q.join(corpus, Seq("cid"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adc.as("adc_scaled"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_scaled").asc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("adc_scaled"))
  }
}
