package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.io.Tables

/** End-to-end ANN serving façade: build an index over the corpus ONCE,
  * then answer arbitrary batch query sets against it — the entry point a
  * user actually calls, composing the spec'd/oracle-checked pieces
  * ([[Ann.lshBuckets]]'s hyperplane tables, [[Ivf.train]]'s coarse
  * quantizer) behind one handle.
  *
  * Separation of build and search is the scale story: the expensive parts
  * (bucket table / cell assignment over the full corpus) are materialized
  * once per index lifetime, while each search batch costs only its own
  * broadcast + candidate join + re-rank. Query batches are broadcast (a
  * serving batch is small by definition); the corpus never reshuffles
  * across batches.
  */
object AnnIndex {

  /** A built index. `corpus` is (vec_id, e, nrm[, cid]); `buckets` is the
    * LSH (vec_id, tbl, bucket) table (empty for IVF). Both are
    * lazily localCheckpointed: materialized at the first search, reused by
    * every later batch instead of recomputed.
    */
  final case class Handle private[operators] (
      method: String,
      corpus: DataFrame,
      buckets: Option[DataFrame],
      centroids: Seq[(Int, Seq[Double])],
      nprobe: Int,
      resIdx: Option[IvfPq.ResIndex] = None,
      pqCen: IndexedSeq[IndexedSeq[Seq[Double]]] = IndexedSeq.empty,
      cells: IndexedSeq[IndexedSeq[IndexedSeq[Seq[Double]]]] = IndexedSeq.empty) {

    /** Top-k cosine neighbors per query. `queries` = (query_id, qe) with
      * qe an array<double> of the corpus dimension — corpus rows or
      * external vectors alike. Output (query_id, rk, neighbor_id, cos4)
      * ("pq"/"ivfpq" rank by adc_scaled) matches q_ann_lsh / q_ann_ivf /
      * q_ann_pq row-for-row when the query batch is the registered one
      * (AnnIndexSpec pins this).
      *
      * `excludeSelf` (default true — right for corpus-row batches) drops
      * candidates with `neighbor_id == query_id`. Pass FALSE for external
      * query batches: an external id that happens to equal a corpus
      * vec_id (natural 0..n numbering) would otherwise silently lose a
      * legitimate nearest neighbor.
      *
      * `multiProbe` (lsh only) turns on query-side multi-probing
      * ([[Ann.lshMultiProbeTopK]]'s lowest-margin bit flips): recall
      * 0.87–0.92 vs 0.58 single-probe, measured, at the SAME stored
      * bucket table — only the broadcast probe list grows 4×.
      */
    def search(queries: DataFrame, k: Int = 5, excludeSelf: Boolean = true,
        multiProbe: Boolean = false): DataFrame = {
      // loud, not silent: a caller asking for the multi-probe recall lift
      // on a layout that can't probe would otherwise get the baseline
      require(!multiProbe || method == "lsh",
        s"multiProbe is an lsh-layout feature (this index is '$method'); " +
          "ivf probing is the nprobe parameter at build time")
      if (method == "pq")
        return Pq.searchCodes(corpus, pqCen,
          queries.select(col("query_id"), col("qe")), k, excludeSelf)
      if (method == "ivfpq")
        return IvfPq.searchResidual(resIdx.get,
          queries.select(col("query_id"), col("qe")), k, nprobe, excludeSelf)
      if (method == "ivfpq_res_refined") {
        // per-probed-cell ADC tables come from the refined codebooks
        // driver-side: collect the query batch — this method's batch size
        // is bounded by driver memory (the other methods broadcast the
        // batch instead); the corpus scoring itself stays distributed.
        // Cast query_id so int-typed external ids work like they do on
        // every column-based path.
        val qs = queries.select(col("query_id").cast("long"), col("qe")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        return IvfPq.searchRefined(resIdx.get.mdl, cells, corpus, qs, k, nprobe, excludeSelf)
      }
      val q0 = queries.select(col("query_id"), col("qe"))
        .withColumn("qn", sqrt(VectorExpressions.dot(col("qe"), col("qe"))))
      val cand = method match {
        case "lsh" =>
          // fused bucket kernels — same plane constants / dot order as the
          // corpus-side build pass (Ann.lshBucketsOf), so query buckets hit
          // the persisted index bit-identically
          val probes =
            if (multiProbe)
              q0.select(col("query_id"),
                  explode(Ann.multiProbesCol(col("qe"))).as("tb"))
                .select(col("query_id"), col("tb.tbl"), col("tb.bucket"))
            else
              q0.select(col("query_id"),
                  posexplode(Ann.tableBucketsCol(col("qe"))))
                .toDF("query_id", "tbl", "bucket")
          val qb = broadcast(probes)
          qb.join(buckets.get, Seq("tbl", "bucket"))
            .select(col("query_id"), col("vec_id")).distinct()
        case "ivf" =>
          // fused top-nprobe kernel — bit-identical probe order to the
          // composed slice(array_sort(struct(sqDist, cid))) forest it
          // replaces (the same Ivf.probeCids the declared queries plan)
          val qc = broadcast(q0.select(col("query_id"),
            explode(Ivf.probeCids(col("qe"), centroids, nprobe)).as("cid")))
          qc.join(corpus.select(col("vec_id"), col("cid")), Seq("cid"))
            .select(col("query_id"), col("vec_id")).distinct()
        case other => throw new IllegalArgumentException(
          s"unknown ANN method '$other' (expected lsh, ivf or ivfpq)")
      }
      val scored = cand
        .join(corpus.select(col("vec_id"), col("e"), col("nrm")), "vec_id")
        .join(broadcast(q0), "query_id")
        .where(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(Ann.cosine(col("qe"), col("e"), col("qn"), col("nrm")), 4).as("cos4"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos4").desc, col("neighbor_id"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= k)
        .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos4"))
    }
  }

  /** Build an index over the corpus at `dir`. method = "lsh" (hyperplane
    * bucket tables — no training pass, best for cosine recall on skewed
    * corpora), "ivf" (Lloyd-refined coarse quantizer — nprobe-bounded
    * candidate cost with exact re-rank), "pq" (flat product-quantization —
    * full scan over 8-byte codes + integer ADC; no cell structure, so
    * recall never suffers from probe misses), or "ivfpq" (residual IVF-PQ —
    * 8-byte codes + integer ADC restricted to nprobe cells, the layout
    * that scales to billions; "pq"/"ivfpq" rank by scaled ADC distance
    * instead of cos4).
    */
  def build(spark: SparkSession, dir: String, method: String = "ivf",
      c: Int = 16, iters: Int = 2, nprobe: Int = 4): Handle =
    buildOn(Tables.embeddings(spark, dir), method, c, iters, nprobe)

  /** [[build]] over any embeddings-shaped frame (vec_id, embedding
    * [, label]) — a filtered/unioned corpus, a staging table, another
    * source entirely. The trained layouts seed their models from the
    * frame's lowest vec_ids ([[Ivf.trainOn]] needs 0..c−1,
    * [[IvfPq.resModelOn]] 0..max(c, 2·Ksub)−1), so the initial corpus must
    * contain that id range; [[append]] batches have no such constraint
    * (they never touch the model).
    */
  def buildOn(raw: DataFrame, method: String = "ivf",
      c: Int = 16, iters: Int = 2, nprobe: Int = 4): Handle = method match {
    case "lsh" =>
      val normed = Ann.normedOf(raw)
      Handle("lsh", normed.localCheckpoint(false),
        Some(Ann.lshBucketsOf(normed).localCheckpoint(false)), Nil, nprobe)
    case "ivf" =>
      val normed = Ann.normedOf(raw)
      val centroids = Ivf.trainOn(normed, c, iters)
      val corpus = normed
        .withColumn("cid", Ivf.nearestCid(col("e"), centroids))
        .localCheckpoint(false)
      Handle("ivf", corpus, None, centroids, nprobe)
    case "pq" =>
      val normed = Ann.normedOf(raw)
      val cen = if (iters == 0) Pq.codebookOf(normed) else Pq.refineOn(normed, iters)
      val codes = normed
        .select(col("vec_id"), Pq.codesCol(col("e"), cen).as("codes"))
        .localCheckpoint(false)
      Handle("pq", codes, None, Nil, nprobe, None, cen)
    case "ivfpq" =>
      val idx = IvfPq.residualIndexOn(Ann.normedOf(raw), c)
      Handle("ivfpq", idx.corpus, None, idx.mdl.centroids, nprobe, Some(idx))
    case "ivfpq_res_refined" =>
      val normed = Ann.normedOf(raw)
      val mdl = IvfPq.resModelOn(normed, c)
      val cells = IvfPq.refineResidualPerCellOn(normed, mdl, iters)
      val corpus = IvfPq.encodeRefined(normed, mdl, cells).localCheckpoint(false)
      Handle("ivfpq_res_refined", corpus, None, mdl.centroids, nprobe,
        Some(IvfPq.ResIndex(mdl, corpus)), cells = cells)
    case other => throw new IllegalArgumentException(
      s"unknown ANN method '$other' (expected lsh, ivf, pq, ivfpq or ivfpq_res_refined)")
  }

  /** Ingest a batch into a built index WITHOUT retraining: the batch is
    * encoded through the handle's frozen model — the same arithmetic as the
    * build-time corpus pass ([[Ann.lshBucketsOf]] / [[Ivf.nearestCid]] /
    * [[Pq.codesCol]] / [[IvfPq.encodeResidual]] / [[IvfPq.encodeRefined]])
    * — and unioned into the served corpus. Cost is one narrow encode of the
    * batch (plus its own lazy checkpoint); the existing corpus is never
    * recomputed or reshuffled, which is what makes incremental ingest
    * viable at 100 TB (the C2c/D10 batch-probes-index precedent, applied to
    * serving). Because the model is frozen, append(batch) is bit-identical
    * to the batch's rows in a full rebuild under the same model
    * (AnnIndexSpec pins this across all five layouts).
    *
    * `batch` is embeddings-shaped like [[buildOn]]'s corpus; vec_id
    * uniqueness across base + batches is the caller's contract (same as any
    * ingest path — enforcing it would cost a full-corpus join per batch).
    *
    * Each append adds one union branch to the served plan; after a long
    * ingest run, [[save]] + [[load]] is the compaction pass — save writes
    * the union out as one parquet corpus, load serves it as a flat scan
    * (the same maintenance cadence as [[graft.io.Layout.compact]] for
    * streaming sinks).
    */
  def append(h: Handle, batch: DataFrame): Handle = {
    val nb = Ann.normedOf(batch).localCheckpoint(false)
    h.method match {
      case "lsh" =>
        h.copy(corpus = h.corpus.unionByName(nb),
          buckets = Some(h.buckets.get
            .unionByName(Ann.lshBucketsOf(nb).localCheckpoint(false))))
      case "ivf" =>
        h.copy(corpus = h.corpus.unionByName(
          nb.withColumn("cid", Ivf.nearestCid(col("e"), h.centroids))
            .localCheckpoint(false)))
      case "pq" =>
        h.copy(corpus = h.corpus.unionByName(
          nb.select(col("vec_id"), Pq.codesCol(col("e"), h.pqCen).as("codes"))
            .localCheckpoint(false)))
      case "ivfpq" =>
        val corpus = h.corpus.unionByName(
          IvfPq.encodeResidual(nb, h.resIdx.get.mdl).localCheckpoint(false))
        h.copy(corpus = corpus, resIdx = Some(h.resIdx.get.copy(corpus = corpus)))
      case "ivfpq_res_refined" =>
        val corpus = h.corpus.unionByName(
          IvfPq.encodeRefined(nb, h.resIdx.get.mdl, h.cells).localCheckpoint(false))
        h.copy(corpus = corpus, resIdx = Some(h.resIdx.get.copy(corpus = corpus)))
      case other =>
        throw new IllegalArgumentException(
          s"unknown AnnIndex method '$other' (expected lsh/ivf/pq/ivfpq/ivfpq_res_refined)")
    }
  }

  /** Persist a built index under `path`: the DATA-scale artifacts (the
    * corpus layout — normed vectors / cell assignments / 8-byte PQ codes —
    * and the LSH bucket table) as parquet, the MODEL-scale artifacts
    * (coarse centroids, PQ codebooks, residual seeds — KBs regardless of
    * corpus size) as tiny parquet tables, plus a one-row meta table.
    *
    * This extends the build-once index lifetime ACROSS sessions: at 100 TB
    * the built index lives on object storage and a serving job [[load]]s
    * it and answers batches without ever touching the raw embeddings —
    * the localCheckpoint reuse story made durable. Every artifact goes
    * through Spark writers (no driver-local files), so the layout works on
    * any Hadoop-compatible FS. Doubles round-trip bit-exactly through
    * parquet, so a loaded index returns bit-identical search results
    * (spec-pinned for all five layouts).
    *
    * Replacing a previous index is guarded and near-atomic: the new layout
    * is fully written to a temp sibling first, then swapped in — a crash
    * mid-save leaves the old index untouched (or, in the tiny
    * delete-to-rename window, the complete new layout under the temp
    * name). A non-empty `path` that has no `meta.parquet` marker is NOT an
    * index (a typo'd or shared directory) and save() refuses to destroy
    * it.
    */
  def save(h: Handle, path: String): Unit = {
    val spark = h.corpus.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isIndex = fs.exists(new org.apache.hadoop.fs.Path(s"$path/meta.parquet"))
    if (fs.exists(hPath) && !isIndex && fs.listStatus(hPath).nonEmpty)
      throw new IllegalArgumentException(
        s"refusing to overwrite $path: non-empty directory with no meta.parquet marker " +
          "— not a saved ANN index (delete it explicitly if intended)")
    // full new layout to a temp sibling FIRST (also clears any stale
    // artifacts of a previously-saved different method: load() reads only
    // what the swap put in place)
    val tmp = new org.apache.hadoop.fs.Path(s"$path.__saving__")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    writeArtifacts(h, tmp.toString)
    if (fs.exists(hPath)) fs.delete(hPath, true)
    if (!fs.rename(tmp, hPath)) throw new java.io.IOException(
      s"failed to move freshly-written ANN index from $tmp to $path")
  }

  private def writeArtifacts(h: Handle, path: String): Unit = {
    val spark = h.corpus.sparkSession
    import spark.implicits._
    Seq((h.method, h.nprobe)).toDF("method", "nprobe")
      .write.mode("overwrite").parquet(s"$path/meta.parquet")
    h.corpus.write.mode("overwrite").parquet(s"$path/corpus.parquet")
    h.buckets.foreach(_.write.mode("overwrite").parquet(s"$path/buckets.parquet"))
    if (h.centroids.nonEmpty)
      h.centroids.toDF("cid", "cen")
        .write.mode("overwrite").parquet(s"$path/centroids.parquet")
    if (h.pqCen.nonEmpty)
      cenToDf(spark, h.pqCen).write.mode("overwrite").parquet(s"$path/pqcen.parquet")
    h.resIdx.foreach { idx =>
      idx.mdl.seeds.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
        .toDF("i", "vec").write.mode("overwrite").parquet(s"$path/seeds.parquet")
      cenToDf(spark, idx.mdl.cenR)
        .write.mode("overwrite").parquet(s"$path/rescen.parquet")
    }
    if (h.cells.nonEmpty)
      (for {
        (cellCen, ci) <- h.cells.zipWithIndex
        (ks, m) <- cellCen.zipWithIndex
        (v, kk) <- ks.zipWithIndex
      } yield (ci, m, kk, v)).toDF("cid", "m", "k", "cen")
        .write.mode("overwrite").parquet(s"$path/cellcen.parquet")
  }

  /** Open a [[save]]d index. The corpus/bucket tables stay as parquet
    * scans (already materialized — the point of saving); only the
    * model-scale tables collect to the driver, exactly like a fresh build.
    */
  def load(spark: SparkSession, path: String): Handle = {
    // fail with errors that name the path and the problem — a missing or
    // half-written index otherwise surfaces as NoSuchElementException /
    // head-of-empty deep inside the method dispatch
    def table(name: String): DataFrame =
      try spark.read.parquet(s"$path/$name.parquet")
      catch {
        case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
          s"no readable ANN index artifact '$name' under $path: ${e.getMessage}", e)
      }
    def model(name: String): Array[org.apache.spark.sql.Row] = {
      val rows = table(name).collect()
      if (rows.isEmpty) throw new IllegalArgumentException(
        s"ANN index artifact '$name' under $path is empty — index corrupt or half-written")
      rows
    }
    val metaRows = model("meta")
    if (metaRows.length != 1) throw new IllegalArgumentException(
      s"ANN index meta under $path has ${metaRows.length} rows (expected 1)")
    val method = metaRows.head.getString(0)
    val nprobe = metaRows.head.getInt(1)
    val corpus = table("corpus")
    def centroids: Seq[(Int, Seq[Double])] =
      model("centroids")
        .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    def resModelOf(cen: Seq[(Int, Seq[Double])]): IvfPq.ResModel = {
      val seeds = model("seeds")
        .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
      // cenFlat is the coarse centroids flattened (resModel builds it
      // from the same seeds.take(c) the centroids come from)
      IvfPq.ResModel(seeds, cen, cen.flatMap(_._2).toArray,
        rowsToCen(model("rescen")), cen.head._2.length)
    }
    method match {
      case "lsh" =>
        Handle("lsh", corpus, Some(table("buckets")), Nil, nprobe)
      case "ivf" =>
        Handle("ivf", corpus, None, centroids, nprobe)
      case "pq" =>
        Handle("pq", corpus, None, Nil, nprobe, None, rowsToCen(model("pqcen")))
      case "ivfpq" =>
        val cen = centroids
        Handle("ivfpq", corpus, None, cen, nprobe, Some(IvfPq.ResIndex(resModelOf(cen), corpus)))
      case "ivfpq_res_refined" =>
        val cen = centroids
        val cells = model("cellcen")
          .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getSeq[Double](3).toSeq)
          .toMap
        val nCells = cells.keys.map(_._1).max + 1
        val byCell = (0 until nCells).map(ci => (0 until Pq.M).map(m =>
          (0 until Pq.Ksub).map(kk => cells.getOrElse((ci, m, kk),
            throw new IllegalArgumentException(
              s"ANN index cellcen under $path is missing entry (cid=$ci, m=$m, k=$kk) " +
                "— index corrupt or half-written")): Seq[Double])))
        Handle("ivfpq_res_refined", corpus, None, cen, nprobe,
          Some(IvfPq.ResIndex(resModelOf(cen), corpus)), cells = byCell)
      case other => throw new IllegalArgumentException(
        s"saved index under $path has unknown method '$other'")
    }
  }

  /** PQ codebook (subspace m → code k → sub-vector) ⇄ a (m, k, cen) table. */
  private def cenToDf(spark: SparkSession,
      cen: IndexedSeq[IndexedSeq[Seq[Double]]]): DataFrame = {
    import spark.implicits._
    (for {
      (ks, m) <- cen.zipWithIndex
      (v, k) <- ks.zipWithIndex
    } yield (m, k, v)).toDF("m", "k", "cen")
  }

  private def rowsToCen(rows: Array[org.apache.spark.sql.Row]): IndexedSeq[IndexedSeq[Seq[Double]]] =
    rows
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toIndexedSeq)
}
