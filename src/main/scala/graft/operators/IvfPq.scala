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
  def topKResidual(spark: SparkSession, dir: String, nQueries: Int = 20, k: Int = 5,
      c: Int = 16, nprobe: Int = 4): DataFrame = {
    val v = Ann.normed(spark, dir)
    val seeds = v.select(col("vec_id"), col("e"))
      .where(col("vec_id") < math.max(c, 2 * Pq.Ksub)).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    val centroids: Seq[(Int, Seq[Double])] =
      seeds.take(c).zipWithIndex.map { case (e, i) => (i, e.toSeq) }.toSeq
    val cenFlat = seeds.take(c).flatten.toArray
    // Scala twin of Ivf.nearestCid's arithmetic (same FP op order)
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
    val dim = seeds.head.length
    val residual = (e: org.apache.spark.sql.Column, cid: org.apache.spark.sql.Column) =>
      graft.functions.VectorExpressions.subCentroid(e, cid, cenFlat, dim)
    val corpus = v
      .select(col("vec_id"), col("e"), Ivf.nearestCid(col("e"), centroids).as("cid"))
      .select(col("vec_id"), col("cid"),
        Pq.codesCol(residual(col("e"), col("cid")), cenR).as("codes"))
    val probeArr = array_sort(array(centroids.map { case (cid, ce) =>
      struct(Ivf.sqDist(col("e"), ce).as("d"), lit(cid).as("cid"))
    }: _*))
    val rq = residual(col("e"), col("cid"))
    val dtab = array((0 until Pq.M).map { m =>
      array((0 until Pq.Ksub).map { kk =>
        floor(Pq.subSqDist(col("rq"), m, cenR(m)(kk)) * lit(1000000.0)).cast("long")
      }: _*)
    }: _*)
    val q = broadcast(v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e"),
        explode(slice(probeArr, 1, nprobe)).as("p"))
      .select(col("query_id"), col("e"), col("p.cid").as("cid"))
      // rq materialized in its own projection: the 128 dtab entries each
      // reference it (the explode-inlining trap from minhash applies)
      .select(col("query_id"), col("cid"), rq.as("rq"))
      .select(col("query_id"), col("cid"), dtab.as("dtab")))
    val adc = (0 until Pq.M).map { m =>
      element_at(element_at(col("dtab"), m + 1), element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)
    val scored = q.join(corpus, Seq("cid"))
      .where(col("vec_id") =!= col("query_id"))
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
    val probeArr = array_sort(array(centroids.map { case (cid, ce) =>
      struct(Ivf.sqDist(col("e"), ce).as("d"), lit(cid).as("cid"))
    }: _*))
    val dtab = array((0 until Pq.M).map { m =>
      array((0 until Pq.Ksub).map { kk =>
        floor(Pq.subSqDist(col("e"), m, cen(m)(kk)) * lit(1000000.0)).cast("long")
      }: _*)
    }: _*)
    val q = broadcast(v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), dtab.as("dtab"),
        explode(slice(probeArr, 1, nprobe)).as("p"))
      .select(col("query_id"), col("dtab"), col("p.cid").as("cid")))
    val adc = (0 until Pq.M).map { m =>
      element_at(element_at(col("dtab"), m + 1), element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)
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
