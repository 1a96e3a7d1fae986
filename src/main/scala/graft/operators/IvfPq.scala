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
