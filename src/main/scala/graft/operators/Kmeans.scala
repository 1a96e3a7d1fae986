package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd k-means over the embedding corpus, EXACT-integer and therefore
  * oracle-checkable end to end (SURVEY.md §2 E19) — the clustering stage
  * of curation recipes (topic balancing, cluster-stratified sampling)
  * that until now existed only as the IVF coarse quantizer's iters=0
  * seed codebook (Ivf.trainOn's refined centroids depend on FP partial-
  * aggregation order, so they could never be cross-engine-verified).
  *
  * The trick: cluster the int8-QUANTIZED corpus ([[Quantize]]'s proven
  * bit-stable codes) instead of the raw doubles. Every Lloyd quantity is
  * then a small integer — squared distances ≤ 64·255², centroid updates
  * are integer floor-divisions — so assignment and update are
  * bit-identical on any engine, and the DuckDB oracle re-derives the
  * full two-iteration training loop (unrolled MATERIALIZED CTE chain)
  * plus the final assignment independently. Codes ride as integer-valued
  * doubles so the fused [[Ivf.nearestCell]] kernel applies unchanged:
  * IEEE doubles are exact on integers this small, hence the "double"
  * arithmetic is still integer arithmetic.
  *
  * Scale shape (the part that matters at 100 TB): per iteration ONE
  * corpus scan — assignment is the narrow fused argmin (no join, no
  * explode), the update is a single partial-aggregated groupBy whose
  * shuffle carries ≤ K·tasks rows of 64 sums, and the model (K×64 ints)
  * is the only thing collected (the IVF/PQ codebook economics). The
  * codes frame is cached across the Iters+1 scans and unpersisted on
  * return (the [[Ivf.trainOn]] discipline).
  *
  * Seeds are code vectors of vec_id 0..K−1 (the deterministic
  * [[Ivf.trainOn]] convention — k-means++ would add RNG the oracle
  * can't replay). Empty clusters keep their previous centroid, the same
  * rule both engines apply (COALESCE in the oracle, getOrElse here).
  *
  * K is CORPUS-DERIVED, not pinned: `clamp(n / 250, 8, 4096)` from the
  * embeddings count (a parquet-metadata read; the [[Dedup.semDedup]]
  * device — the oracle re-derives the same K from its own `count(*)`,
  * so the two engines agree at every scale rung without sharing state).
  * A fixed K=8 under-partitions any real clustering corpus; ~250
  * vectors per cluster keeps cluster granularity tracking corpus size
  * while the 4096 cap bounds the collected model (≤ 4096·64 ints) and
  * the per-vector argmin work. At this SF ladder: sf0.01 → 8, sf1 → 80,
  * sf10 → 800.
  */
object Kmeans {
  val MinK = 8
  val MaxK = 4096
  val VecsPerCluster = 250L
  val Iters = 2
  val Dim = 64

  /** clamp(n / [[VecsPerCluster]], [[MinK]], [[MaxK]]) — mirrored verbatim
    * by the oracle's `least(…, greatest(…, count(*) // …))`.
    */
  def deriveK(n: Long): Int =
    math.min(MaxK.toLong, math.max(MinK.toLong, n / VecsPerCluster)).toInt

  /** Integer code vectors as integer-valued doubles: the [[Quantize]]
    * formula per dimension, assembled into one array column (codegen'd
    * — 64 plain expressions, no HOF, no explode).
    */
  private[graft] def codes(spark: SparkSession, dir: String): DataFrame = {
    val (mins, maxs) = Quantize.ranges(spark, dir, Dim)
    val qc = array((0 until Dim).map { d =>
      if (maxs(d) == mins(d)) lit(0.0)
      else least(floor((col("e")(d) - lit(mins(d))) * lit(255.0 / (maxs(d) - mins(d)))),
        lit(255.0))
    }: _*)
    Ann.normed(spark, dir).select(col("vec_id"), qc.as("q"))
  }

  /** The unrolled Lloyd loop; returns dense-cid centroids (integer-valued
    * doubles). All arithmetic that crosses engines is integer: sums are
    * exact (≤255·n ≪ 2⁵³), updates use Long floor-division on the driver.
    */
  private[graft] def trainCentroids(q: DataFrame, k: Int = MinK,
      iters: Int = Iters): Seq[(Int, Seq[Double])] = {
    val cached = q.cache()
    try {
      var cen: Seq[(Int, Seq[Double])] = cached.where(col("vec_id") < k)
        .orderBy("vec_id").collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
      require(cen.length == k,
        s"k-means seeding needs vec_ids 0..${k - 1} in the corpus; found ${cen.length} of $k")
      for (_ <- 1 to iters) {
        val assigned = cached.withColumn("cid", Ivf.nearestCid(col("q"), cen))
        val aggs = count(lit(1)).as("n") +:
          (0 until Dim).map(d => sum(col("q")(d)).cast("long").as(s"s$d"))
        val rows = assigned.groupBy(col("cid")).agg(aggs.head, aggs.tail: _*).collect()
        val updated = rows.map { r =>
          val n = r.getLong(1)
          r.getInt(0) -> (0 until Dim).map(d => (r.getLong(2 + d) / n).toDouble)
        }.toMap
        cen = (0 until k).map(c => c -> updated.getOrElse(c, cen(c)._2))
      }
      cen
    } finally cached.unpersist(blocking = false)
  }

  /** E19 — the registered query: final (vec_id, cid, d2) assignment after
    * `iters` trained iterations over [[deriveK]] clusters; d2 is the exact
    * integer squared distance to the winning centroid (ties → lowest cid,
    * the [[Ivf.nearestCell]] rule, mirrored by the oracle's
    * min(d2·K + cid)). `iters` callers must regenerate the unrolled
    * oracle to match ([[graft.Oracles.kmeans]] is generated from the same
    * [[Iters]] constant).
    */
  def kmeans(spark: SparkSession, dir: String, iters: Int = Iters): DataFrame = {
    // count on the RAW scan: Tables.embeddings wraps in cpuFanOut, which
    // would route the count through a RoundRobin exchange — a plain
    // parquet count() is answered from footer row counts (review finding)
    val k = deriveK(graft.io.Tables.load(spark, dir, "embeddings").count())
    val q = codes(spark, dir)
    val cen = trainCentroids(q, k, iters)
    q.select(col("vec_id"), Ivf.nearestCell(col("q"), cen).as("a"))
      .select(col("vec_id"),
        col("a.cid").cast("long").as("cid"),
        col("a.dist").cast("long").as("d2"))
  }
}
