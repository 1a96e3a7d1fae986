package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of the embedding corpus — the standard
  * 4×-compression storage layout for vectors at scale (feeds ANN indexes
  * and caches; FAISS `SQ8` / the usual vector-DB int8 codec).
  *
  * Train: per-dimension global (min, max) — ONE total aggregate (128 agg
  * expressions over the narrow scan, partial-agg'd map-side, so the
  * "shuffle" is 128 doubles). The range table is a bounded model artifact
  * (like the IVF/PQ codebooks) collected once and re-entered as literals.
  *
  * Encode: `floor((e[d] − mn_d) · 255 / (mx_d − mn_d))` clamped to [0,255]
  * — pure per-row IEEE-double arithmetic in the same operation order on
  * any engine, hence exactly oracle-checkable (no FP accumulation
  * anywhere: min/max are selections, the scale is a single mul+div).
  *
  * Output is the exploded (vec_id, dim, code) form so the driver's
  * scalar-hash compare applies; the packed array<tinyint> column form is a
  * trivial `groupBy(vec_id).agg(collect_list)` away in production.
  */
object Quantize {

  /** Per-dimension (min, max) ranges: one total aggregate. */
  def ranges(spark: SparkSession, dir: String, dim: Int = 64): (Array[Double], Array[Double]) = {
    val v = Ann.normed(spark, dir).select(col("e"))
    val aggs = (0 until dim).map(d => min(col("e")(d))) ++
      (0 until dim).map(d => max(col("e")(d)))
    val r = v.agg(aggs.head, aggs.tail: _*).first()
    val mins = Array.tabulate(dim)(d => r.getDouble(d))
    val maxs = Array.tabulate(dim)(d => r.getDouble(dim + d))
    (mins, maxs)
  }

  /** int8 codes, exploded to (vec_id, dim, code). */
  def scalarQuant(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    val (mins, maxs) = ranges(spark, dir, dim)
    encode(Ann.normed(spark, dir).select(col("vec_id"), col("e")), mins, maxs)
  }

  /** Encode vectors (`vec_id`, `e: array<double>`) against a trained range
    * table.
    */
  def encode(v: DataFrame, mins: Array[Double], maxs: Array[Double]): DataFrame = {
    // Degenerate-range branch hoisted OUT of the per-element path: a
    // constant dimension (mx = mn) gets driver-side scale 0, so (x−mn)·0
    // floors to code 0 — same result as the oracle's CASE (DuckDB would
    // error on CAST(NaN) if left unguarded) with ONE array lookup beyond
    // mn and no per-row conditional; the r5 `when(mx===mn)` + second
    // element_at coincided with a +53% encode regression.
    val scales = Array.tabulate(mins.length)(d =>
      if (maxs(d) == mins(d)) 0.0 else 255.0 / (maxs(d) - mins(d)))
    val mn = element_at(typedlit(mins.toSeq), col("dim") + 1)
    val sc = element_at(typedlit(scales.toSeq), col("dim") + 1)
    v.select(col("vec_id"), posexplode(col("e")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        // clamp BOTH ends: train-set values floor into [0, 255], but
        // encode() is also the query-vector API, where x < mn_d (below the
        // trained range) must saturate to 0, not go negative
        greatest(least(floor((col("x") - mn) * sc), lit(255.0)), lit(0.0))
          .cast("long").as("code"))
  }
}
