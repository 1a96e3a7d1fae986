package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting is
  * for the pathological hot-key join (one key holding a double-digit share
  * of a 100 TB fact table) where even a split partition can't parallelize a
  * single build-side key.
  */
object Skew {

  /** The fact-side salt expression — shared with SkewSpec so the spread
    * assertion tests the join's ACTUAL mechanism, not a re-derivation that
    * could drift.
    */
  private[graft] def saltExpr(salts: Int): Column =
    (rand(seed = 42) * salts).cast("int")

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, salts); the small side is replicated `salts`× via explode. The join
    * key becomes (key, salt) → a hot key spreads over `salts` reducers.
    * Row-level results are identical to `large.join(small, key)` (inner).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = large.withColumn("__salt", saltExpr(salts))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-frequency keys of a column — the sampling step that decides whether
    * salting is worth it (run on a sample at scale, never on the full data).
    */
  def hotKeys(df: DataFrame, key: Column, topN: Int = 10): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc)
      .limit(topN)
}
