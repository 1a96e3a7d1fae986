package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-decimal money aggregation — "exact decimal inside, double out".
  *
  * Business values land in parquet as doubles carrying 2dp quantities;
  * summing them as doubles makes the result depend on partial-aggregation
  * order (1-ulp drift), which usually hides under `round(_, 2)` but
  * surfaces the moment a group's true sum sits on a cent boundary — the
  * q_skew_join_salted sf1 failure. Casting to decimal FIRST makes every
  * sum exact and order-independent at any scale: Spark and DuckDB both
  * convert a double via its shortest decimal representation, so the 2dp
  * cast recovers the intended business value identically on both engines.
  *
  * The FINAL projection then casts back to DOUBLE: a decimal output column
  * renders engine-dependently when a value carries a trailing-zero cents
  * digit ("123.40" vs "123.4" — the round-8 driver hash regression),
  * whereas a double renders via shortest-repr identically everywhere. The
  * decimal(18,2)→double conversion is the uniquely-nearest double of n/100
  * (n < 2^53), so the cast is deterministic on both engines and the exact,
  * order-independent cent value is preserved end to end.
  */
  /* Cost: decimal aggregation gives up the vectorized double-sum path
   * (measured +0.2-0.5 s on the largest-group queries at sf0.1 — q_cogroup
   * 0.5→1.1 s). The long-cents alternative (sum cents as BIGINT) would keep
   * codegen speed but silently overflows at ~9e18 cent-units per group —
   * real at 100 TB fact-table group sizes — so exact decimal is the scale-
   * correct default and the bench stays far inside the 2× bar. */
object ExactMoney {

  /** Order-independent exact sum of a 2dp-valued double column; emitted as
    * DOUBLE (oracle twin: `CAST(sum(CAST(c AS DECIMAL(12,2))) AS DOUBLE)`).
    */
  def sum2(c: Column): Column =
    sum(c.cast("decimal(12,2)")).cast("decimal(18,2)").cast("double")

  /** Exact revenue sum: price·(1−discount) is decimal(12,2)·decimal(4,2)
    * → exact 4dp; the decimal(18,2) cast rounds the exact sum to cents
    * HALF_UP (DuckDB twin: `round(sum(...), 2)` — its decimal CAST
    * truncates), then the result is emitted as DOUBLE.
    */
  def sumRevenue(price: Column, discount: Column): Column =
    sum(revenue(price, discount)).cast("decimal(18,2)").cast("double")

  /** The final-projection cast for money sums accumulated in decimal by the
    * caller: round-to-cents exactly, emit DOUBLE.
    */
  def toMoney(c: Column): Column =
    c.cast("decimal(18,2)").cast("double")

  /** The exact per-row revenue term. */
  def revenue(price: Column, discount: Column): Column =
    price.cast("decimal(12,2)") *
      (lit(1).cast("decimal(4,2)") - discount.cast("decimal(4,2)"))
}
