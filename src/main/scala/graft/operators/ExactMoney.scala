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
  /* Cost history: plain sum(decimal) gives up the vectorized long-sum
   * aggregation path (measured 3× at sf0.1 — the r12 q_join_broadcast
   * adjudication decomposed 0.56 s of its 0.78 to the decimal agg vs 0.19
   * for a long sum). sum2/sumRevenue therefore aggregate through
   * [[graft.functions.SumCentsExact]]: integer money units summed by an
   * ANSI long add in whole-stage codegen (the per-row hot path), partials
   * folded into decimal(38,0) at merge (the once-per-group×partition cold
   * path) — sum(decimal)-identical values at sum(long) speed, including
   * overflow semantics: every decimal op in the aggregate pins
   * EvalMode.LEGACY, so an (unreachable — int128 range strictly exceeds
   * the decimal(38,0) output domain) overflow would NULL like
   * sum(decimal(38,0)) does, not throw.
   * The naive long-cents alternative (sum the whole group as BIGINT)
   * stays rejected: it wraps silently at ~9e18 cent-units per group —
   * real at 100 TB fact-table group sizes. */
object ExactMoney {

  private def sumUnits(unitsPerValue: Int, units: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val raw = ColumnBridge.column(graft.functions
      .SumCentsExact(ColumnBridge.expression(units)).toAggregateExpression())
    (raw / lit(unitsPerValue)).cast("decimal(18,2)").cast("double")
  }

  /** Exact integer cents of a 2dp-valued double column: for such values
    * `c*100` is within ~1e-7 of an integer (well clear of any rounding
    * tie), so the double round is exactly the decimal(12,2) cast.
    */
  private def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Order-independent exact sum of a 2dp-valued double column; emitted as
    * DOUBLE (oracle twin: `CAST(sum(CAST(c AS DECIMAL(12,2))) AS DOUBLE)`).
    */
  def sum2(c: Column): Column = sumUnits(100, cents(c))

  /** Exact revenue sum: price·(1−discount) in integer 1e-4 units
    * (cents × (100 − discount%) — exact longs), summed exactly; the
    * decimal(18,2) cast rounds the exact 4dp sum to cents HALF_UP (DuckDB
    * twin: `round(sum(...), 2)` — its decimal CAST truncates), then the
    * result is emitted as DOUBLE.
    */
  def sumRevenue(price: Column, discount: Column): Column =
    sumUnits(10000, revenueUnits(price, discount))

  /** Exact per-row revenue in integer 1e-4 units (LONG): cents ×
    * (100 − discount%). Project THIS through joins instead of the decimal
    * [[revenue]] — a long is cheaper to carry and feeds the fast
    * aggregates below.
    */
  def revenueUnits(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - round(discount * lit(100)).cast("long"))

  /** [[cents]] for callers composing their own integer-unit terms. */
  def centsCol(c: Column): Column = cents(c)

  /** Fast exact sum of 1e-4-unit longs → money DOUBLE (exact 4dp sum,
    * HALF_UP to cents — [[sumRevenue]]'s output contract).
    */
  def sumUnits4Col(c: Column): Column = sumUnits(10000, c)

  /** Fast exact sum of cent longs → money DOUBLE ([[sum2]]'s contract). */
  def sumCentsCol(c: Column): Column = sumUnits(100, c)

  /** Raw exact sum of integer-unit longs as decimal(38,0) — for callers
    * that compare/join/re-aggregate the EXACT aggregate before the final
    * money cast (the q11/q15 cross-multiplied-threshold shapes).
    */
  def sumUnitsRaw(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions
      .SumCentsExact(ColumnBridge.expression(c)).toAggregateExpression())
  }

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
