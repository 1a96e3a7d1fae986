package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** E22 — q_validate_release: the data-validation gate a release pipeline
  * runs before promoting a corpus snapshot — the ops primitives this repo
  * already ships (E16 table profile, E14 outlier logic, E20 exact drift
  * KS, C45 corpus profile) composed into ONE verdict table: one row per
  * check with the measured value, the policy band, and pass/fail. The
  * composition discipline follows C40 (curate_pipeline): each stage is
  * the verified primitive re-expressed, not re-implemented.
  *
  * Checks (all exact-integer, thresholds are named policy constants
  * mirrored verbatim by the oracle):
  *   - doc_count          — the table is non-trivially populated
  *   - null_text_ppm      — no document lost its payload
  *   - exact_dup_ppm      — C1's md5 dedup rate within policy
  *   - lang_missing_ppm   — metadata completeness
  *   - mean_tokens_x100   — C45-style corpus shape within band
  *   - nchars_outlier_ppm — E14-style Tukey fence (3×IQR) on n_chars,
  *     quartiles EXACT from the value-domain histogram (rank-based:
  *     q1 = min v with 4·cdf(v) ≥ n), never a sample or a sort of the
  *     corpus
  *   - events_drift_ppm   — E20's exact two-sample KS between the event
  *     stream's time halves, worst type
  *
  * Scale shape: five of the seven checks ride ONE documents scan (a
  * single groupBy().agg() — count, null-sum, distinct-md5, lang-sum,
  * token-sum in one pass); the outlier check aggregates the
  * (column-pruned) n_chars histogram — value-domain-sized windows, the
  * E20 device; the drift check is the E20 plan unchanged. Every
  * per-table reduction collapses to one row before the final UNION, so
  * the verdict table costs three scans total and shuffles only
  * domain-sized aggregates at any corpus size.
  */
object Validate {
  // Policy bands (ppm unless noted). Generous by design — the gate's
  // value is the measured row + the mechanics; a deployment tightens them.
  val MinDocs = 1L
  val MaxNullTextPpm = 0L
  val MaxExactDupPpm = 200000L // ≤ 20% exact copies
  val MaxLangMissingPpm = 10000L // ≤ 1% metadata holes
  val MinMeanTokensX100 = 100L // ≥ 1 token/doc
  val MaxMeanTokensX100 = 100000L // ≤ 1000 tokens/doc
  val MaxNcharsOutlierPpm = 50000L // ≤ 5% beyond the 3×IQR fence
  val MaxDriftPpm = 500000L // KS ≤ 0.5 between time halves (measured ~0.05)

  def validateRelease(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextHash.tokens

    // one pass, five checks: the profile aggregation
    val prof = Tables.documents(spark, dir).agg(
      count(lit(1)).as("n"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("nulls"),
      countDistinct(md5(col("text"))).as("dhash"),
      sum(when(col("lang").isNull || col("lang") === "", 1L).otherwise(0L)).as("nolang"),
      sum(size(tokens(col("text"))).cast("long")).as("toks"))

    // exact quartiles + outlier mass off the n_chars value-domain histogram
    val h = Tables.documents(spark, dir)
      .groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("c"))
    val cum = h.select(col("v"), col("c"),
      sum(col("c")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("v")).rowsBetween(Long.MinValue, 0)).as("cdf"),
      sum(col("c")).over().as("nn"))
    val q = cum.agg(
      min(when(col("cdf") * 4 >= col("nn"), col("v"))).as("q1"),
      min(when(col("cdf") * 4 >= col("nn") * 3, col("v"))).as("q3"))
    val outliers = h.crossJoin(broadcast(q))
      .where(col("v") < col("q1") - (col("q3") - col("q1")) * 3 ||
        col("v") > col("q3") + (col("q3") - col("q1")) * 3)
      .agg(coalesce(sum(col("c")), lit(0L)).as("nout"))

    // E20's exact KS, worst event type
    val drift = Analytics.driftKs(spark, dir)
      .agg(max(col("ks_ppm")).as("drift"))

    def row(check: String, value: org.apache.spark.sql.Column,
        lo: Long, hi: Long): org.apache.spark.sql.Column =
      struct(lit(check).as("chk"), value.cast("long").as("value"),
        lit(lo).as("lo"), lit(hi).as("hi"))

    // all reductions are 1-row frames: the crossJoins are literal-sized.
    // ppm arithmetic uses integer `div` (↔ DuckDB `//`) — Column./ is
    // double division, whose cast-to-long floor can disagree with exact
    // integer division one ulp from an integer.
    val one = prof.crossJoin(broadcast(outliers)).crossJoin(broadcast(drift))
    one
      .select(explode(array(
        row("doc_count", col("n"), MinDocs, Long.MaxValue),
        row("null_text_ppm", expr("(nulls * 1000000) div greatest(n, 1L)"),
          0L, MaxNullTextPpm),
        row("exact_dup_ppm", expr("((n - dhash) * 1000000) div greatest(n, 1L)"),
          0L, MaxExactDupPpm),
        row("lang_missing_ppm", expr("(nolang * 1000000) div greatest(n, 1L)"),
          0L, MaxLangMissingPpm),
        row("mean_tokens_x100", expr("(toks * 100) div greatest(n, 1L)"),
          MinMeanTokensX100, MaxMeanTokensX100),
        row("nchars_outlier_ppm", expr("(nout * 1000000) div greatest(n, 1L)"),
          0L, MaxNcharsOutlierPpm),
        row("events_drift_ppm", col("drift"), 0L, MaxDriftPpm))).as("r"))
      .select(col("r.chk").as("chk"), col("r.value").as("value"),
        col("r.lo").as("lo"), col("r.hi").as("hi"),
        (col("r.value") >= col("r.lo") && col("r.value") <= col("r.hi")).as("pass"))
  }
}
