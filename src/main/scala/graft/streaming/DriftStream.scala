package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Analytics

/** Streaming twin of [[graft.operators.Analytics.driftKs]] (E20): monitor
  * an arriving event stream for distribution drift against a STATIC
  * reference histogram — the production shape of the KS gate (the batch
  * query compares two halves of a finished table; a pipeline wants every
  * micro-batch compared against the distribution it was validated on).
  *
  * Scale shape: the reference collapses ONCE to a (type, cents, count)
  * histogram — value-domain-sized, not event-sized — and each micro-batch
  * aggregates to the same shape before a histogram-vs-histogram full-outer
  * join feeds the shared exact-KS core ([[Analytics.ksFromCounts]] — the
  * SAME integer cross-multiplication the oracle-checked batch query runs,
  * so the monitor's numbers are directly comparable to the gate's). No
  * streaming state beyond the micro-batch: drift is per-batch by design
  * (a cumulative cdf would dilute a fresh shift with history).
  */
object DriftStream {

  /** The static side a deployment materializes once per validated release:
    * per-(event_type, cents) counts of the reference corpus.
    */
  def referenceHistogram(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))

  /** One micro-batch's KS verdict vs the reference — a PLAIN batch
    * function (the foreachBatch body), so the exact same code is testable
    * offline. Output: (event_type, n1=reference, n2=batch, ks_ppm). A type
    * with no batch rows (or absent from the reference) scores 10⁶ — total
    * drift by definition, matching the batch query's empty-half rule.
    */
  def batchKs(refHist: DataFrame, batch: DataFrame): DataFrame = {
    val g = refHist.withColumnRenamed("cnt", "c1")
      .join(referenceHistogram(batch).withColumnRenamed("cnt", "c2"),
        Seq("event_type", "cents"), "full_outer")
      .na.fill(0L, Seq("c1", "c2"))
    Analytics.ksFromCounts(g)
  }

  /** One micro-batch's PSI verdict vs the reference — [[batchKs]]'s twin
    * for E23 (r18 verdict #4: KS reads the worst single point of cdf
    * divergence, PSI the MASS of the shift — dashboards threshold the
    * pair together at 0.1/0.25). Same histogram-vs-histogram shape, same
    * shared core as the oracle-gated batch query
    * ([[Analytics.psiFromCounts]] — the reference histogram is the
    * baseline side, so its quantiles define the bin grid exactly as the
    * first half does in q_drift_psi; spec-pinned equal on the same
    * histogram). Output: (event_type, n1 = reference, n2 = batch,
    * psi_x1e6); an empty half scores the 10⁹ sentinel — total drift by
    * definition, sorting above every computable PSI (see driftPsi's
    * sentinel-domination note).
    */
  def batchPsi(refHist: DataFrame, batch: DataFrame, bins: Int = 16): DataFrame = {
    val g = refHist.withColumnRenamed("cnt", "c1")
      .join(referenceHistogram(batch).withColumnRenamed("cnt", "c2"),
        Seq("event_type", "cents"), "full_outer")
      .na.fill(0L, Seq("c1", "c2"))
    Analytics.psiFromCounts(g, bins)
  }

  /** Deployment wiring: every micro-batch's verdict flows to `onBatch`
    * (alerting, a verdict table, a metrics sink). Start with a checkpoint
    * + trigger per the caller's cadence.
    *
    * The reference histogram is persisted HERE, once: `refHist` arrives as
    * a lazy DataFrame, and without the persist every micro-batch's
    * [[batchKs]] join would re-evaluate the full reference aggregation —
    * the "collapses ONCE" contract would silently depend on the caller
    * having materialized it. The first batch pays the one evaluation; the
    * (value-domain-sized) histogram serves every batch after from memory.
    *
    * LIFECYCLE: the persist is registered against the caller's `refHist`
    * plan, so the caller releases it — `refHist.unpersist()` after the
    * query stops. A long-lived session that starts/stops monitors
    * repeatedly without releasing would pin one (small) histogram per
    * monitor in storage memory; there is no query-termination hook here
    * because the writer is returned unstarted.
    */
  def monitor(stream: DataFrame, refHist: DataFrame)(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    val ref = refHist.persist()
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], id: Long) => onBatch(id, batchKs(ref, batch))
    }
  }

  /** [[monitor]] scoring BOTH gates per micro-batch — the production
    * scorecard pairing: the verdict frame is the KS and PSI outputs
    * joined on event_type (one row per type:
    * event_type, n1, n2, ks_ppm, psi_x1e6). Same persist lifecycle as
    * [[monitor]] (caller unpersists `refHist` after the query stops).
    * Cost note: the two verdicts are independent plans, so the
    * micro-batch aggregates twice per trigger — deliberate (a per-batch
    * persist/unpersist of the joined histogram would buy one
    * micro-batch-sized agg at the price of storage-lifecycle churn every
    * trigger; the reference side is already persisted once).
    */
  def monitorBoth(stream: DataFrame, refHist: DataFrame, bins: Int = 16)(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    val ref = refHist.persist()
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], id: Long) =>
        onBatch(id, batchKs(ref, batch).join(
          batchPsi(ref, batch, bins).select("event_type", "psi_x1e6"),
          Seq("event_type")))
    }
  }

  /** One micro-batch's Pearson-χ² verdict vs the reference — the third
    * member of the scorecard (E24's streaming twin; χ² is the one with a
    * textbook significance table, so an alerting rule can carry an
    * actual p-value threshold against χ²(bins−1)). Same shared core as
    * the oracle-gated batch query ([[graft.operators.Analytics.chi2FromCounts]],
    * spec-pinned equal on the same histogram); empty halves score the
    * 10⁹ sentinel. Output: (event_type, n1, n2, chi2_x1e6).
    */
  def batchChi2(refHist: DataFrame, batch: DataFrame, bins: Int = 16): DataFrame = {
    val g = refHist.withColumnRenamed("cnt", "c1")
      .join(referenceHistogram(batch).withColumnRenamed("cnt", "c2"),
        Seq("event_type", "cents"), "full_outer")
      .na.fill(0L, Seq("c1", "c2"))
    Analytics.chi2FromCounts(g, bins)
  }

  /** The FULL scorecard per micro-batch — KS + PSI + χ² joined on
    * event_type (one row per type: event_type, n1, n2, ks_ppm,
    * psi_x1e6, chi2_x1e6). Same persist lifecycle and same
    * independent-plans cost note as [[monitorBoth]].
    */
  def monitorScorecard(stream: DataFrame, refHist: DataFrame, bins: Int = 16)(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    val ref = refHist.persist()
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], id: Long) =>
        onBatch(id, batchKs(ref, batch)
          .join(batchPsi(ref, batch, bins).select("event_type", "psi_x1e6"),
            Seq("event_type"))
          .join(batchChi2(ref, batch, bins).select("event_type", "chi2_x1e6"),
            Seq("event_type")))
    }
  }
}
