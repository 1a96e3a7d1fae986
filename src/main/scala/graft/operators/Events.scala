package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Event-stream analytics in batch form (SURVEY.md §2D). The same plans run
  * under Structured Streaming via [[graft.streaming.EventsStream]]; here they
  * are batch queries so the DuckDB oracle can check them.
  */
object Events {

  /** D1 — tumbling 1-hour window aggregate per event type. Hour emitted as
    * epoch millis (BIGINT) for engine-portable comparison.
    */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), ExactMoney.sum2(col("value")).as("sum_value"))

  /** D13 — SLIDING 1-hour window (15-minute slide) per event type: each
    * event lands in exactly window÷slide = 4 overlapping windows, the
    * third window kind next to D1's tumbling and D12's session windows.
    * Uses Spark's native `window(ts, '1 hour', '15 minutes')` (epoch-
    * aligned starts), so the identical expression runs under Structured
    * Streaming ([[graft.streaming.EventsStream.slidingCounts]]).
    *
    * Exactness: counts + CENTS sums (integer), never FP accumulation —
    * the window fan-out multiplies row count ×4, and a double sum's
    * order-dependence would ×4 too. Scale shape: the ×4 expansion happens
    * map-side INSIDE the partial aggregation (Expand before the exchange
    * carries (win, type) partials, not events ×4); output is
    * |windows|·|types| rows. Oracle: the same fan-out spelled as an
    * explicit k∈0..3 unnest in epoch-millis space.
    */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .select(unix_millis(col("window.start")).as("win_ms"), col("event_type"),
        col("n_events"), col("sum_cents"))

  /** D2 — sessionization: a session breaks after a 30-minute silence per
    * user. Session id = running count of gap-breaks (one window exchange
    * keyed by user); output is per-session shape.
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapSec * 1000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("start_ms"),
        unix_millis(max(col("ts"))).as("end_ms"))
  }

  /** D3 — top-5 users per event type by activity (window top-N, ties broken
    * by user_id).
    */
  def topUsers(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("cnt").desc, col("user_id"))
    counts.withColumn("rk", row_number().over(w))
      .where(col("rk") <= n)
      .select(col("event_type"), col("rk"), col("user_id"), col("cnt"))
  }

  /** q_funnel — ordered conversion funnel per user: first `view`, then the
    * first `click` strictly after it, then the first `purchase` strictly
    * after that. Emits one row per user present in the events table, with
    * the stage timestamps (millis, −1 where the stage was never reached;
    * same-millisecond events do NOT advance a stage — the comparison is
    * strictly `>`) and the funnel depth 0–3 — the
    * product-analytics staple (and a stage-ordered sequence match the
    * reference's groupBy/secondary-sort idiom would hand-code a reducer
    * for).
    *
    * Scale shape: ONE exchange on user_id. The three stage minima are
    * windows over the same partitioning (later stages reference earlier
    * results, which Spark plans as stacked Window nodes over one Exchange),
    * and the final per-user collapse is a groupBy on the same key, so no
    * second shuffle. No joins, no driver state.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelStages(spark, dir, Seq("view", "click", "purchase"))

  /** Generalized funnel: the same window cascade over an arbitrary ordered
    * stage list. Output columns are `<stage>_ms` per stage (so stage names
    * must be distinct) plus `depth` 0–N; the 3-stage default is exactly
    * [[funnel]]/q_funnel. Still ONE user_id exchange regardless of N —
    * each extra stage adds a Window node over the same partitioning, not a
    * shuffle.
    */
  def funnelStages(spark: SparkSession, dir: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct: $stages")
    val byUser = Window.partitionBy(col("user_id"))
    val base = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val staged = stages.zipWithIndex.foldLeft(base) { case (df, (st, i)) =>
      val reached = if (i == 0) col("event_type") === st
      else col("event_type") === st && col("ms") > col(s"m${i - 1}")
      df.withColumn(s"m$i", min(when(reached, col("ms"))).over(byUser))
    }
    val stageCols = stages.zipWithIndex.map { case (st, i) =>
      coalesce(max(col(s"m$i")), lit(-1L)).as(s"${st}_ms")
    }
    val depth = stages.zipWithIndex.foldLeft(lit(0L)) { case (acc, (st, i)) =>
      when(col(s"${st}_ms") >= 0, lit((i + 1).toLong)).otherwise(acc)
    }
    staged.groupBy(col("user_id"))
      .agg(stageCols.head, stageCols.tail: _*)
      .withColumn("depth", depth)
  }

  /** q_user_growth — daily acquisition curve: users first seen each day and
    * the cumulative total. Companion to [[retention]] (the other axis of
    * the growth dashboard); exact integers.
    *
    * Scale shape: first-seen collapses per user (one exchange), daily
    * counts are a tiny keyed agg, and the running total is a
    * single-partition window — safe ONLY because it runs over the
    * #days-row daily table, not events (the aggregation reduced
    * cardinality first; never put an unpartitioned window on a fact
    * table).
    */
  def userGrowth(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
    firstSeen.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day").cast("string").as("day"), col("n_new"), col("cum_users"))
  }

  /** q_scd2 — type-2 slowly-changing-dimension build from a changelog:
    * each user's events, ordered by (ts, event_id), become versioned rows
    * with [valid_from, valid_to) intervals; the open interval (sentinel
    * -1, is_current=1) is the live version. This is the CDC→dimension
    * materialization every warehouse pipeline runs (Kimball type 2), and
    * the interval table is what an as-of join probes ([[Analytics
    * .asofPurchaseClick]] is the query-side twin).
    *
    * Scale shape: ONE user-keyed exchange; version, the interval close
    * (lead) and the current flag all ride the same window sort. Output is
    * changelog-sized — a narrow decoration of the input, no joins, no
    * driver state. Exact integers (millis, sentinel -1) per the parity
    * rules.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_raw", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("valid_from_ms"),
        coalesce(unix_millis(col("valid_to_raw")), lit(-1L)).as("valid_to_ms"),
        when(col("valid_to_raw").isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** q_event_transitions — per-user event-type transition matrix (the
    * first-order Markov model of user behavior): for every ordered pair of
    * consecutive events by the same user, count (from_type → to_type) and
    * the per-from transition probability in exact integer ppm — the
    * behavioral-analytics staple next to [[funnel]] (the funnel asks "did
    * the canonical path happen"; this measures which paths actually do).
    *
    * Scale shape: ONE user_id exchange — the lag window rides the same
    * single-window budget as q_lag_delta/q_scd2 — then a tiny agg keyed by
    * the (from, to) pair (≤ |types|² rows at any corpus size), so the
    * per-from total window runs over the model-sized table, never events
    * (the D9 rule). Exact integers throughout: p_ppm = (10⁶·n) div total
    * (BIGINT-safe to ~9·10¹² transitions per from_type; beyond that the
    * numerator needs the E14 decimal widening). Ties in the event order
    * break by event_id on both engines, so the transition multiset is
    * deterministic.
    */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byFrom = Window.partitionBy(col("from_type"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("total", sum(col("n_trans")).over(byFrom))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        expr("(1000000 * n_trans) div total").as("p_ppm"))
  }

  /** q_retention — cohort retention matrix: cohort = each user's first
    * active date; for every (cohort, day-offset) cell, the count of
    * distinct users from that cohort active that day. The growth-analytics
    * staple; exact integer outputs (dates + counts).
    *
    * Scale shape: the cohort date is a window min over user_id (one
    * exchange); activity collapses through a two-phase distinct-count agg
    * keyed by the (cohort, offset) cell — the only other shuffle, carrying
    * one row per (user, cohort, day) after map-side partial dedup. No
    * driver state, no joins (the window replaces the first-seen self-join).
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort", min(col("day")).over(byUser))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .select(col("cohort").cast("string").as("cohort"),
        col("day_offset").cast("long").as("day_offset"), col("n_active"))
  }

  /** D18 — q_peak_concurrency: per-day PEAK of simultaneously-open
    * sessions — the occupancy/concurrency sweep every capacity dashboard
    * runs (licenses in use, live connections, concurrent viewers). A
    * session from [[sessionize]] is open on [start_ms, end_ms]; the
    * classic sweep line turns each into (+1 at start, −1 at end+1), the
    * running sum over the global (ms, delta ASC) order is the
    * concurrency after each point — −1s fold BEFORE +1s at the same
    * millisecond, because a session ending at T−1 (its −1 lands at T) is
    * already closed when one starting at T opens; the opposite order
    * would transiently count both and overstate the peak by the number
    * of such back-to-back handoffs.
    *
    * Day attribution is taken from the DEFINITION — peak(D) = max over
    * instants t ∈ D of #sessions with start ≤ t ≤ end — not from "max of
    * the day's sweep rows" (the two differ exactly at midnight): a −1
    * landing at D's first millisecond belongs to a session that ended at
    * D−1's LAST millisecond and is open at no instant of D, so neither
    * that row's pre-fold value nor the previous day's carry may count
    * toward D. Concretely, peak(D) = max(conc(dayStart), run values at
    * points strictly inside D), where conc(dayStart) = the midnight tie
    * group's POST-fold value when D has deltas at its first ms, else the
    * previous output day's final run (concurrency persists unchanged
    * through delta-less spans). Within a day, intermediate tie values
    * lie between two attained concurrencies of the same day, so the max
    * over rows is exact; only the midnight group needed the special case
    * (its pre-fold values are attained in D−1, not D).
    *
    * Determinism under ties: the set of partial sums inside a tie group
    * depends only on the (ms, delta ASC) order both engines pin, so day
    * max, boundary-fold value and day-final value agree exactly.
    *
    * Scale shape: the running sum is the same TWO-PASS DISTRIBUTED SCAN
    * as C48 (range-partition by ms, per-partition totals → driver scan of
    * #partitions pairs → stamping pass) — a global window would serialize
    * the sweep through one task. The day roll-up is a bounded agg and the
    * carry window runs over one row per day (span-bounded, the D9
    * running-total precedent).
    */
  def peakConcurrency(spark: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = {
    val deltas = sessionize(spark, dir, gapMinutes)
      .select(explode(array(
        struct(col("start_ms").as("ms"), lit(1L).as("d")),
        struct((col("end_ms") + 1L).as("ms"), lit(-1L).as("d")))).as("x"))
      .select(col("x.ms").as("ms"), col("x.d").as("d"))
      .repartitionByRange(col("ms"), col("d"))
      .sortWithinPartitions(col("ms"), col("d"))
      .localCheckpoint(false) // lazy: the totals pass materializes it
    val rdd = deltas.rdd
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; var n = 0L
      it.foreach { r => s += r.getLong(1); n += 1 }
      Iterator((i, s, n))
    }.collect().sortBy(_._1)
    val runBase = totals.scanLeft(0L)(_ + _._2).init
    val posBase = totals.scanLeft(0L)(_ + _._3).init
    val stamped = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = runBase(i); var pos = posBase(i)
      it.map { r => run += r.getLong(1); pos += 1; (r.getLong(0), run, pos) }
    }
    val daily = spark.createDataFrame(stamped).toDF("ms", "run", "pos")
      // boundary rows = deltas at the day's exact first millisecond: their
      // −1s close sessions that were open at no instant of this day, so
      // only the group's post-fold value (max pos) is a concurrency OF
      // this day; rows strictly inside the day feed the max directly
      .withColumn("bdry",
        col("ms") === unix_millis(date_trunc("DAY", timestamp_millis(col("ms")))))
      .groupBy(to_date(timestamp_millis(col("ms"))).as("day"))
      .agg(max(when(!col("bdry"), col("run"))).as("mx_inner"),
        max(when(col("bdry"), struct(col("pos"), col("run")))).as("bf"),
        max(struct(col("pos"), col("run"))).as("lf"))
    val byDay = Window.orderBy(col("day"))
    daily
      // conc at the day's first instant: the folded midnight group if one
      // exists, else the previous output day's final run (carry)
      .withColumn("conc0", coalesce(col("bf.run"),
        lag(col("lf").getField("run"), 1).over(byDay), lit(0L)))
      .select(col("day").cast("string").as("day"),
        greatest(coalesce(col("mx_inner"), lit(0L)), col("conc0")).as("peak"))
  }

  /** D17 — q_gap_fill: per-user daily resample with forward fill — the
    * time-series regularization every metrics/feature pipeline runs before
    * models that assume an unbroken grid (as-freq + ffill). For each user,
    * every calendar day between their first and last activity gets a row:
    * active days carry that day's exact counts/cents, gap days carry
    * n_events = 0 and the LAST ACTIVE day's cents as `filled_cents`
    * (day-level forward fill; the as-of join E2 is the row-level analogue).
    *
    * Scale shape: one (user, day) aggregation (map-side partial), one
    * user-keyed min/max agg, a `sequence()` explode bounded by the date
    * span (never event-sized — 30 days here, and a pipeline would bound it
    * by policy), a broadcast-friendly join of the two user-keyed sides, and
    * ONE user window for the fill (`last(_, ignoreNulls)` — both engines
    * implement IGNORE NULLS exactly). Everything integer/date; no FP.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val spans = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day").cast("string").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("cents"), lit(0L)).as("cents"),
        last(col("cents"), ignoreNulls = true).over(w).as("filled_cents"))
  }

  /** D16 — q_merge_upsert: CDC apply — the MERGE INTO semantics every
    * lakehouse runs nightly (Delta/Iceberg MERGE, Hudi upsert), expressed
    * as one declarative plan so the oracle can check it exactly. The
    * snapshot is the per-user state over the FIRST time half (the E20
    * midpoint convention); the second half is the changelog: `error`
    * events are tombstones (latest op wins, ordered by (ts, event_id) —
    * event_id breaks millisecond ties so the winner is total-ordered),
    * anything else upserts the user's last-seen attributes. Output is the
    * merged snapshot: untouched rows `keep` their base state, upserts of
    * known users `update` attributes in place, upserts of new users
    * `insert` with n_base = 0, and tombstoned users vanish — including
    * insert-then-delete users, who never appear.
    *
    * Scale shape: base agg and changelog latest-row reduce on ONE key
    * (user_id) each — max(struct(ms, event_id, …)) is a map-side partial
    * agg, never a window over the fact — and meet in a single full-outer
    * SMJ on that key. On bucketed storage ([[graft.io.Layout]]) all three
    * hops inherit the bucket partitioning and the plan is zero-Exchange;
    * [[graft.io.Layout.mergeBucketed]] is the physical twin that applies
    * the same semantics to the bucket FILES, rewriting only affected
    * buckets.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ms"))
    val mid = ev.agg(expr("(min(ms) + max(ms)) div 2").as("mid"))
    val halves = ev.crossJoin(broadcast(mid))
    val base = halves.where(col("ms") < col("mid"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_base"),
        max(struct(col("ms"), col("event_id"), col("event_type"))).as("last"))
      .select(col("user_id"), col("n_base"),
        col("last.ms").as("b_ms"), col("last.event_type").as("b_type"))
    val chg = halves.where(col("ms") >= col("mid"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("ms"), col("event_id"), col("event_type"))).as("last"))
      .select(col("user_id"), col("last.ms").as("c_ms"),
        col("last.event_type").as("c_type"),
        (col("last.event_type") === "error").as("del"))
    base.join(chg, Seq("user_id"), "full_outer")
      .where(col("c_ms").isNull || !col("del"))
      .select(col("user_id"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        when(col("c_ms").isNull, col("b_ms")).otherwise(col("c_ms")).as("last_ms"),
        when(col("c_ms").isNull, col("b_type")).otherwise(col("c_type")).as("last_type"),
        when(col("c_ms").isNull, lit("keep"))
          .when(col("b_ms").isNull, lit("insert"))
          .otherwise(lit("update")).as("action"))
  }
}
