package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming versions of the events analytics (SURVEY.md §2D).
  * The batch twins in [[graft.operators.Events]] are what the DuckDB oracle
  * checks; these run the same logic incrementally with watermarks + state.
  */
object EventsStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Full-precision event-time ordering key: (epoch second, nanos within
    * second, event_id). The batch twins and the oracle order by the full
    * timestamp column, so a millisecond-only sort (`ts.getTime`) would let
    * events differing only at sub-millisecond precision order differently
    * between stream and batch, silently breaking the stream-equals-batch
    * multiset contract. floorDiv handles pre-epoch instants.
    */
  private def instantKey(ts: Timestamp, eventId: Long): (Long, Int, Long) =
    (Math.floorDiv(ts.getTime, 1000L), ts.getNanos, eventId)

  case class SessionAgg(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  case class SessionState(start: Long, end: Long, n: Long)

  /** D1 streaming — tumbling 1h window counts with a 2h watermark: late
    * events beyond the watermark are dropped, state is bounded (the
    * requirement for an unbounded 100 TB/day stream).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** D2 streaming — sessionization with explicit state:
    * flatMapGroupsWithState keyed by user, 30-minute processing-time-free
    * event-time gap logic with a state timeout so idle users emit their
    * final session and free their state.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionAgg(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => instantKey(e.ts, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionAgg]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionAgg(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** D13 streaming — sliding 1h/15m window counts with a watermark: the
    * streaming form of [[graft.operators.Events.slidingWindow]] (same
    * `window(ts, '1 hour', '15 minutes')` expression — each event lands in
    * 4 overlapping epoch-aligned windows). State = open windows per type,
    * bounded by the watermark.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))

  /** D12 — native event-time session windows: the DECLARATIVE twin of
    * [[sessionize]]'s explicit flatMapGroupsWithState machine, via Spark's
    * `session_window` (merging [ts, ts+gap] intervals per key — INCLUSIVE
    * at the boundary: a consecutive-event delta of exactly the gap still
    * merges, same as the state machine's strict `> gap` break, spec-pinned).
    * The one representational difference: the window end is last-event +
    * gap (the interval bound), so `end − gap` equals the state machine's
    * last-event session_end — and with that shift the batch form of this
    * aggregation is row-identical to [[graft.operators.Events.sessionize]].
    *
    * Scale shape: state is per-OPEN-session and bounded by the watermark
    * (closed sessions finalize and evict in append mode); no driver state,
    * no per-user iterator materialization — for plain per-session counts
    * this is the form to prefer at 100 TB/day, reserving the explicit
    * state machine for logic `session_window` can't express (e.g. emitting
    * mid-session updates or per-event session tagging). Works identically
    * as a batch aggregation (spec cross-checks it against the window-lag
    * sessionizer on the real events table).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  case class FunnelUpdate(user_id: Long, view_ms: Long, click_ms: Long,
      purchase_ms: Long, depth: Long)

  /** D7 streaming — incremental conversion funnel per user (batch twin:
    * [[graft.operators.Events.funnel]], same STRICT same-millisecond rule).
    * mapGroupsWithState in Update mode: each trigger folds the user's new
    * events in event-time order into the three stage minima and emits the
    * user's refreshed funnel row. Within a trigger, a late view re-gates
    * buffered clicks exactly (events fold sorted); across triggers the
    * stage minima only ever tighten, so the stream equals the batch result
    * whenever each user's stage-advancing events arrive in order across
    * triggers — the same contract [[sessionize]] documents for its merges.
    * State is 3 longs per user; for an unbounded user population attach an
    * event-time TTL like sessionize's timeout to expire inactive users.
    */
  def funnel(events: Dataset[Event]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    funnelStages(events, Seq("view", "click", "purchase"))
      .map(u => FunnelUpdate(u.user_id, u.stage_ms(0), u.stage_ms(1),
        u.stage_ms(2), u.depth))
  }

  case class FunnelStagesState(minima: Seq[Long])

  case class FunnelStagesUpdate(user_id: Long, stage_ms: Seq[Long], depth: Long)

  /** Generalized streaming funnel over an arbitrary ordered stage list —
    * the streaming twin of [[graft.operators.Events.funnelStages]], same
    * strict `>` gate per stage. State is one long per stage per user.
    * Because stage i only advances once stage i−1 is set, depth = index of
    * the deepest set minimum + 1.
    */
  def funnelStages(events: Dataset[Event],
      stages: Seq[String]): Dataset[FunnelStagesUpdate] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct: $stages")
    val none = -1L
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelStagesState]) =>
          val m = state.getOption.map(_.minima.toArray)
            .getOrElse(Array.fill(stages.length)(none))
          rows.toSeq.sortBy(e => instantKey(e.ts, e.event_id)).foreach { e =>
            val i = stages.indexOf(e.event_type)
            if (i >= 0) {
              val t = e.ts.getTime
              val gated = i == 0 || (m(i - 1) != none && t > m(i - 1))
              if (gated && (m(i) == none || t < m(i))) m(i) = t
            }
          }
          state.update(FunnelStagesState(m.toSeq))
          FunnelStagesUpdate(userId, m.toSeq, m.lastIndexWhere(_ != none) + 1L)
      }
  }

  case class Transition(user_id: Long, from_type: String, to_type: String)

  case class LastEvent(sec: Long, nanos: Int, event_id: Long, event_type: String)

  /** D14 streaming — per-user transition pairs (batch twin:
    * [[graft.operators.Events.transitions]]): flatMapGroupsWithState keyed
    * by user with state = the user's LAST event (full-precision ordering
    * key + type), emitting one (from_type, to_type) row per consecutive
    * pair. Within a trigger the user's new events fold in event-time
    * order; across triggers the stream equals the batch multiset whenever
    * each user's events arrive in order across triggers — the same
    * contract [[funnelStages]] and [[sessionize]] document. An event that
    * arrives in a LATER trigger with an EARLIER ordering key than the
    * stored last event is a contract violation the state can detect — it
    * is DROPPED (conservative: no pair the batch query would never
    * produce) rather than emitted as-if-in-order, since the pairs batch
    * would splice around it are unrecoverable once the neighbours have
    * been emitted. Downstream counting/ppm is the batch aggregation over
    * the emitted pair stream (model-sized). For an unbounded user
    * population attach an event-time TTL like sessionize's timeout to
    * expire inactive users.
    */
  def transitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[LastEvent]) =>
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          rows.toSeq.sortBy(e => instantKey(e.ts, e.event_id)).foreach { e =>
            val k = instantKey(e.ts, e.event_id)
            val stale = last.exists(l =>
              Ordering[(Long, Int, Long)].lt(k, (l.sec, l.nanos, l.event_id)))
            if (!stale) {
              last.foreach(l => out += Transition(userId, l.event_type, e.event_type))
              last = Some(LastEvent(k._1, k._2, k._3, e.event_type))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming exact dedup: drop re-delivered events by id, keeping state
    * only within the watermark (bounded — the requirement for an unbounded
    * ingest stream where at-least-once delivery duplicates records). The
    * batch twin is [[graft.operators.Dedup.exact]]; content-hash dedup
    * streams the same way with `md5(text)` as the key column.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase matched to the same user's
    * clicks in the preceding hour. Both sides carry watermarks and the join
    * condition bounds event time in both directions, so Spark can expire
    * join state — the requirement for an unbounded two-stream join.
    */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      expr("""c_user_id = user_id AND
              click_ts >= purchase_ts - INTERVAL 1 HOUR AND
              click_ts <= purchase_ts"""))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** D19 — late-data monitor: cumulative rows the query's stateful
    * operators DROPPED as too-late (event time behind the watermark) —
    * the ops signal every watermarked pipeline plots next to throughput:
    * a silent upward trend means the watermark is tighter than the
    * source's real lateness distribution and the "exact" aggregates are
    * quietly losing rows. Spark already accounts the drops per trigger
    * (`StateOperatorProgress.numRowsDroppedByWatermark`); this surfaces
    * them as one number per query. `recentProgress` truncates at
    * spark.sql.streaming.numRecentProgressUpdates (default 100 triggers)
    * — an unbounded run attaches [[LateDropListener]] instead, which
    * accumulates across every trigger for the query's lifetime.
    */
  def lateDrops(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.iterator)
      .map(_.numRowsDroppedByWatermark).sum

  /** The unbounded-run form of [[lateDrops]]: a listener accumulating
    * per-trigger watermark drops per query id — O(#queries) state,
    * survives any progress-history truncation.
    *
    * Entries are NOT evicted on query termination — the post-mortem read
    * ("how much did the stream drop before it stopped?") is the number
    * the monitor exists for. The map grows one entry per DISTINCT query
    * id with nonzero drops for the listener's lifetime; a session that
    * starts many short-lived queries calls [[clear]] (or [[evict]] per
    * id) between runs (r17 ADVICE).
    */
  final class LateDropListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val drops =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    def dropsFor(id: java.util.UUID): Long = {
      val v = drops.get(id); if (v == null) 0L else v.longValue()
    }
    /** Drop all accumulated counts (session-scoped hygiene). */
    def clear(): Unit = drops.clear()
    /** Drop one query's count after its post-mortem read. */
    def evict(id: java.util.UUID): Unit = drops.remove(id)
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val d = e.progress.stateOperators.map(_.numRowsDroppedByWatermark).sum
      if (d != 0L)
        drops.merge(e.progress.id, java.lang.Long.valueOf(d),
          (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }

  /** Filesystem streaming source over a directory of parquet events —
    * the deployment shape (readStream on an arriving-files landing zone).
    */
  def fromDirectory(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Incremental batch over a landing directory: Trigger.AvailableNow +
    * checkpoint — each invocation READS exactly the files that arrived since
    * the last one (exactly-once bookkeeping in the checkpoint), which is how
    * a 100 TB/day pipeline runs the batch operators incrementally.
    *
    * Output semantics: OutputMode.Complete restores the aggregation state
    * from the checkpoint, so each invocation overwrites `outDir` with
    * CUMULATIVE per-type counts over every slice seen so far — the new files
    * are the only ones re-read, but the counts are running totals (asserted
    * by IncrementalSpec). The memory sink collects the (small, one row per
    * event type) aggregate to the driver before the parquet overwrite.
    */
  def incrementalCounts(spark: SparkSession, landingDir: String,
      schema: org.apache.spark.sql.types.StructType,
      checkpoint: String, outDir: String): Unit = {
    val q = fromDirectory(spark, landingDir, schema)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpoint)
      .format("memory")
      .queryName(s"inc_${math.abs(checkpoint.hashCode)}")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // staged (r18): each incremental invocation REPLACES outDir — the
    // exact live-overwrite window Layout's staged writers close. The
    // pre-or-post guarantee is for Layout.readDir readers; a raw
    // spark.read.parquet reader racing the swap can transiently see the
    // old+new union (doubled counts) where the old in-place overwrite
    // gave it a partial/missing table — poll this output through readDir
    graft.io.Layout.writeStaged(
      spark.table(s"inc_${math.abs(checkpoint.hashCode)}"), outDir)
  }
}
