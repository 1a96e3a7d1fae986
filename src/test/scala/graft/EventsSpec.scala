package graft

import org.apache.spark.sql.functions._

import graft.operators.Events

/** Closed-form contracts for the batch event-analytics operators the DuckDB
  * oracle checks only at corpus scale — these pin the EDGE semantics: the
  * funnel's strict same-millisecond rule and stage-skip behavior, and the
  * retention matrix's cohort/offset arithmetic on a constructed table.
  */
class EventsSpec extends GraftSuite {

  /** Write a tiny events.parquet in the driver layout ([[graft.io.Tables
    * .events]] reads ts as BIGINT epoch NANOS with an explicit schema).
    */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    rows.map { case (id, tsMs, user, typ) =>
      (id, tsMs * 1000000L, user, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: strict > per stage, skip/missing stages, one row per active user") {
    // user 1: click in the SAME ms as the first view must not count; the
    //         later click and purchase complete the funnel (depth 3).
    // user 2: only click before the first view → click never counts (depth 1).
    // user 3: click+purchase but no view → all stages unreached (depth 0).
    // user 4: view then purchase with no click → purchase can't count (depth 1).
    val dir = eventsDir(Seq(
      (1L, 100L, 1L, "view"), (2L, 100L, 1L, "click"),
      (3L, 200L, 1L, "click"), (4L, 300L, 1L, "purchase"),
      (5L, 100L, 2L, "click"), (6L, 200L, 2L, "view"),
      (7L, 100L, 3L, "click"), (8L, 200L, 3L, "purchase"),
      (9L, 100L, 4L, "view"), (10L, 200L, 4L, "purchase")))
    val got = Events.funnel(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == Map(
      1L -> ((100L, 200L, 300L, 3L)),
      2L -> ((200L, -1L, -1L, 1L)),
      3L -> ((-1L, -1L, -1L, 0L)),
      4L -> ((100L, -1L, -1L, 1L))))
  }

  test("retention: first-seen cohorts, day offsets, distinct actives per cell") {
    val day = 86400000L // one day in millis
    // users 1 and 3 first seen day0; user 2 first seen day1. Same-day
    // duplicates (user 2 twice on day1) count once per cell.
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "view"), (2L, day + 1, 1L, "view"), (3L, 3 * day, 1L, "view"),
      (4L, day, 2L, "view"), (5L, day + 2, 2L, "view"),
      (6L, 1L, 3L, "view"), (7L, day + 3, 3L, "view")))
    val got = Events.retention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("1970-01-01", 0L) -> 2L, // users 1 and 3 on their cohort day
      ("1970-01-01", 1L) -> 2L, // both return the next day
      ("1970-01-01", 3L) -> 1L, // only user 1
      ("1970-01-02", 0L) -> 1L)) // user 2's cohort day (dup collapsed)
  }

  test("userGrowth counts first-seen users per day with a running total") {
    val day = 86400000L
    // day0: users 1,2 first seen; day1: user 3 new (1 and 2 return — not
    // new); day3: user 4 new
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "view"), (2L, 10L, 2L, "view"),
      (3L, day, 3L, "view"), (4L, day + 5, 1L, "view"), (5L, day + 6, 2L, "view"),
      (6L, 3 * day, 4L, "view")))
    val got = Events.userGrowth(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("1970-01-01", 2L, 2L),
      ("1970-01-02", 1L, 3L),
      ("1970-01-04", 1L, 4L)))
  }

  test("funnelStages: 4-stage cascade generalizes the same strict-order rule") {
    // user 1 walks all four stages in order; user 2's purchase precedes
    // its click so it stalls at click (depth 2) even though a signup
    // follows; user 3 stalls after view.
    val dir = eventsDir(Seq(
      (1L, 100L, 1L, "view"), (2L, 200L, 1L, "click"),
      (3L, 300L, 1L, "purchase"), (4L, 400L, 1L, "signup"),
      (5L, 100L, 2L, "view"), (6L, 200L, 2L, "purchase"),
      (7L, 300L, 2L, "click"), (8L, 400L, 2L, "signup"),
      (9L, 100L, 3L, "view"), (10L, 200L, 3L, "signup")))
    val got = Events.funnelStages(spark, dir,
        Seq("view", "click", "purchase", "signup")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == Map(
      1L -> ((100L, 200L, 300L, 400L, 4L)),
      2L -> ((100L, 300L, -1L, -1L, 2L)),
      3L -> ((100L, -1L, -1L, -1L, 1L))))
  }

  test("funnel emits no row for users absent from the table") {
    val dir = eventsDir(Seq((1L, 100L, 7L, "view")))
    assert(Events.funnel(spark, dir).select("user_id").collect().map(_.getLong(0)).toSeq
      == Seq(7L))
  }

  test("transitions equals a plain-Scala consecutive-pair reference") {
    val got = Events.transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._3, r._4)).map(_._2)
      s.zip(s.drop(1))
    }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = counts.map { case ((f, t), n) => (f, t) -> ((n, 1000000L * n / fromTotals(f))) }
    assert(got == want)
    // the ppm shares of each from_type row sum to ~10^6 (floor losses only)
    got.groupBy(_._1._1).foreach { case (f, rows) =>
      val s = rows.values.map(_._2).sum
      assert(s <= 1000000L && s > 1000000L - rows.size, s"$f ppm sum $s")
    }
  }

  test("gapFill: complete span grid, zeros on gaps, exact forward fill") {
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = graft.operators.Events.gapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // one row per user per calendar day of the user's span, no more
    val byUser = got.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val days = rows.map(_._2).sorted
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head), java.time.LocalDate.parse(days.last)) + 1
      assert(rows.length == span && days.distinct.length == days.length, s"user $u grid")
    }
    // active days carry their own aggregates; gap days carry zeros and the
    // last active day's cents
    var sawGap = false
    byUser.values.foreach { rows =>
      var lastActive = Long.MinValue
      rows.sortBy(_._2).foreach { case (u, day, n, cents, filled) =>
        daily.get((u, day)) match {
          case Some((dn, dc)) =>
            assert(n == dn && cents == dc && filled == dc, s"$u $day active")
            lastActive = dc
          case None =>
            sawGap = true
            assert(n == 0L && cents == 0L && filled == lastActive, s"$u $day gap")
        }
      }
    }
    assert(sawGap, "fixture must contain at least one gap day")
  }

  /** The reference is written from the DEFINITION — "concurrency at
    * instant t = #sessions with start ≤ t ≤ end; a day's peak = max over
    * its instants" — NOT from the implementation's sweep order (the r16b
    * lesson: a mirrored sweep model hid the tie-order overcount). conc is
    * piecewise-constant, changing only at delta points, so each day's max
    * is attained at the day's first instant or at a delta point inside
    * the day — those are the candidates evaluated by direct counting.
    * Output days = days holding ≥1 delta point (the operator's grouping).
    */
  private def peakReference(sessions: Array[(Long, Long)]): Map[String, Long] = {
    def conc(t: Long): Long = sessions.count { case (s, e) => s <= t && t <= e }.toLong
    val deltaMs = sessions.flatMap { case (s, e) => Seq(s, e + 1) }.distinct.sorted
    def dayOf(ms: Long) = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    deltaMs.map(dayOf).distinct.map { day =>
      val dayStart = day.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
      val dayEnd = dayStart + 86400000L - 1
      val candidates = dayStart +: deltaMs.filter(m => m > dayStart && m <= dayEnd)
      day.toString -> candidates.map(conc).max
    }.toMap
  }

  test("peakConcurrency equals the definitional per-instant maximum") {
    val sessions = graft.operators.Events.sessionize(spark, sf).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    val got = graft.operators.Events.peakConcurrency(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == peakReference(sessions))
    assert(got.values.max > 1, "fixture should overlap sessions")
  }

  test("peakConcurrency: sessions ending at a day's last ms never count into the next day") {
    import spark.implicits._
    // three users' sessions all END at day 1's final millisecond; their
    // −1 deltas land exactly at day 2's first ms, so day 2 has sweep rows
    // but NO open session at any of its instants — its peak is 0, and
    // neither the carry (3) nor the midnight group's pre-fold values
    // (2, 1) may leak in.
    val dir = eventsDir(Seq(
      (1L, ms("2024-03-01 23:30:00.000"), 1L, "view"),
      (2L, ms("2024-03-01 23:59:59.999"), 1L, "view"),
      (3L, ms("2024-03-01 23:35:00.000"), 2L, "view"),
      (4L, ms("2024-03-01 23:59:59.999"), 2L, "view"),
      (5L, ms("2024-03-01 23:59:59.999"), 3L, "view")))
    val got = graft.operators.Events.peakConcurrency(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("2024-03-01" -> 3L, "2024-03-02" -> 0L), got.toString)
    val sessions = graft.operators.Events.sessionize(spark, dir).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(got == peakReference(sessions))
  }

  private def ms(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  test("peakConcurrency: a day whose peak is only the midnight carry") {
    import spark.implicits._
    // users 1 and 3 hold sessions OPEN across midnight; day 2's only
    // delta points are their closings (-1, -1), so its sweep maxes at 1 —
    // the true peak 2 comes from the carry.
    val rows = Seq(
      (2L, "2024-03-01 10:00:00", 1L), (1L, "2024-03-01 23:40:00", 2L),
      (3L, "2024-03-01 23:45:00", 3L), (1L, "2024-03-01 23:55:00", 4L),
      (3L, "2024-03-02 00:02:00", 5L), (1L, "2024-03-02 00:05:00", 6L))
    val dir = java.nio.file.Files.createTempDirectory("conc-ev").toString
    val prevTsType = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try rows.toDF("user_id", "ts_s", "event_id")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
    val got = graft.operators.Events.peakConcurrency(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("2024-03-01" -> 2L, "2024-03-02" -> 2L), got.toString)
  }

  test("mergeUpsert equals a plain-Scala CDC-apply reference") {
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mid = (ev.map(_._4).min + ev.map(_._4).max) / 2
    val base = ev.filter(_._4 < mid).groupBy(_._1).map { case (u, rows) =>
      val last = rows.maxBy(r => (r._4, r._3))
      u -> (rows.size.toLong, last._4, last._2)
    }
    val chg = ev.filter(_._4 >= mid).groupBy(_._1).map { case (u, rows) =>
      val last = rows.maxBy(r => (r._4, r._3))
      u -> (last._4, last._2)
    }
    val expected = (base.keySet ++ chg.keySet).flatMap { u =>
      (base.get(u), chg.get(u)) match {
        case (Some((n, ms, ty)), None)    => Some((u, n, ms, ty, "keep"))
        case (_, Some((_, "error")))      => None
        case (Some((n, _, _)), Some((cms, cty))) => Some((u, n, cms, cty, "update"))
        case (None, Some((cms, cty)))     => Some((u, 0L, cms, cty, "insert"))
        case (None, None)                 => None
      }
    }
    val got = graft.operators.Events.mergeUpsert(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSet
    assert(got == expected)
    assert(expected.exists(_._5 == "update"))
  }

  test("mergeUpsert covers all four MERGE outcomes on a planted changelog") {
    import spark.implicits._
    // users: 1 untouched (keep), 2 updated, 3 tombstoned, 4 new (insert),
    // 5 insert-then-delete (never appears). Second-half order for user 2
    // arrives out of id order so latest-wins is decided by ts, and user 3's
    // tombstone must win over a LATER-id earlier-ts update.
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 01:00:00", 2L, "view"),
      (2L, "2024-01-01 02:00:00", 3L, "click"),
      (3L, "2024-01-01 03:00:00", 4L, "view"),
      // ---- mid falls here (min 0h, max 20h -> 10h) ----
      (2L, "2024-01-01 12:00:00", 6L, "purchase"),
      (2L, "2024-01-01 13:00:00", 5L, "signup"),
      (3L, "2024-01-01 14:00:00", 8L, "click"),
      (3L, "2024-01-01 15:00:00", 7L, "error"),
      (4L, "2024-01-01 16:00:00", 9L, "signup"),
      (5L, "2024-01-01 17:00:00", 10L, "view"),
      (5L, "2024-01-01 20:00:00", 11L, "error"))
    val dir = java.nio.file.Files.createTempDirectory("merge-ev").toString
    // match the driver data's physical type (MICROS) — the default INT96
    // is the one form Tables.events' footer sniff doesn't serve
    val prevTsType = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try rows.toDF("user_id", "ts_s", "event_id", "event_type")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
    val got = graft.operators.Events.mergeUpsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4))).toSet
    assert(got == Set(
      (1L, 1L, "view", "keep"),
      (2L, 2L, "signup", "update"),
      (4L, 0L, "signup", "insert")))
  }
}
