package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

class AnalyticsSpec extends GraftSuite {

  test("approx sketch stats track the exact answers") {
    import org.apache.spark.sql.functions._
    val approx = operators.Analytics.approxStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exactUsers = io.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactPct = operators.Analytics.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exactUsers.foreach { case (t, exact) =>
      val (au, ap50, ap95) = approx(t)
      assert(math.abs(au - exact).toDouble / exact < 0.10, s"$t: hll $au vs exact $exact")
      val (p50, p95) = exactPct(t)
      // approx_percentile returns a real data value near the quantile
      assert(math.abs(ap50 - p50) <= math.abs(p95 - p50) * 0.25 + 1e-6,
        s"$t: ap50 $ap50 vs $p50")
      assert(ap95 <= p95 * 1.25 + 1e-6 && ap95 >= p50, s"$t: ap95 $ap95 vs $p95")
    }
  }

  test("asof join: every matched click precedes its purchase; unmatched are null") {
    val out = Analytics.asofPurchaseClick(spark, sf)
    assert(out.where(col("gap_us") < 0).count() == 0)
    // null click ⇔ null gap
    assert(out.where(col("last_click_id").isNull =!= col("gap_us").isNull).count() == 0)
    assert(out.count() ==
      io.Tables.events(spark, sf).where(col("event_type") === "purchase").count())
  }

  test("asOf picks the latest right row at-or-before each left ts per key") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val left = Seq((1L, ts(15), 101L), (1L, ts(20), 102L), (1L, ts(5), 103L),
      (2L, ts(50), 104L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(10), 201L), (1L, ts(20), 202L), (2L, ts(60), 203L))
      .toDF("user_id", "ts", "event_id")
    val got = Analytics.asOf(left, right, "user_id", "ts", "event_id", "event_id")
      .collect().map(r => r.getLong(1) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == Map(
      101L -> Some(201L), // 10 <= 15 < 20
      102L -> Some(202L), // same-ts right IS visible (at-or-before)
      103L -> None, // nothing at or before 5
      104L -> None)) // key 2's only right row is later
  }

  test("range join keeps zero-click errors with count 0") {
    val out = Analytics.rangeJoinErrorClicks(spark, sf)
    assert(out.count() ==
      io.Tables.events(spark, sf).where(col("event_type") === "error").count())
    assert(out.agg(min("n_recent_clicks")).head.getLong(0) >= 0)
  }

  test("pivot row sums equal the user's event count") {
    val p = Analytics.pivotUserActivity(spark, sf)
      .withColumn("total",
        Analytics.EventTypes.map(col).reduce(_ + _))
    val direct = io.Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    val bad = p.join(direct, "user_id").where(col("total") =!= col("n")).count()
    assert(bad == 0)
  }

  test("outliers equals the plain-Scala BigInt 3-sigma test exactly") {
    val rows = io.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = rows.groupBy(_._2)
    val want = byType.values.flatMap { rs =>
      val n = BigInt(rs.length)
      val s1 = rs.map(r => BigInt(r._3)).sum
      val s2 = rs.map(r => BigInt(r._3) * r._3).sum
      rs.collect { case (id, _, c)
        if (n * c - s1).pow(2) > 9 * (n * s2 - s1 * s1) => id }
    }.toSet
    val got = Analytics.outliers(spark, sf).collect().map(_.getAs[Long]("event_id")).toSet
    assert(got == want, s"flag sets differ: extra=${got -- want} missing=${want -- got}")
    assert(want.nonEmpty, "fixture must actually contain 3-sigma outliers")
  }

  test("tableProfile stats agree with independent recomputations; one Expand") {
    val p = Analytics.tableProfile(spark, sf)
    val row = p.collect().head
    val orders = graft.io.Tables.orders(spark, sf)
    assert(row.getAs[Long]("n_rows") == orders.count())
    assert(row.getAs[Long]("ndv_status") ==
      orders.select("o_orderstatus").distinct().count())
    assert(row.getAs[Long]("ndv_priority") ==
      orders.select("o_orderpriority").distinct().count())
    assert(row.getAs[Long]("null_orderkey") == 0L)
    assert(row.getAs[Double]("min_price") <= row.getAs[Double]("avg_price") &&
      row.getAs[Double]("avg_price") <= row.getAs[Double]("max_price"))
    assert(row.getAs[Long]("min_date_ms") < row.getAs[Long]("max_date_ms"))
    // the two exact NDVs must share ONE Expand (the multi-distinct shape),
    // not plan as separate scans (AQE prints final+initial plans — pin the
    // final section only)
    val plan = p.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Expand".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Union"), "profile must be one pass, not unioned scans")
  }

  test("equidepth equals a plain-Scala histogram fold; buckets near-equal; one scan") {
    val q = Analytics.equidepth(spark, sf)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    // reference: fold the collected histogram with the same first-row rule
    val hist = graft.io.Tables.lineitem(spark, sf).groupBy("l_quantity").count()
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val n = hist.map(_._2).sum
    var before = 0L
    val assigned = hist.map { case (v, c) =>
      val b = 1 + (4 * before) / n; before += c; (b, v, c)
    }
    val want = assigned.groupBy(_._1).map { case (b, g) =>
      (b, g.map(_._3).sum,
        BigDecimal(g.map(_._2).min).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(g.map(_._2).max).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    assert(got == want)
    // equi-depth up to tie-groups: each bucket within max-group-size of n/4
    val maxGroup = hist.map(_._2).max
    assert(got.forall { case (_, rows, _, _) => (rows - n / 4).abs <= maxGroup })
    // scale pin: ONE fact scan — the buckets derive from the histogram,
    // never a second pass or a fact-scale sort
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("rollingMedian equals a plain-Scala trailing-window lower median") {
    val got = Analytics.rollingMedian(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val events = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = events.groupBy(_._1).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        (sorted(i)._1, sorted(i)._2) -> win((win.length + 1) / 2 - 1)
      }
    }.toMap
    assert(got == want)
    assert(got.size == events.length, "one output row per event")
    // a median must shrug off a window's single extreme: every median is
    // an actual observed value inside its window
    assert(got.nonEmpty)
  }

  test("driftKs equals a plain-Scala exact KS reference on the corpus") {
    val got = Analytics.driftKs(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      val h1 = rows.filter(_._3 < mid).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val h2 = rows.filter(_._3 >= mid).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val n1 = h1.values.sum; val n2 = h2.values.sum
      val dom = (h1.keySet ++ h2.keySet).toSeq.sorted
      var c1 = 0L; var c2 = 0L; var d = BigInt(0)
      dom.foreach { v =>
        c1 += h1.getOrElse(v, 0L); c2 += h2.getOrElse(v, 0L)
        d = d.max((BigInt(c1) * n2 - BigInt(c2) * n1).abs)
      }
      val ks = if (n1 == 0 || n2 == 0) 1000000L
      else (BigInt(1000000) * d / (BigInt(n1) * n2)).toLong
      t -> ((n1, n2, ks))
    }
    assert(got == want)
    // both halves populated on this corpus and the statistic is a proper ppm
    assert(got.values.forall { case (n1, n2, ks) => n1 > 0 && n2 > 0 && ks >= 0 && ks <= 1000000 })
  }

  test("driftPsi equals a plain-Scala PSI reference (baseline-quantile bins, smoothing, rounding)") {
    val bins = 16
    // reference from the DEFINITION: bin(v) = rank of v among the
    // FIRST-half values (strictly below), scaled to `bins`; smoothing
    // add-one over all bins; per-bin contribution rounded to 1e-6 units
    // then summed exactly; empty half = the KS total-drift sentinel
    def psiRef(rows: Seq[(Long, Boolean)]): (Long, Long, Long) = {
      val first = rows.filter(_._2).map(_._1)
      val second = rows.filterNot(_._2).map(_._1)
      val (n1, n2) = (first.size.toLong, second.size.toLong)
      if (n1 == 0 || n2 == 0) return (n1, n2, 1000000000L)
      def binOf(v: Long) =
        math.min(bins - 1L, bins * first.count(_ < v) / n1)
      val b1 = first.groupBy(binOf).view.mapValues(_.size.toLong).toMap
      val b2 = second.groupBy(binOf).view.mapValues(_.size.toLong).toMap
      val psi = (0L until bins).map { b =>
        val p = (b1.getOrElse(b, 0L) + 1).toDouble / (n1 + bins)
        val q = (b2.getOrElse(b, 0L) + 1).toDouble / (n2 + bins)
        BigDecimal((p - q) * math.log(p / q) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      (n1, n2, psi)
    }
    val got = Analytics.driftPsi(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      t -> psiRef(rows.toSeq.map(r => (r._2, r._3 < mid)))
    }
    assert(got == want)
    assert(got.values.exists(_._3 > 0), "non-vacuous: some distribution shifted")
    // outlier robustness — the reason bins are BASELINE-QUANTILE, not
    // equal-width over the pooled range (the r14 QuantileCode16 lesson):
    // a planted second-half shift plus one extreme outlier must still
    // read a large PSI (equal-width bins would collapse all regular mass
    // into one bin and report ~0)
    val shifted = (0L until 500L).map(v => (v, true)) ++
      (0L until 500L).map(v => (v + 400, false)) :+ (1000000000L, false)
    val (_, _, psiOut) = psiRef(shifted)
    assert(psiOut > 250000L,
      s"a real shift must survive an outlier under quantile bins (got $psiOut)")
    // degenerate half — a type introduced after the midpoint is TOTAL
    // drift; the 10^9 sentinel strictly dominates every computable PSI
    // (smoothing bounds them by 2·ln(n+16) < 10^8 in 1e-6 units), so a
    // ranking always places it first — agreeing with the KS verdict
    assert(psiRef(Seq((1L, false), (2L, false))) == ((0L, 2L, 1000000000L)))
    assert(psiOut < 100000000L, "computable PSI stays under the sentinel's floor")
  }

  test("copurchase equals brute-force pair counting with the same total order") {
    val got = Analytics.copurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val li = graft.io.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = li.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted)
      .filter(ps => ps.length >= 2 && ps.length <= 1024)
      .flatMap(ps => for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .collect { case ((p1, p2), n) if n >= 2 => (p1, p2, n) }
      .sortBy { case (p1, p2, n) => (-n, p1, p2) }
      .take(50)
    assert(got.toSeq == want)
    assert(got.nonEmpty)
  }
}
