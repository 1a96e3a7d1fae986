package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Core Tuple-MapReduce-equivalent relational operators, Spark-first.
  *
  * Each method is one row of SURVEY.md §2A. Pangool expressed these as
  * TupleMRBuilder jobs (group-by fields + orderBy + reducer callbacks,
  * reference: core/src/main/java/com/datasalt/pangool/tuplemr/TupleMRBuilder.java);
  * here every one is a declarative DataFrame plan so Catalyst gets pushdown,
  * pruning, partial aggregation and join planning for free.
  *
  * Scale notes (100 TB): aggregations use groupBy().agg() (map-side partial
  * agg); per-group ranking uses window functions (one shuffle by the group
  * key, no global sort); small dimensions are broadcast explicitly.
  */
object Relational {

  /** A1 — TPC-H Q1-shaped aggregation: the canonical Pangool
    * groupBy+combiner job. Partial aggregation happens map-side; the single
    * shuffle carries only (flag,status)-keyed partials.
    */
  def aggGroupBy(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        ExactMoney.sum2(col("l_extendedprice")).as("sum_base_price"),
        ExactMoney.sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        // averages via exact integer-cent sums cast back to double BEFORE
        // the divide: numerator identical on both engines (the int128
        // aggregate reassembles the same exact decimal the old
        // sum(decimal(12,2)) produced), the double division and round are
        // then deterministic (plain avg(double) is an order-dependent sum —
        // same latent cent/ppm-boundary class ExactMoney fixes for sums).
        // Cent longs, not decimal: a sum(decimal(12,2)) buffer is
        // decimal(22,2) > 18 digits → not long-backed → it alone evicts the
        // whole aggregate from HashAggregate's primitive fast map (the r12
        // q_agg_groupby adjudication: these two numerators kept A1 on the
        // slow path AFTER the money sums moved to int128)
        round(ExactMoney.sumCentsCol(ExactMoney.centsCol(col("l_quantity")))
          / count(lit(1)), 6).as("avg_qty"),
        round(ExactMoney.sumCentsCol(ExactMoney.centsCol(col("l_discount")))
          / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** A2 — Grep: map-only regex filter
    * (reference: examples/.../Grep.java on MapOnlyJobBuilder).
    * Narrow, no shuffle; the regexp can't push into parquet but doc_id/source
    * pruning does.
    */
  def grep(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .where(col("text").rlike("merge .*batch"))
      .select(col("doc_id"), col("source"), col("n_chars"))

  /** A3 — word count (reference: examples/.../TopicalWordCount.java family).
    * explode+groupBy: partial agg keeps the shuffle proportional to distinct
    * words per partition, not total tokens.
    */
  def wordCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** A4 — topical word count: two-field group key (source = topic). */
  def topicalWordCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** A5 — word count with stop words removed
    * (reference: examples/.../TopicalWordCountWithStopWords.java).
    * The stop list is tiny → literal IN-list (Catalyst folds it); a big list
    * would be a broadcast anti-join.
    */
  val StopWords: Seq[String] = Seq("a", "the")
  def wordCountStopWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "" && !col("word").isInCollection(StopWords))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** A6 — secondary sort (reference: examples/.../SecondarySort.java): group
    * by (user_id, event_type), order within group by ts, emit the first
    * event. One shuffle keyed by the group fields; the sort rides the same
    * exchange (window), exactly Pangool's sort-comparator trick.
    */
  def secondarySort(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("first_ts_ms"),
        round(col("value"), 6).as("first_value"))
  }

  /** A7 — top-N per group (reference: examples/.../TopNHashTags.java).
    * Window row_number ≤ N: single hash-shuffle by group key, no global
    * sort, no driver-side heap.
    */
  def topNPerGroup(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= n)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  /** A8 — rollup (reference: tuplemr/TupleRollupReducer.java +
    * TupleMRConfigBuilder.setRollupFrom): hierarchical aggregates
    * region → nation in one pass via GROUP BY ROLLUP. Dimensions broadcast.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), ExactMoney.sum2(col("c_acctbal")).as("acctbal"))
  }

  /** A9 — reduce-side join (reference: examples/.../UrlResolution.java):
    * two large inputs co-partitioned on the join key. Spark plans a
    * sort-merge join; AQE handles skew. Filter first so the shuffle carries
    * only surviving rows.
    */
  def joinReduceSide(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"), col("o_totalprice"))

  /** A10 — broadcast join: revenue per nation. supplier/nation are dims →
    * broadcast; lineitem never shuffles.
    */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(ExactMoney.sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  /** B10 as a driver-visible query — the bucketed-layout read path: orders
    * and lineitem are written bucketed by order key
    * ([[graft.io.Layout.writeBucketed]] — the fact⋈fact shuffle paid ONCE
    * at write time), then the per-urgent-order revenue roll-up joins AND
    * groups with ZERO Exchange against that layout (LayoutSpec pins the
    * executed plan). Bucket tables are per-(dir, session) and reused when
    * present, so repeated calls — bench iterations, serving queries —
    * measure only the read path, which is the production shape at 100 TB:
    * every consumer of a bucketed fact table gets its co-location free.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val srcPaths = Seq(s"$dir/orders.parquet", s"$dir/lineitem.parquet")
    // the memo tag fingerprints the SOURCE files (names+lengths+mtimes),
    // so a dir regenerated in place mid-session re-materializes instead of
    // silently serving the stale layout against a fresh-source oracle
    val tag = graft.io.Layout.dirTag(dir) + "_" +
      graft.io.Layout.sourceFingerprint(spark, srcPaths: _*)
    val ot = s"g_b_orders_$tag"
    val lt = s"g_b_lineitem_$tag"
    // serialized check-then-write: two concurrent first calls would both
    // enter writeBucketed, whose drop+delete preamble races the other's
    // saveAsTable into a corrupt table
    layoutLock.synchronized {
      if (!spark.catalog.tableExists(ot) || !spark.catalog.tableExists(lt)) {
        // drop layouts built for PREVIOUS fingerprints of this dir — each
        // in-place regeneration would otherwise leak a full bucketed copy
        // of both tables in the warehouse forever. The prefix match has NO
        // trailing underscore so it also catches the pre-fingerprint
        // naming g_b_*_<dirtag> (a one-time permanent leak after upgrade
        // otherwise — ADVICE r14); dirtags are fixed-width hex, so one can
        // never prefix another
        val dt = graft.io.Layout.dirTag(dir)
        spark.catalog.listTables().collect()
          .map(_.name)
          .filter(n => (n.startsWith(s"g_b_orders_$dt") && n != ot) ||
            (n.startsWith(s"g_b_lineitem_$dt") && n != lt))
          .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
        // ONE corpus-derived count for both tables (zero-Exchange needs
        // equal bucket counts); sized from the joint input bytes so the
        // same code is 8 buckets at sf0.01 and thousands at 100 TB
        val buckets = graft.io.Layout.deriveBuckets(spark, srcPaths)
        graft.io.Layout.writeBucketed(
          Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
          ot, "o_orderkey", buckets)
        graft.io.Layout.writeBucketed(
          Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount"),
          lt, "l_orderkey", buckets)
      }
    }
    val o = graft.io.Layout.readTable(spark, ot)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val l = graft.io.Layout.readTable(spark, lt).select(col("l_orderkey"),
      ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(ExactMoney.sumUnits4Col(col("rev")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** B11 as a driver-visible query — the z-ordered read path: events are
    * rewritten once per (dir, session) Morton-clustered on (user_id,
    * event_id) ([[graft.io.Layout.zorderWrite]]), then a user-range
    * roll-up reads the clustered copy — at scale the parquet footer
    * min/max stats skip every file whose (user, event) rectangle misses
    * the predicate, on EITHER dimension (LayoutSpec measures the skip
    * rate; this query pins the rewrite LOSSLESS via the DuckDB oracle over
    * the raw table). Integer-only aggregates so the hash-match is
    * FP-order-free.
    */
  def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    // source-fingerprinted memo tag — same rationale as [[bucketedJoin]]
    val tag = graft.io.Layout.dirTag(dir) + "_" +
      graft.io.Layout.sourceFingerprint(spark, s"$dir/events.parquet")
    val out = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"g_z_events_$tag").toString
    // memo = a session-scoped TEMP VIEW marker, not a JVM-lifetime set: a
    // new SparkSession in the same JVM (possibly over regenerated source
    // data) starts with an empty temp-view catalog and rewrites — exactly
    // the semantics bucketedJoin gets from its catalog tables
    val marker = s"g_z_events_done_$tag"
    layoutLock.synchronized {
      if (!spark.catalog.tableExists(marker)) {
        // clear rewrites (and session markers) of PREVIOUS fingerprints of
        // this dir — in-place regeneration must not leak full clustered
        // copies of events under the warehouse. No trailing underscore in
        // the prefix: the pre-fingerprint naming g_z_events_<dirtag> must
        // be swept too (ADVICE r14); fixed-width hex dirtags can't prefix
        // each other
        val dt = graft.io.Layout.dirTag(dir)
        val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
        val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(s"g_z_events_$dt") && n != s"g_z_events_$tag")
            fs.delete(st.getPath, true)
        }
        spark.catalog.listTables().collect().map(_.name)
          .filter(n => n.startsWith(s"g_z_events_done_$dt") && n != marker)
          .foreach(spark.catalog.dropTempView(_))
        graft.io.Layout.zorderWrite(
          Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("event_type")),
          out, "user_id", "event_id")
        spark.range(1).createOrReplaceTempView(marker)
      }
    }
    // manifest-aware read: a zorderWrite racing in another process (the
    // in-session path is serialized by layoutLock) pins pre- or post-swap
    graft.io.Layout.readDir(spark, out)
      .where(col("user_id").between(10, 60))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("user_id")).cast("long").as("sum_uid"),
        countDistinct(col("user_id")).as("n_users"))
  }
  /** B21 as a driver-visible query — the k-DIMENSIONAL z-ordered read
    * path ([[graft.io.Layout.zorderWriteK]] at k = 3): events rewrite
    * once per (dir, session) Morton-clustered on (user_id, event_id,
    * cents), then a roll-up predicated on CENTS ALONE reads the clustered
    * copy — the adversarial dimension: cents is the LAST (least-
    * significant-bit) clustering column, so this query exercises exactly
    * the dimension a 2-dim layout (or a linear sort) cannot skip on.
    * LifecycleSpec measures the per-dimension skip rate; this query pins
    * the k-dim rewrite LOSSLESS via the DuckDB oracle over the raw table
    * (integer-only aggregates — FP-order-free hash).
    */
  def zorder3Scan(spark: SparkSession, dir: String): DataFrame = {
    val tag = graft.io.Layout.dirTag(dir) + "_" +
      graft.io.Layout.sourceFingerprint(spark, s"$dir/events.parquet")
    val out = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"g_z3_events_$tag").toString
    val marker = s"g_z3_events_done_$tag"
    layoutLock.synchronized {
      if (!spark.catalog.tableExists(marker)) {
        // sweep rewrites/markers of previous fingerprints of this dir —
        // same in-place-regeneration hygiene as zorderScan
        val dt = graft.io.Layout.dirTag(dir)
        val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
        val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(s"g_z3_events_$dt") && n != s"g_z3_events_$tag")
            fs.delete(st.getPath, true)
        }
        spark.catalog.listTables().collect().map(_.name)
          .filter(n => n.startsWith(s"g_z3_events_done_$dt") && n != marker)
          .foreach(spark.catalog.dropTempView(_))
        graft.io.Layout.zorderWriteK(
          Tables.events(spark, dir).select(col("event_id"), col("user_id"),
            col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
          out, Seq("user_id", "event_id", "cents"))
        spark.range(1).createOrReplaceTempView(marker)
      }
    }
    graft.io.Layout.readDir(spark, out)
      .where(col("cents").between(100, 2000))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).cast("long").as("sum_cents"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** B18 as a driver-visible query — the generation-pinned read path
    * (time travel). Once per (dir, session): orders land bucketed
    * ([[graft.io.Layout.writeBucketed]] — the pre-merge generation), then
    * a CDC merge deliberately CORRUPTS the live table — every 97th order
    * key gets its priority renamed to a value outside the domain and its
    * cents zeroed, and every 194th is tombstoned outright
    * ([[graft.io.Layout.mergeBucketed]]). The query then aggregates the
    * PINNED pre-merge generation ([[graft.io.Layout.readTableAt]]) while
    * the DuckDB oracle runs over the RAW table: a pin that leaks even one
    * merged row (foreign group key, zeroed sum) or loses one tombstoned
    * row hash-mismatches, so the gate checks epoch exactness end to end —
    * the "train epoch N+1 on the exact rows epoch N saw" guarantee that
    * motivated B18. LayoutQuerySpec pins non-vacuity: the LIVE read's
    * aggregate genuinely differs from the pinned one at test scale.
    * Integer-only aggregates keep the hash FP-order-free. Repeated calls
    * (bench iterations) measure only the pinned read, the serving shape.
    */
  def timetravelRead(spark: SparkSession, dir: String): DataFrame = {
    val src = s"$dir/orders.parquet"
    val tag = graft.io.Layout.dirTag(dir) + "_" +
      graft.io.Layout.sourceFingerprint(spark, src)
    val tbl = s"g_tt_orders_$tag"
    // memo marker lands LAST (after the merge): a crash mid-setup leaves
    // no marker and the next call rebuilds from scratch — same semantics
    // as zorderScan's
    val marker = s"g_tt_done_$tag"
    layoutLock.synchronized {
      if (!spark.catalog.tableExists(marker)) {
        // sweep tables + markers of previous fingerprints of this dir (and
        // any half-built table of THIS fingerprint — no marker yet means
        // the setup never completed)
        val dt = graft.io.Layout.dirTag(dir)
        spark.catalog.listTables().collect()
          .filter(t => t.name.startsWith(s"g_tt_orders_$dt")
            || t.name.startsWith(s"g_tt_done_$dt"))
          .foreach { t =>
            if (t.isTemporary) spark.catalog.dropTempView(t.name)
            else spark.sql(s"DROP TABLE IF EXISTS `${t.name}`")
          }
        val buckets = graft.io.Layout.deriveBuckets(spark, Seq(src))
        val base = Tables.orders(spark, dir).select(col("o_orderkey"),
          col("o_custkey"), col("o_orderpriority"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        graft.io.Layout.writeBucketed(base, tbl, "o_orderkey", buckets)
        // the corrupting delta: half the touched keys update (foreign
        // priority + zeroed cents — leaks shift BOTH group keys and sums),
        // the other half tombstone (a pin that dropped them undercounts)
        val delta = base
          .where(pmod(col("o_orderkey"), lit(97)) === 0)
          .withColumn("o_orderpriority", lit("9-POST-PIN"))
          .withColumn("cents", lit(0L))
          .withColumn("_del", pmod(col("o_orderkey"), lit(194)) === 0)
        graft.io.Layout.mergeBucketed(spark, tbl, "o_orderkey", buckets,
          delta, deleteCol = Some("_del"))
        spark.range(1).createOrReplaceTempView(marker)
      }
    }
    val pin = graft.io.Layout.tableGenerations(spark, tbl).min
    graft.io.Layout.readTableAt(spark, tbl, pin)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents")).cast("long").as("sum_cents"),
        countDistinct(col("o_custkey")).as("n_custs"))
  }

  /** B14 as a driver-visible query — the exactly-once ingest landing
    * under the gate. Once per (dir, session): a third of events seeds the
    * bucketed table ([[graft.io.Layout.writeBucketed]]), the other two
    * thirds land as micro-batches via
    * [[graft.io.Layout.appendBucketedBatch]] — with batch 1 DELIVERED
    * TWICE, the crash-restart shape Structured Streaming's foreachBatch
    * contract produces (the sink must dedupe on batchId; the second
    * delivery must be a no-op, `require`d here so a regression fails the
    * query loudly). The DuckDB oracle aggregates the RAW table: a
    * re-delivery that appended would double batch 1's rows and
    * hash-mismatch, so the gate itself now checks the exactly-once
    * property end to end. Integer-only aggregates; repeated calls
    * measure only the bucketed read.
    */
  def ingestRead(spark: SparkSession, dir: String): DataFrame = {
    val src = s"$dir/events.parquet"
    val tag = graft.io.Layout.dirTag(dir) + "_" +
      graft.io.Layout.sourceFingerprint(spark, src)
    val tbl = s"g_in_events_$tag"
    val marker = s"g_in_done_$tag"
    layoutLock.synchronized {
      if (!spark.catalog.tableExists(marker)) {
        val dt = graft.io.Layout.dirTag(dir)
        spark.catalog.listTables().collect()
          .filter(t => t.name.startsWith(s"g_in_events_$dt")
            || t.name.startsWith(s"g_in_done_$dt"))
          .foreach { t =>
            if (t.isTemporary) spark.catalog.dropTempView(t.name)
            else spark.sql(s"DROP TABLE IF EXISTS `${t.name}`")
          }
        val buckets = graft.io.Layout.deriveBuckets(spark, Seq(src))
        val ev = Tables.events(spark, dir).select(col("event_id"),
          col("user_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        def slice(i: Int): DataFrame = ev.where(pmod(col("event_id"), lit(3)) === i)
        graft.io.Layout.writeBucketed(slice(0), tbl, "user_id", buckets)
        require(graft.io.Layout.appendBucketedBatch(slice(1), tbl, "user_id",
          buckets, batchId = 1L), "q_ingest_read: first delivery of batch 1 must land")
        require(!graft.io.Layout.appendBucketedBatch(slice(1), tbl, "user_id",
          buckets, batchId = 1L),
          "q_ingest_read: RE-delivery of batch 1 must be a no-op (exactly-once)")
        require(graft.io.Layout.appendBucketedBatch(slice(2), tbl, "user_id",
          buckets, batchId = 2L), "q_ingest_read: batch 2 must land")
        spark.range(1).createOrReplaceTempView(marker)
      }
    }
    graft.io.Layout.readTable(spark, tbl)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).cast("long").as("sum_cents"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** B16 as a driver-visible query — right-to-erasure under the gate.
    * Once per (dir, session): customer lands bucketed, then every 89th
    * custkey is erased via [[graft.io.Layout.forgetKeys]] (tombstone-merge
    * + hard purge of every retained recovery copy). The DuckDB oracle
    * aggregates the raw table MINUS the erased keys: a surviving victim
    * row inflates its segment's count/sum, a lost innocent row deflates
    * it — either hash-mismatches, so the gate checks both halves of the
    * erasure contract (victims gone, everyone else byte-intact).
    * LayoutSpec's raw-byte grep separately pins that the bytes (not just
    * the rows) are unrecoverable.
    */
  def erasureRead(spark: SparkSession, dir: String): DataFrame = {
    val src = s"$dir/customer.parquet"
    val tag = graft.io.Layout.dirTag(dir) + "_" +
      graft.io.Layout.sourceFingerprint(spark, src)
    val tbl = s"g_er_cust_$tag"
    val marker = s"g_er_done_$tag"
    layoutLock.synchronized {
      if (!spark.catalog.tableExists(marker)) {
        val dt = graft.io.Layout.dirTag(dir)
        spark.catalog.listTables().collect()
          .filter(t => t.name.startsWith(s"g_er_cust_$dt")
            || t.name.startsWith(s"g_er_done_$dt"))
          .foreach { t =>
            if (t.isTemporary) spark.catalog.dropTempView(t.name)
            else spark.sql(s"DROP TABLE IF EXISTS `${t.name}`")
          }
        val buckets = graft.io.Layout.deriveBuckets(spark, Seq(src))
        val cust = Tables.customer(spark, dir).select(col("c_custkey"),
          col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
        graft.io.Layout.writeBucketed(cust, tbl, "c_custkey", buckets)
        val victims = cust.select(col("c_custkey"))
          .where(pmod(col("c_custkey"), lit(89)) === 0)
        val erased = graft.io.Layout.forgetKeys(spark, tbl, "c_custkey", victims)
        require(erased > 0, "q_erasure_read: the victim set must be non-empty " +
          "(a vacuous erasure would pass the oracle without testing anything)")
        spark.range(1).createOrReplaceTempView(marker)
      }
    }
    graft.io.Layout.readTable(spark, tbl)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("bal_cents")).cast("long").as("sum_bal_cents"),
        countDistinct(col("c_nationkey")).as("n_nations"))
  }

  /** B19 as a driver-visible query — partitioned-directory erasure under
    * the gate, completing the lifecycle family (B14 q_ingest_read, B16
    * q_erasure_read, B18 q_timetravel). Once per (dir, session): events
    * land partitioned by event_type ([[graft.io.Layout.writePartitioned]]
    * — the event-log layout erasure must handle), then every 83rd user_id
    * is erased via [[graft.io.Layout.forgetKeysDir]] — the FILE-granular
    * path: the erasure key deliberately CROSSES every partition (user
    * rows scatter over all event_type dirs), so only the files actually
    * holding victims rewrite while clean files keep their inodes. The
    * DuckDB oracle aggregates the raw table MINUS the victims — a
    * surviving victim row or a lost innocent row hash-mismatches; the
    * partition column itself must survive the rewrite for the group keys
    * to match at all.
    */
  def erasureDirRead(spark: SparkSession, dir: String): DataFrame = {
    val src = s"$dir/events.parquet"
    val tag = graft.io.Layout.dirTag(dir) + "_" +
      graft.io.Layout.sourceFingerprint(spark, src)
    val out = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"g_ed_events_$tag").toString
    val marker = s"g_ed_done_$tag"
    layoutLock.synchronized {
      if (!spark.catalog.tableExists(marker)) {
        // sweep layouts/markers of previous fingerprints of this dir —
        // same in-place-regeneration hygiene as zorderScan
        val dt = graft.io.Layout.dirTag(dir)
        val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
        val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(s"g_ed_events_$dt") && n != s"g_ed_events_$tag")
            fs.delete(st.getPath, true)
        }
        spark.catalog.listTables().collect().map(_.name)
          .filter(n => n.startsWith(s"g_ed_done_$dt") && n != marker)
          .foreach(spark.catalog.dropTempView(_))
        val ev = Tables.events(spark, dir).select(col("event_id"),
          col("user_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        graft.io.Layout.writePartitioned(ev, out, "event_type")
        val victims = ev.select(col("user_id"))
          .where(pmod(col("user_id"), lit(83)) === 0)
        val erased = graft.io.Layout.forgetKeysDir(spark, out, "user_id", victims)
        require(erased > 0, "q_erasure_dir: the victim set must be non-empty " +
          "(a vacuous erasure would pass the oracle without testing anything)")
        spark.range(1).createOrReplaceTempView(marker)
      }
    }
    graft.io.Layout.readDir(spark, out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).cast("long").as("sum_cents"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** B22 as a driver-visible query — incremental aggregate maintenance
    * (the materialized-view upsert,
    * [[graft.io.Layout.maintainAdditive]]). Once per (dir, session): the
    * per-user (count, cents-sum) aggregate of a third of events seeds a
    * bucketed table, then the other two thirds fold in as maintenance
    * batches — each pass costs its batch plus the affected buckets,
    * never a table rewrite. The DuckDB oracle recomputes the SAME
    * aggregate from the raw table, so any maintenance drift (double
    * count, missed new key, lost contribution) hash-mismatches. The
    * serve-time property is the point at 100 TB — the query's own plan
    * is a bare bucketed scan: ZERO shuffles, zero aggregation at read
    * time (PlanSpec pins it), where the recompute pays a full scan +
    * shuffle on every consumer.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val src = s"$dir/events.parquet"
    val tag = graft.io.Layout.dirTag(dir) + "_" +
      graft.io.Layout.sourceFingerprint(spark, src)
    val tbl = s"g_ia_events_$tag"
    val marker = s"g_ia_done_$tag"
    layoutLock.synchronized {
      if (!spark.catalog.tableExists(marker)) {
        val dt = graft.io.Layout.dirTag(dir)
        spark.catalog.listTables().collect()
          .filter(t => t.name.startsWith(s"g_ia_events_$dt")
            || t.name.startsWith(s"g_ia_done_$dt"))
          .foreach { t =>
            if (t.isTemporary) spark.catalog.dropTempView(t.name)
            else spark.sql(s"DROP TABLE IF EXISTS `${t.name}`")
          }
        val buckets = graft.io.Layout.deriveBuckets(spark, Seq(src))
        val ev = Tables.events(spark, dir).select(col("event_id"),
          col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        def sliceAgg(i: Int): DataFrame = ev
          .where(pmod(col("event_id"), lit(3)) === i)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        graft.io.Layout.writeBucketed(sliceAgg(0), tbl, "user_id", buckets)
        // batch 1 folds into existing keys; batch 2 exercises the
        // new-key path too (users absent from earlier slices insert)
        graft.io.Layout.maintainAdditive(spark, tbl, "user_id", buckets, sliceAgg(1))
        graft.io.Layout.maintainAdditive(spark, tbl, "user_id", buckets, sliceAgg(2))
        spark.range(1).createOrReplaceTempView(marker)
      }
    }
    graft.io.Layout.readTable(spark, tbl)
  }

  // serializes both layout queries' check-then-write: two concurrent
  // first calls would otherwise race a drop/delete into a half-written
  // table or double-write the z-ordered copy. The SHARED Layout monitor —
  // compactBucketed's drop+rename swap takes the same one, so a layout
  // query never resolves a table name inside that window
  private def layoutLock: Object = graft.io.Layout.layoutLock

  /** A11 — co-group (reference: multi-schema TupleMRBuilder co-grouping,
    * MultipleInputsInterface.java): orders and lineitem grouped on orderkey.
    * Expressed as aggregate-then-join so both sides stay in whole-stage
    * codegen; the typed Dataset.cogroup equivalent lives in
    * [[graft.api.TupleJob]] for arbitrary reducer logic.
    */
  def coGroup(spark: SparkSession, dir: String): DataFrame = {
    val lineAgg = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(ExactMoney.sum2(col("l_extendedprice")).as("line_total"),
        count(lit(1)).as("n_lines"))
    Tables.orders(spark, dir)
      .join(lineAgg, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_totalprice"),
        coalesce(col("line_total"), lit(0).cast("double")).as("line_total"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"))
  }

  /** A11b — N-way multi-schema co-group (reference:
    * tuplemr/TupleMRConfigBuilder.java:73 addIntermediateSchema ×N +
    * setSchemaOrder; behavior in core test TestMultipleSchemas.java): three
    * heterogeneous inputs (customer, orders, events) co-grouped on one key
    * in a single shuffle via [[graft.api.TupleJob.coGroupMulti]]'s tagged
    * union; the reducer counts tuples per schema from the one schema-ordered
    * stream. Integer-only output so the cross-engine oracle is exact.
    */
  def coGroupMultiCounts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.api.TupleJob
    val cust = Tables.customer(spark, dir).select(col("c_custkey").cast("long").as("k"))
    val ords = Tables.orders(spark, dir).select(col("o_custkey").cast("long").as("k"))
    val evts = Tables.events(spark, dir).select(col("user_id").cast("long").as("k"))
    val out = StructType(Seq(StructField("k", LongType),
      StructField("n_cust", LongType), StructField("n_orders", LongType),
      StructField("n_events", LongType)))
    TupleJob.coGroupMulti(
      Seq(TupleJob.CoInput(cust), TupleJob.CoInput(ords), TupleJob.CoInput(evts)),
      Seq("k"), out) { (key, tuples) =>
      var a = 0L; var b = 0L; var c = 0L
      tuples.foreach { case (i, _) =>
        if (i == 0) a += 1 else if (i == 1) b += 1 else c += 1
      }
      Iterator(Row(key.getLong(0), a, b, c))
    }
  }

  /** A12 — moving average (reference: examples/.../MovingAverage.java):
    * per-user daily click counts, 3-day trailing mean. Two window passes ride
    * one exchange keyed by user_id.
    */
  def movingAverage(spark: SparkSession, dir: String, days: Int = 3): DataFrame = {
    val daily = Tables.events(spark, dir)
      .where(col("event_type") === "click")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("clicks"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(-(days - 1), Window.currentRow)
    daily.withColumn("mavg", round(avg(col("clicks")).over(w), 6))
  }

  /** A31 — time-RANGE sliding window: trailing-N-calendar-day click count
    * per user per active day. Deliberately distinct from A12's ROWS frame:
    * a RANGE frame bounds by VALUE, so gaps in a user's day sequence
    * shrink the window — the trailing week is 7 calendar days, not the
    * last 7 ACTIVE days, which is the semantics reporting actually wants.
    * Spark plans a RangeFrame over the same single user-keyed exchange as
    * the rows version (PlanSpec-pinned); the day ordinal keeps the frame
    * arithmetic integer-exact on both engines.
    */
  def rangeWindow(spark: SparkSession, dir: String, days: Int = 7): DataFrame = {
    val daily = Tables.events(spark, dir)
      .where(col("event_type") === "click")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("clicks"))
      .withColumn("day_ord", datediff(col("day"), lit("1995-01-01")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_ord"))
      .rangeBetween(-(days - 1), Window.currentRow)
    daily
      .withColumn("wk_clicks", sum(col("clicks")).over(w))
      .select(col("user_id"), col("day"), col("clicks"), col("wk_clicks"))
  }

  /** A13 — per-group normalization
    * (reference: examples/.../UserActivityNormalizer.java): each user's
    * activity share per event type. Pangool needed a two-job pass; here the
    * group total is a window sum over the same shuffle.
    */
  def normalize(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("user_id"))
    counts
      .withColumn("total", sum(col("cnt")).over(w))
      .select(col("user_id"), col("event_type"), col("cnt"),
        round(col("cnt") / col("total"), 6).as("share"))
  }

  /** A16 — topic fingerprint (reference: examples/.../TopicFingerprint.java):
    * top-N words per topic. Reuses the topical word count then one window.
    */
  def topicFingerprint(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("word"))
    topicalWordCount(spark, dir)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= n)
      .select(col("source"), col("rk"), col("word"), col("cnt"))
  }

  /** A16b — topic fingerprint in the reference's compact-BitField output
    * shape (reference: io/BitField.java:46; examples/.../TopicFingerprint
    * .java's reducer also emits the per-topic totalcount named output):
    * each source's top-N words become set bits in a fixed-width packed
    * bitset, positions = the word's rank in the sorted global top-word
    * vocabulary. The 128-bit set is built with
    * [[graft.functions.BitFieldOps.fromPositions]] and emitted as its two
    * scalar words (plus the totalcount), which keeps the oracle compare on
    * plain BIGINTs. The vocab index is a ≤ n·sources-row artifact —
    * broadcast, never shuffled.
    */
  def topicFingerprintBits(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val top = topicFingerprint(spark, dir, n)
    // Rank the vocab WITHOUT a global window: one collect_set aggregate
    // (map-side partial) folds the ≤ n·|sources| top words into a single
    // sorted array, posexplode re-emits (rank, word). Same result as a
    // global row_number, but the plan states the boundedness — an agg to
    // one row — instead of a single-partition sort over "everything".
    val vocab = top
      .agg(array_sort(collect_set(col("word"))).as("ws"))
      .select(posexplode(col("ws")).as(Seq("idx", "word")))
      .select(col("word"), col("idx").cast("long").as("idx"))
    val bits = graft.functions.BitFieldOps.fromPositions(
      array_sort(collect_list(col("idx"))), 128)
    top.join(broadcast(vocab), "word")
      .groupBy(col("source"))
      .agg(bits.as("bits"), sum(col("cnt")).as("totalcount"))
      .select(col("source"),
        element_at(col("bits"), 1).as("bits_0"),
        element_at(col("bits"), 2).as("bits_1"),
        col("totalcount"))
  }

  /** A20 — left-semi join: customers having ≥1 urgent order. Semi joins
    * shuffle only the join keys of the right side — the cheapest existence
    * check at scale.
    */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** A21 — left-anti join: customers with no urgent order. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** A22 — lag windows: mean gap between consecutive events per user. */
  def lagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .where(col("prev_us").isNotNull)
      .groupBy(col("user_id"))
      // integer-exact outputs: engines disagree on round() at 4dp
      // boundaries (BigDecimal HALF_UP vs double-multiply), so emit the
      // exact sum and its floor-division mean instead of a rounded double
      .agg(count(lit(1)).as("n_gaps"),
        sum(unix_micros(col("ts")) - col("prev_us")).as("total_gap_us"))
      .withColumn("mean_gap_us", expr("total_gap_us div n_gaps"))
  }

  /** A23 — relational set ops at (user, hour) granularity: hours where a
    * user both clicked and purchased but reported no error.
    * INTERSECT/EXCEPT plan as semi/anti joins with set semantics.
    * (User-level sets are vacuous on this data — every user has every
    * event type — so the sparser slot granularity keeps the query honest.)
    */
  def setOps(spark: SparkSession, dir: String): DataFrame =
    // One scan + one aggregation instead of INTERSECT/EXCEPT over three
    // scans (3 distincts + 2 set-op shuffles → 1 shuffle with map-side
    // partial max). (click ∩ purchase) \ error ≡ group by slot HAVING
    // clicked AND purchased AND NOT errored; set semantics come free from
    // the groupBy. r2 bench: 1.08 s → this shape 0.58 s at sf0.1 (best of 3).
    Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase", "error"))
      .groupBy(col("user_id"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"))
      .agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("e"))
      .where(col("c") === 1 && col("p") === 1 && col("e") === 0)
      .select(col("user_id"), col("hour_ms"))

  /** A17 — distinct / exact row dedup: distinct users per event type. */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
      .distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))

  /** A24 — TPC-H Q3 shape (shipping-priority): the canonical 3-table
    * fact-to-fact join. Both date filters push to the scans, the
    * segment-filtered customer key set broadcasts, orders⋈lineitem is the
    * one real (sort-merge at scale, AQE-broadcast here) join; global top-10
    * is TakeOrdered on the (rounded revenue, key) total order — never a
    * full sort.
    */
  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cut = expr("TIMESTAMP '1996-07-01 00:00:00'")
    val c = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir).where(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir).where(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(ExactMoney.sumUnits4Col(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** A25 — TPC-H Q5 shape (local-supplier volume): the 6-table snowflake
    * with the extra same-nation equi-condition. region→nation→supplier
    * broadcast down the snowflake; the only shuffles are the two fact
    * joins and the final 5-row nation agg.
    */
  def tpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val lo = expr("TIMESTAMP '1996-01-01 00:00:00'")
    val hi = expr("TIMESTAMP '1997-01-01 00:00:00'")
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(ExactMoney.sumUnits4Col(col("rev")).as("revenue"))
  }

  /** A26 — TPC-H Q18 shape (large-volume customers): a HAVING-filtered
    * order set driving a multi-join + top-100. Spark-first: the lineitem
    * aggregate IS the qualifying set (one scan serves both the filter and
    * the reported quantity sum — the subquery form would scan lineitem
    * twice), the orders join keys on it, customer broadcasts (AQE keeps
    * that decision at any SF where it fits), and the top-100 plans as
    * TakeOrderedAndProject — bounded per-partition heaps, no global sort.
    * o_orderkey tiebreak makes the LIMIT deterministic under ties.
    */
  /** A28 — TPC-H Q6 shape (forecast revenue change): the pure-scan query.
    * All three predicates (shipdate year, discount band, quantity cap)
    * push into the parquet scan — row groups skip on column stats and the
    * scan reads 4 of 11 columns — then one partial agg and a 1-row
    * exchange. No join, no window: this is the query whose entire cost IS
    * scan efficiency, which is why it's the classic pushdown benchmark.
    * Exact-decimal revenue (price·discount is 2dp·2dp → exact 4dp).
    */
  def tpchQ6(spark: SparkSession, dir: String): DataFrame = {
    val lo = expr("TIMESTAMP '1996-01-01 00:00:00'")
    val hi = expr("TIMESTAMP '1997-01-01 00:00:00'")
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(ExactMoney.sumUnits4Col(ExactMoney.centsCol(col("l_extendedprice"))
          * round(col("l_discount") * lit(100)).cast("long")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** A27 — TPC-H Q10 shape (returned-item reporting): revenue lost to
    * returns per customer in one quarter, top 20 with customer/nation
    * decoration. Spark-first: both fact filters (returnflag = 'R', the
    * orderdate quarter) push to their scans, the fact-fact join keys on
    * orderkey, and — unlike the textbook group-after-join plan — revenue
    * aggregates per custkey BEFORE any dimension join, so the customer
    * join sees ≤ #active-customer rows and the top-20 is taken before
    * decoration: the nation/customer joins touch exactly 20 rows.
    * Exact-decimal revenue; c_custkey tiebreak makes the LIMIT
    * deterministic.
    */
  def tpchQ10(spark: SparkSession, dir: String, n: Int = 20): DataFrame = {
    val lo = expr("TIMESTAMP '1996-01-01 00:00:00'")
    val hi = expr("TIMESTAMP '1996-04-01 00:00:00'")
    val l = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val top = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(ExactMoney.sumUnits4Col(col("rev")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(n)
    top
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue"), col("n_items"), col("c_acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
  }

  def tpchQ18(spark: SparkSession, dir: String, minQty: Double = 250.0,
      n: Int = 100): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .where(col("sum_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        // o_orderdate is TIMESTAMP_NTZ; the UTC session makes the cast
        // wall-clock-preserving, matching DuckDB's epoch_ms
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(n)
  }

  /** A29 — TPC-H Q12 shape (shipping-priority audit): lines shipped in a
    * year, counted per return flag split by order urgency. The schema has
    * no l_shipmode/receiptdate, so the flag plays Q12's shipmode and the
    * shipdate year its receipt window — the SHAPE is Q12's defining one:
    * a fact-fact equi-join feeding conditional counts.
    *
    * Spark-first: the year filter pushes to the lineitem scan (cuts the
    * shuffle to ~1/7 of lines before anything moves); neither side
    * broadcasts — orders scales with the fact table, so this is the
    * honest shuffle-join benchmark, the complement of q_join_broadcast —
    * and the CASE counts partial-aggregate map-side after the join, so
    * the final exchange carries 3 rows of counters.
    */
  def tpchQ12(spark: SparkSession, dir: String): DataFrame = {
    val lo = expr("TIMESTAMP '1996-01-01 00:00:00'")
    val hi = expr("TIMESTAMP '1997-01-01 00:00:00'")
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** A30 — TPC-H Q14 shape (promotion effect): the share of one month's
    * revenue earned by promo parts. Spark-first: the month filter pushes
    * to the lineitem scan; part joins on partkey projected to two columns
    * (broadcast at test SFs by AQE's own threshold — NOT pinned, because
    * part scales with the corpus and at 100 TB this is a shuffle join on
    * partkey, which AQE picks without a code change).
    *
    * Money discipline per [[ExactMoney]]: exact decimal inside, DOUBLE
    * out; the ratio is an integer ppm via exact cent arithmetic —
    * BIGINT floor division is bit-identical cross-engine, where a double
    * divide would hash on 1-ulp luck. (promo_cents·10⁶ overflows BIGINT
    * only past ~$92B of monthly promo revenue — ~sf500 territory; the
    * month's sums themselves stay exact at any scale.)
    */
  def tpchQ14(spark: SparkSession, dir: String): DataFrame = {
    val lo = expr("TIMESTAMP '1996-09-01 00:00:00'")
    val hi = expr("TIMESTAMP '1996-10-01 00:00:00'")
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_partkey"),
        ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg((ExactMoney.sumUnitsRaw(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(0L))) / lit(10000)).cast("decimal(18,2)").as("promo_d"),
        (ExactMoney.sumUnitsRaw(col("rev")) / lit(10000))
          .cast("decimal(18,2)").as("total_d"))
      .select(col("promo_d").cast("double").as("promo_rev"),
        col("total_d").cast("double").as("total_rev"),
        expr("CAST(promo_d * 100 AS BIGINT) * 1000000 div CAST(total_d * 100 AS BIGINT)")
          .as("promo_ppm"))
  }

  /** A32 — TPC-H Q4 shape (order-priority checking): orders placed in one
    * quarter that had at least one late-shipped line, counted per
    * priority. The schema has no l_commitdate/l_receiptdate, so "late"
    * is l_shipdate > o_orderdate + 60 days — which preserves the SHAPE
    * that defines Q4: an EXISTS that must evaluate a RESIDUAL (non-equi,
    * correlated) predicate inside a semi-join.
    *
    * Spark-first: the quarter filter pushes to the orders scan, lineitem
    * prunes to (l_orderkey, l_shipdate), and the EXISTS plans as a
    * LEFT SEMI join — per-order dedup happens inside the join operator
    * (a first-match short-circuit), never as a distinct-then-join. At
    * 100 TB both sides are facts, so this is a shuffle semi-join on
    * orderkey whose build side carries 12 bytes/row; the semi-join output
    * is at most one row per order regardless of line fan-out.
    */
  def tpchQ4(spark: SparkSession, dir: String): DataFrame = {
    val lo = expr("TIMESTAMP '1996-07-01 00:00:00'")
    val hi = expr("TIMESTAMP '1996-10-01 00:00:00'")
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** A33 — TPC-H Q13 shape (customer order distribution): how many
    * customers placed 0, 1, 2, … qualifying orders. The schema has no
    * o_comment, so the "special orders" exclusion is priority ≠ 1-URGENT —
    * the defining SHAPE survives: a filtered LEFT OUTER join that must
    * keep order-less customers (their count is the distribution's 0
    * bucket, which an inner join would silently drop), then a two-level
    * aggregation whose second level is tiny.
    *
    * Spark-first: the join and the first groupBy both key on custkey, so
    * once the join shuffles, the per-customer count reuses that
    * partitioning — no second wide exchange; the distribution agg moves
    * only (#distinct counts) rows. At 100 TB orders is the fact side and
    * customer the (large) dim: a shuffle join whose probe side was
    * pre-filtered at the scan.
    */
  def tpchQ13(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** A34 — TPC-H Q7 shape (volume shipping): bilateral revenue flow
    * between two nations per ship year. The defining shape: a symmetric
    * nation-PAIR predicate that no single dimension filter can express —
    * both directions survive, same-nation trade does not.
    *
    * Spark-first: the 2-nation supplier set broadcasts (it prunes
    * lineitem to ~8% before the fact-fact join); customer joins AFTER
    * orders so the custkey shuffle carries only date+nation-filtered
    * rows, and the cross-pair inequality applies as a residual on the
    * last join. At 100 TB the two fact joins shuffle on their natural
    * keys; the 4-row (pair × year) agg is map-side partial.
    */
  def tpchQ7(spark: SparkSession, dir: String,
      nationA: String = "NATION_3", nationB: String = "NATION_4"): DataFrame = {
    val lo = expr("TIMESTAMP '1996-01-01 00:00:00'")
    val hi = expr("TIMESTAMP '1998-01-01 00:00:00'")
    val nations = Tables.nation(spark, dir)
      .where(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey") &&
        col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(ExactMoney.sumUnits4Col(col("rev")).as("revenue"))
  }

  /** A35 — TPC-H Q8 shape (national market share): one nation's share of
    * a region's revenue in one part segment, per order year. The shape is
    * Q14's conditional-ratio agg stretched across the FULL snowflake —
    * every dimension (part type, customer region, supplier nation)
    * constrains a different join branch.
    *
    * Spark-first: the type-filtered part key set prunes lineitem first
    * (smallest selectivity), the region-filtered customer set semi-joins
    * after orders, and supplier broadcasts 2 columns wide for the
    * share split. Share = integer ppm via exact cent arithmetic (the Q14
    * rule — a double divide would hash on 1-ulp luck cross-engine).
    */
  def tpchQ8(spark: SparkSession, dir: String, nationKey: Int = 5,
      region: String = "ASIA", ptype: String = "ECONOMY"): DataFrame = {
    val lo = expr("TIMESTAMP '1996-01-01 00:00:00'")
    val hi = expr("TIMESTAMP '1998-01-01 00:00:00'")
    val regionCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .where(col("r_name") === region)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
      .join(Tables.part(spark, dir).where(col("p_type") === ptype)
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
        .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(regionCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg((ExactMoney.sumUnitsRaw(when(col("s_nationkey") === nationKey, col("rev"))
            .otherwise(lit(0L))) / lit(10000)).cast("decimal(18,2)").as("nation_d"),
        (ExactMoney.sumUnitsRaw(col("rev")) / lit(10000))
          .cast("decimal(18,2)").as("total_d"))
      .select(col("o_year"),
        col("nation_d").cast("double").as("nation_rev"),
        col("total_d").cast("double").as("total_rev"),
        expr("CAST(nation_d * 100 AS BIGINT) * 1000000 div CAST(total_d * 100 AS BIGINT)")
          .as("mkt_share_ppm"))
  }

  /** A36 — TPC-H Q15 shape (top supplier): the quarter's revenue champion
    * — an aggregate compared against the MAX of the same aggregate. The
    * defining shape is the scalar-subquery self-reference; naively that
    * scans lineitem twice.
    *
    * Spark-first: the per-supplier agg materializes ONCE (localCheckpoint
    * — ~#suppliers rows), the 1-row max broadcasts back against it, and
    * only the winners (ties kept, per spec) decorate against supplier.
    * The max-compare happens in exact DECIMAL — equality on a derived
    * double would be 1-ulp folly — and the money cast to DOUBLE happens
    * in the final projection per the §6 rule.
    */
  def tpchQ15(spark: SparkSession, dir: String): DataFrame = {
    val lo = expr("TIMESTAMP '1996-01-01 00:00:00'")
    val hi = expr("TIMESTAMP '1996-04-01 00:00:00'")
    val rev = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_suppkey"))
      .agg((ExactMoney.sumUnitsRaw(
          ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")))
        / lit(10000)).cast("decimal(18,2)").as("total_d"))
      .localCheckpoint(false)
    val top = rev.agg(max(col("total_d")).as("max_d"))
    rev.join(broadcast(top), col("total_d") === col("max_d"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_d").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** A37 — TPC-H Q17 shape (small-quantity-order revenue): lines whose
    * quantity sits below 20% of their part's average. The defining shape
    * is the CORRELATED average — each line compares against an aggregate
    * of its own group.
    *
    * Spark-first: the brand/size part filter broadcasts and prunes
    * lineitem BEFORE the per-part stats, so the window aggregates only
    * the ~4% of lines that can qualify (the textbook correlated subquery
    * re-scans lineitem; a window over the filtered set is one shuffle,
    * zero re-scans). The 20%-of-average compare is exact integer
    * arithmetic: qty < sum/(5·cnt) ⟺ 5·qty·cnt < sum, with quantities
    * integer-valued doubles (exact to 2^53) — no FP boundary flips
    * cross-engine. avg_weekly = one deterministic double divide at the
    * end on an exact cent total.
    */
  def tpchQ17(spark: SparkSession, dir: String,
      brand: String = "Brand#3", maxSize: Int = 10): DataFrame = {
    val p = Tables.part(spark, dir)
      .where(col("p_brand") === brand && col("p_size") < maxSize)
      .select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
      .withColumn("sum_qty", sum(col("l_quantity")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .where(lit(5) * col("l_quantity") * col("cnt") < col("sum_qty"))
      .agg((ExactMoney.sumUnitsRaw(ExactMoney.centsCol(col("l_extendedprice")))
          / lit(100)).cast("decimal(18,2)").as("total_d"),
        count(lit(1)).as("n_lines"))
      .select(col("total_d").cast("double").as("total_rev"),
        (col("total_d").cast("double") / lit(7.0)).as("avg_yearly"),
        col("n_lines"))
  }

  /** A38 — TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    * an OR of three (brand, size-range, quantity-range) conjunctions that
    * spans BOTH join sides — the classic test of whether an engine can
    * still push anything down when the predicate is disjunctive.
    *
    * Spark-first: the LOSSLESS HULL of each disjunct pushes to its scan —
    * lineitem reads only quantity ∈ [1,30], part only size ∈ [1,15] ∧
    * brand ∈ {12,23,15} — then the exact disjunction evaluates as a
    * residual after the join (plan-pinned: both hull filters at the
    * scans). At 100 TB that hull cuts the join's probe side ~40% and the
    * build side ~90% before a single row moves.
    */
  def tpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .where(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"),
        ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev"))
    val p = Tables.part(spark, dir)
      .where(col("p_size").between(1, 15) &&
        col("p_brand").isin("Brand#12", "Brand#23", "Brand#15"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(ExactMoney.sumUnits4Col(col("rev")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** A39 — TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    * whose late line was the ONLY late line in a multi-supplier order.
    * The textbook form is EXISTS + NOT EXISTS against the same fact —
    * two extra scans and two correlated joins.
    *
    * Spark-first: ONE per-order aggregate answers both subqueries —
    * n_supp ≥ 2 supplies the EXISTS ("another supplier participated"),
    * n_late = 1 the NOT EXISTS ("no OTHER supplier was late"), and
    * max(late suppkey) identifies the culprit in the same pass (exactly
    * one late supplier exists in qualifying groups, so max IS that
    * supplier). "Late" = shipped >60 days after order date (the schema
    * has no commit/receipt dates — A32's substitution). At 100 TB: one
    * fact-fact shuffle join + one orderkey agg; the nation filter applies
    * to the ~#suppliers result, never the fact.
    */
  def tpchQ21(spark: SparkSession, dir: String,
      nation: String = "NATION_3"): DataFrame = {
    val o = Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    // Two-level exact aggregation instead of the twin countDistincts: the
    // (orderkey, suppkey) pre-aggregate collapses line items to supplier
    // participations map-side (plain codegen HashAggregate), and the
    // per-order counts over it need no distinct machinery at all — the
    // distinct-aggregate form paid a set-buffer per group for the same
    // numbers. n_supp = rows per order, n_late = suppliers with ANY late
    // line, late_supp = max such supplier: identical values by definition
    // (oracle re-verified hash-identical).
    val perOrder = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(late).as("slate"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("slate"), 1L).otherwise(0L)).as("n_late"),
        max(when(col("slate"), col("l_suppkey"))).as("late_supp"))
    perOrder
      .where(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)
            .where(col("n_name") === nation)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"))),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** A40 — TPC-H Q22 shape (global sales opportunity): dormant customers
    * from a nation set holding above-average positive balances. Two
    * defining sub-shapes: a SCALAR subquery (the average) every row
    * compares against, and an ANTI join ("no orders since the cutoff" —
    * the full no-orders test is empty at this data's order density, so
    * recency carries the shape).
    *
    * Spark-first: the 1-row (sum, count) aggregate broadcasts and the
    * above-average test runs as exact decimal cross-multiplication
    * (bal·n > sum — an FP average would flip boundary customers
    * cross-engine); the anti join shuffles custkey against date-pruned
    * orders. At 100 TB the anti join's build side is the date-filtered
    * order keys — the scan prunes first.
    */
  def tpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val sel = Tables.customer(spark, dir)
      .where(col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
      .select(col("c_custkey"), col("c_nationkey"),
        ExactMoney.centsCol(col("c_acctbal")).as("bal_c"))
    val stats = sel.where(col("bal_c") > 0)
      .agg(ExactMoney.sumUnitsRaw(col("bal_c")).as("s"), count(lit(1)).as("n"))
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= expr("TIMESTAMP '2000-01-01 00:00:00'"))
      .select(col("o_custkey"))
    sel.crossJoin(broadcast(stats))
      .where(col("bal_c").cast("decimal(38,0)") * col("n") > col("s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        ExactMoney.sumCentsCol(col("bal_c")).as("totacctbal"))
  }

  /** The part-supplier catalog the schema doesn't ship: TPC-H's partsupp
    * relation derived from observed sales — one row per distinct
    * (l_partkey, l_suppkey) pair with ps_supplycost = the cheapest
    * observed sale (min l_extendedprice, an exact-2dp double; min is
    * order-independent, so no decimal accumulation is needed). Q2, Q9,
    * Q11, Q16 and Q20 all consume this relation, which is how the
    * partsupp-backed TPC-H shapes keep their defining structure on a
    * schema without the table. At 100 TB the derivation is one
    * 3-column lineitem scan + one (partkey, suppkey)-keyed partial-min
    * agg — pair cardinality is |part|·avg-suppliers, dimension-scale,
    * NOT fact-scale. The `lineitem` parameter lets callers derive it
    * from an already-pruned lineitem subset (supplycost per pair is
    * unchanged by dropping OTHER parts' rows, so pruning first is
    * lossless).
    */
  private def derivedPartsupp(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice")).as("ps_supplycost"))

  /** A41 — TPC-H Q2 shape (minimum-cost supplier): for each qualifying
    * part, the EUROPE supplier whose derived supply cost equals the
    * part's minimum among EUROPE suppliers — the textbook correlated
    * MIN subquery re-joined on equality, snowflake-filtered, top-100.
    *
    * Spark-first: the size/type part filter broadcasts its ~1% key set
    * into the lineitem scan BEFORE the partsupp derivation (supplycost
    * per pair doesn't change when other parts' rows are dropped — the
    * agg shuffle shrinks ~60×), the EUROPE supplier dimension
    * broadcasts (~1/5 of all suppliers — 2k·sf rows of 4 narrow
    * columns, a few MB even at SF100k, within the repo-wide
    * supplier-as-broadcast-dimension convention), and the correlated
    * MIN plans as a window over the
    * part key with the equality test on EXACT doubles (min of observed
    * 2dp values — never an accumulated sum, so double equality is
    * sound). Top-100 plans as TakeOrderedAndProject on a total order:
    * (acctbal desc, nation, supplier, partkey, suppkey) — the trailing
    * s_suppkey tiebreak makes the sort key a superset of the row key
    * (p_partkey, s_suppkey), so the order is deterministic under LIMIT
    * without assuming supplier names are unique.
    */
  def tpchQ2(spark: SparkSession, dir: String,
      pType: String = "LARGE", maxSize: Int = 10): DataFrame = {
    val pk = Tables.part(spark, dir)
      .where(col("p_type") === pType && col("p_size") <= maxSize)
      .select(col("p_partkey"), col("p_brand"))
    val euro = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val ps = derivedPartsupp(Tables.lineitem(spark, dir)
      .join(broadcast(pk.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi"))
    val w = Window.partitionBy(col("ps_partkey"))
    ps.join(broadcast(euro), col("ps_suppkey") === col("s_suppkey"))
      .withColumn("mincost", min(col("ps_supplycost")).over(w))
      .where(col("ps_supplycost") === col("mincost"))
      .join(broadcast(pk), col("ps_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("s_suppkey"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("s_suppkey"))
      .limit(100)
      .drop("s_suppkey")
  }

  /** A42 — TPC-H Q9 shape (product-type profit): margin per nation per
    * order-year over name-matched parts, where the cost side comes from
    * the derived partsupp relation via the (partkey, suppkey) join —
    * Q9's defining feature. With no ps_availqty the margin is
    * revenue − supplycost per line ("over best observed price"); the
    * 6-relation join tree and the nation×year rollup are unchanged.
    *
    * Spark-first: ONE name-filtered lineitem materialization
    * (localCheckpoint, the Q15 single-scan pattern) feeds BOTH the
    * partsupp derivation and the detail side, so the fact scans once;
    * the (partkey, suppkey) agg→join sequence reuses the agg's own
    * hash partitioning on the build side. Supplier and nation broadcast;
    * orders joins on orderkey for the year. Money: revenue decimal(12,2)
    * ·(1−disc) minus cost decimal(12,2), summed exact, cents HALF_UP,
    * DOUBLE out (§6 rule; DuckDB twin rounds the same sum).
    */
  def tpchQ9(spark: SparkSession, dir: String,
      nameToken: String = "widget"): DataFrame = {
    val pk = Tables.part(spark, dir)
      .where(col("p_name").contains(nameToken))
      .select(col("p_partkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
      .localCheckpoint(false)
    val amount =
      ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")) -
        ExactMoney.centsCol(col("ps_supplycost")) * lit(100L)
    l.join(derivedPartsupp(l),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(ExactMoney.sumUnits4Col(amount).as("sum_profit"))
  }

  /** A43 — TPC-H Q11 shape (important stock): parts whose catalog value
    * among one region's suppliers exceeds a fixed fraction of the
    * GLOBAL such value — the scalar-subquery-in-HAVING shape.
    *
    * Spark-first: the region→nation→supplier snowflake broadcasts into
    * the derived partsupp, the per-part value aggregates in exact
    * decimal, and the global total is a 1-row RE-aggregation of that
    * same result (localCheckpoint — never a second partsupp pass)
    * broadcast back for an exact cross-multiplied threshold
    * (val·1000 > total; a double fraction would flip boundary parts
    * cross-engine). Output value is DOUBLE per the §6 money rule.
    */
  def tpchQ11(spark: SparkSession, dir: String,
      rName: String = "ASIA", denom: Int = 1000): DataFrame = {
    val rs = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .where(col("r_name") === rName)),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = derivedPartsupp(Tables.lineitem(spark, dir))
      .join(broadcast(rs), col("ps_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("ps_partkey"))
      .agg(ExactMoney.sumUnitsRaw(ExactMoney.centsCol(col("ps_supplycost"))).as("val"))
      .localCheckpoint(false)
    val total = value.agg(sum(col("val")).as("t"))
    value.crossJoin(broadcast(total))
      .where(col("val") * denom > col("t"))
      .select(col("ps_partkey"), ExactMoney.toMoney(col("val") / lit(100)).as("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** A44 — TPC-H Q16 shape (supplier counts by part attribute): distinct
    * suppliers per (brand, type, size) over qualifying parts, EXCLUDING
    * a supplier denylist — the NOT-IN-subquery + COUNT DISTINCT shape
    * (the schema has no s_comment, so negative balance is the
    * "complaints" stand-in).
    *
    * Spark-first: the denylist (~9% of suppliers — 0.9k·sf single-key
    * rows, broadcast-safe at any realistic SF since suppliers are
    * dimension-scale) broadcasts as a LeftAnti join
    * against the derived pairs, the brand/size part filter broadcasts,
    * and COUNT DISTINCT over (attrs, suppkey) plans as Spark's two-level
    * expand-free distinct agg — the heavy dedup happened in the
    * partsupp derivation itself. Ordered by count desc + full attribute
    * tiebreak for a deterministic listing.
    */
  def tpchQ16(spark: SparkSession, dir: String): DataFrame = {
    val deny = Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
    val pf = Tables.part(spark, dir)
      .where(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    // RAW (partkey, suppkey) projection, NOT derivedPartsupp: the pair
    // groupBy's whole-lineitem exchange is redundant here — countDistinct
    // dedups suppliers per group itself (duplicate pair rows can't change
    // a distinct count; deny is an anti-join and pf is unique per partkey,
    // so join multiplicity is untouched) — and dropping it lets the ~6×
    // brand/size part filter prune BEFORE the one remaining agg shuffle
    // instead of after a full-pairs shuffle (guide §2.1/§2.3).
    Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .join(broadcast(deny), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** A45 — TPC-H Q20 shape (part promotion): EUROPE suppliers who
    * DOMINATED shipments of a name-matched part in 1998 — shipped more
    * than half that part's year total. The defining shape is the
    * doubly-nested correlated aggregate (per-(part, supp) qty vs 50% of
    * a per-part aggregate) feeding a semi-join chain up to the
    * nation-filtered supplier listing (no ps_availqty in this schema,
    * so the 50% threshold tests observed share instead of stock).
    *
    * Spark-first: the year filter is a pushed shipdate RANGE (never
    * `year(col)` — that defeats parquet pushdown), the red-part key set
    * broadcasts into the scan, quantities sum as exact BIGINTs
    * (integral doubles), the per-part total is a window over the
    * (part, supp) agg (no lineitem re-scan), and the 2·q > total
    * compare is exact integer arithmetic. The surviving supplier keys
    * dedup at dimension scale before the broadcast semi-join into the
    * EUROPE supplier listing.
    */
  def tpchQ20(spark: SparkSession, dir: String,
      adjective: String = "red ", rName: String = "EUROPE"): DataFrame = {
    val pk = Tables.part(spark, dir)
      .where(col("p_name").startsWith(adjective))
      .select(col("p_partkey"))
    val sp = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= expr("TIMESTAMP '1998-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '1999-01-01 00:00:00'"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val dominant = sp
      .withColumn("qp", sum(col("q")).over(Window.partitionBy(col("l_partkey"))))
      .where(lit(2) * col("q") > col("qp"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .where(col("r_name") === rName)),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }
}
