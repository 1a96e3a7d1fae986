package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only probe for the r15 q_bucketed_join sf10 investigation: times the
  * first (write-inclusive) and subsequent (read-path) calls separately and
  * prints the executed plan's exchange count.
  *
  * Run: sbt "Test/runMain graft.LayoutProbe testdata/sf10"
  *
  * `merge` mode (r17): exercises the PHYSICAL CDC path at scale — builds
  * the bucketed lineitem, applies a ~1%-of-keys delta through
  * mergeBucketed, asserts only the affected buckets' files were replaced
  * and the zero-Exchange self-join contract survives, and prints the
  * build/merge wall times. This is the operator a 100 TB deployment runs
  * nightly; it gets a 100× number like everything else.
  *
  * Run: sbt -J-Xmx64g "Test/runMain graft.LayoutProbe testdata/sf10 merge"
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "testdata/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("layout-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.operators.Relational.bucketedJoin(spark, dir)
      val built = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val ran = (System.nanoTime() - t1) / 1e9
      val p = df.queryExecution.explainString(FormattedMode)
      val ex = p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))
      println(f"[probe] $label%-8s build=$built%7.2f s  run=$ran%7.2f s  exchanges=$ex")
      if (ex > 0) println(p.take(3000))
    }
    if (args.length > 1 && args(1) == "merge") mergeProbe(spark, dir)
    else if (args.length > 1 && args(1) == "ingest") ingestProbe(spark, dir)
    else if (args.length > 1 && args(1) == "timetravel") timeTravelProbe(spark, dir)
    else if (args.length > 1 && args(1) == "maintain") maintainProbe(spark, dir)
    else {
      run("call-1")
      run("call-2")
      run("call-3")
    }
    spark.stop()
  }

  /** B14 at scale: exactly-once micro-batch append into the bucketed sf10
    * lineitem — times the full build vs one ~1% batch append (data cost +
    * the O(live files) manifest rewrite) vs the re-delivery no-op
    * (metadata only), and asserts base files untouched + zero-Exchange
    * preserved + the no-op appended nothing.
    *
    * Run: sbt -J-Xmx64g "Test/runMain graft.LayoutProbe testdata/sf10 ingest"
    */
  private def ingestProbe(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.io.Layout
    val table = "probe_ingest_lineitem"
    val buckets = 16
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def inventory(): Map[String, (Long, Long)] = {
      val loc = new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE TABLE EXTENDED `$table`")
          .where(col("col_name") === "Location").first().getString(1)))
      loc.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val (base, batch) = (li.where(pmod(col("l_orderkey"), lit(97)) =!= 0),
      li.where(pmod(col("l_orderkey"), lit(97)) === 0))
    val t0 = System.nanoTime()
    Layout.writeBucketed(base, table, "l_orderkey", buckets)
    val built = (System.nanoTime() - t0) / 1e9
    val before = inventory()
    val baseRows = spark.table(table).count()
    val batchRows = batch.count()
    val t1 = System.nanoTime()
    require(Layout.appendBucketedBatch(batch, table, "l_orderkey", buckets, 0L))
    val appended = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    require(!Layout.appendBucketedBatch(batch, table, "l_orderkey", buckets, 0L))
    val noop = (System.nanoTime() - t2) / 1e9
    val after = inventory()
    val baseUntouched = before.forall { case (n, m) => after.get(n).contains(m) }
    val total = Layout.readTable(spark, table).count()
    val t = Layout.readTable(spark, table)
    val p = t.join(t.groupBy("l_orderkey").count(), "l_orderkey")
      .queryExecution.explainString(FormattedMode)
    val ex = p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))
    println(f"[probe] ingest: base=$baseRows%,d batch=$batchRows%,d " +
      f"build=$built%.1f s append=$appended%.1f s redeliveryNoop=$noop%.3f s " +
      f"baseFilesUntouched=$baseUntouched exchanges=$ex")
    require(baseUntouched, "the base table's files must be byte-identical after append")
    require(total == baseRows + batchRows, "re-delivery must not duplicate the batch")
    require(ex == 0, "zero-Exchange contract must survive the streamed append")
    spark.sql(s"DROP TABLE `$table`")
  }

  /** B22 at scale: incremental aggregate maintenance over sf10 events —
    * times the seed build vs ONE maintenance fold of a ~1%-of-rows batch
    * (the batch's own aggregation + the affected-bucket rewrite) vs the
    * re-delivery no-op (metadata only) vs the SERVE read, and asserts
    * exact integer parity with a from-raw recompute plus the
    * zero-Exchange serve plan.
    *
    * Run: sbt "Test/runMain graft.LayoutProbe testdata/sf10 maintain"
    * (64g via SPARK_DRIVER_MEM for sf10)
    */
  private def maintainProbe(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.io.Layout
    val table = "probe_maintain_events"
    val buckets = 16
    // through Tables.events: the generated dirs' ts physical type is
    // TIMESTAMP(NANOS), which a plain spark.read.parquet rejects
    val ev = graft.io.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    def aggOf(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    val (seed, batch) = (ev.where(pmod(col("event_id"), lit(97)) =!= 0),
      ev.where(pmod(col("event_id"), lit(97)) === 0))
    val t0 = System.nanoTime()
    Layout.writeBucketed(aggOf(seed), table, "user_id", buckets)
    val built = (System.nanoTime() - t0) / 1e9
    val batchRows = batch.count()
    val t1 = System.nanoTime()
    require(Layout.maintainAdditiveBatch(spark, table, "user_id", buckets,
      aggOf(batch), 0L))
    val folded = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    require(!Layout.maintainAdditiveBatch(spark, table, "user_id", buckets,
      aggOf(batch), 0L))
    val noop = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val served = Layout.readTable(spark, table)
    served.write.format("noop").mode("overwrite").save()
    val serve = (System.nanoTime() - t3) / 1e9
    val full = aggOf(ev)
    val exact = served.exceptAll(full).isEmpty && full.exceptAll(served).isEmpty
    val sp = served.queryExecution.explainString(FormattedMode)
    val ex = sp.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))
    println(f"[probe] maintain: batchRows=$batchRows%,d build=$built%.1f s " +
      f"fold=$folded%.2f s redeliveryNoop=$noop%.3f s serve=$serve%.2f s " +
      f"exact=$exact exchanges=$ex")
    require(exact, "maintained aggregate must equal the from-raw recompute")
    require(ex == 0, "serve read must plan zero Exchanges")
    spark.sql(s"DROP TABLE `$table`")
  }

  /** B18 at scale: generation-pinned reads across a live CDC merge on the
    * bucketed sf10 lineitem — times the pin RESOLUTION (driver-side: one
    * manifest read + three directory walks, O(live+retired files)) apart
    * from the pinned SCAN, and asserts the pinned epoch reproduces the
    * pre-merge row count + content marker exactly while the live read
    * serves the merged state. The claim this prices: "epoch N+1 re-reads
    * what epoch N saw" costs metadata at plan time, a plain parquet scan
    * at run time — nothing table-rewrite-shaped.
    *
    * Run: sbt -J-Xmx64g "Test/runMain graft.LayoutProbe testdata/sf10 timetravel"
    */
  private def timeTravelProbe(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.io.Layout
    val table = "probe_tt_lineitem"
    val buckets = 16
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val t0 = System.nanoTime()
    Layout.writeBucketed(li, table, "l_orderkey", buckets)
    val built = (System.nanoTime() - t0) / 1e9
    val epochGen = Layout.tableGenerations(spark, table).max
    val preCount = spark.table(table).count()
    val delta = li.where(pmod(col("l_orderkey"), lit(97)) === 0)
      .dropDuplicates("l_orderkey")
      .withColumn("l_quantity", lit(-1.0))
    val nDeltaKeys = delta.count()
    val t1 = System.nanoTime()
    Layout.mergeBucketed(spark, table, "l_orderkey", buckets, delta)
    val merged = (System.nanoTime() - t1) / 1e9
    // pin resolution (driver metadata) vs pinned scan (executor work)
    val t2 = System.nanoTime()
    val pinned = Layout.readTableAt(spark, table, epochGen)
    val resolve = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val pinnedCount = pinned.count()
    val pinnedMarkers = pinned.where(col("l_quantity") === -1.0).count()
    val scan = (System.nanoTime() - t3) / 1e9
    val liveMarkers = Layout.readTable(spark, table)
      .where(col("l_quantity") === -1.0).count()
    println(f"[probe] timetravel: rows=$preCount%,d deltaKeys=$nDeltaKeys%,d " +
      f"build=$built%.1f s merge=$merged%.1f s pinResolve=$resolve%.3f s " +
      f"pinnedScan=$scan%.1f s pinnedMarkers=$pinnedMarkers liveMarkers=$liveMarkers")
    require(pinnedCount == preCount, "the pinned epoch must be the pre-merge table")
    require(pinnedMarkers == 0L, "no post-merge row may leak into the pinned epoch")
    require(liveMarkers == nDeltaKeys, "the live read serves the merged state")
    spark.sql(s"DROP TABLE `$table`")
  }

  private def mergeProbe(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.io.Layout
    val table = "probe_merge_lineitem"
    val buckets = 16
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def inventory(): Map[String, (Long, Long)] = {
      val loc = new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE TABLE EXTENDED `$table`")
          .where(col("col_name") === "Location").first().getString(1)))
      loc.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val t0 = System.nanoTime()
    Layout.writeBucketed(li, table, "l_orderkey", buckets)
    val built = (System.nanoTime() - t0) / 1e9
    val before = inventory()
    val nRows = spark.table(table).count()
    // ~1% of orderkeys: one replacement row per key (replaces every line
    // of the order — the CDC replace-by-key contract), comment stamped so
    // the applied rows are identifiable
    // marker: quantity −1 never occurs in the data → identifies applied rows
    val delta = li.where(pmod(col("l_orderkey"), lit(97)) === 0)
      .dropDuplicates("l_orderkey")
      .withColumn("l_quantity", lit(-1.0))
    val nDeltaKeys = delta.count()
    val t1 = System.nanoTime()
    Layout.mergeBucketed(spark, table, "l_orderkey", buckets, delta)
    val merged = (System.nanoTime() - t1) / 1e9
    val after = inventory()
    val affected = delta
      .select(pmod(hash(col("l_orderkey")), lit(buckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val untouchedOk = before.forall { case (name, meta) =>
      val b = Layout.bucketIdOf(name).get
      if (affected(b)) !after.contains(name) else after.get(name).contains(meta)
    }
    val applied = spark.table(table).where(col("l_quantity") === -1.0).count()
    val t = Layout.readTable(spark, table)
    val p = t.join(t.groupBy("l_orderkey").count(), "l_orderkey")
      .queryExecution.explainString(FormattedMode)
    val ex = p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))
    println(f"[probe] merge: rows=$nRows%,d deltaKeys=$nDeltaKeys%,d " +
      f"affectedBuckets=${affected.size}/$buckets build=$built%.1f s merge=$merged%.1f s " +
      f"untouchedFilesIdentical=$untouchedOk appliedRows=$applied exchanges=$ex")
    require(untouchedOk, "untouched buckets must keep byte-identical files")
    require(applied == nDeltaKeys, "every delta key must land exactly once")
    require(ex == 0, "zero-Exchange contract must survive the merge")
    spark.sql(s"DROP TABLE `$table`")
    // Phase 2 — partial-rewrite ECONOMICS: a key-random delta of ≥ a few
    // hundred keys touches every bucket (phase 1: 151k keys → 16/16), so
    // the O(k/buckets · table) claim shows at the other corner — many
    // buckets, few keys (the late-corrections CDC case): 256 buckets, a
    // 30-key delta → ~30/256 buckets rewrite and the merge cost collapses
    // vs the full build; the untouched-file identity check is NON-vacuous
    // here.
    val b2 = 256
    val t2 = System.nanoTime()
    Layout.writeBucketed(li, table, "l_orderkey", b2)
    val built2 = (System.nanoTime() - t2) / 1e9
    val before2 = inventory()
    val keys30 = li.select("l_orderkey").distinct().orderBy("l_orderkey").limit(30)
    val delta2 = li.join(keys30, "l_orderkey").dropDuplicates("l_orderkey")
      .withColumn("l_quantity", lit(-1.0))
    val t3 = System.nanoTime()
    Layout.mergeBucketed(spark, table, "l_orderkey", b2, delta2)
    val merged2 = (System.nanoTime() - t3) / 1e9
    val after2 = inventory()
    val affected2 = delta2
      .select(pmod(hash(col("l_orderkey")), lit(b2)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val untouched2 = before2.count { case (name, meta) =>
      !affected2(Layout.bucketIdOf(name).get) && after2.get(name).contains(meta)
    }
    println(f"[probe] merge-sparse: buckets=$b2 deltaKeys=30 " +
      f"affectedBuckets=${affected2.size}/$b2 build=$built2%.1f s merge=$merged2%.1f s " +
      f"untouchedFilesIdentical=$untouched2/${before2.size - affected2.size}")
    require(untouched2 == before2.size - affected2.size,
      "every unaffected bucket file must be byte-identical")
    require(affected2.size <= 30, "a 30-key delta touches at most 30 buckets")
    spark.sql(s"DROP TABLE `$table`")
  }
}
