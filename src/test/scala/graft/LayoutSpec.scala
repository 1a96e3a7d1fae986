package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.io.{Layout, Tables}

class LayoutSpec extends GraftSuite {

  private def shuffles(p: String): Int =
    p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))

  private def parquetFiles(table: String): Int = {
    val loc = new java.io.File(new java.net.URI(
      spark.sql(s"DESCRIBE TABLE EXTENDED `$table`")
        .where(col("col_name") === "Location").first().getString(1)))
    loc.listFiles().count(_.getName.endsWith(".parquet"))
  }

  test("bucketed tables join with zero exchanges") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Layout.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Layout.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = Layout.readTable(spark, "b_orders")
        .join(Layout.readTable(spark, "b_lineitem"), "o_orderkey")
      val p = joined.queryExecution.explainString(FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      assert(shuffles(p) == 0, s"bucketed join must not exchange:\n$p")
      assert(p.contains("Bucketed: true"), p)
      // and it computes the right thing
      val n = joined.count()
      val plain = orders.join(lineitem, "o_orderkey").count()
      assert(n == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed groupBy on the bucket key aggregates without an exchange") {
    val p = Layout.readTable(spark, "b_lineitem")
      .groupBy("o_orderkey").agg(sum("l_quantity"))
      .queryExecution.explainString(FormattedMode)
    assert(shuffles(p) == 0, s"bucketed agg must not exchange:\n$p")
  }

  test("appendBucketed ingests a batch; the joined layout stays zero-exchange") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val (base, batch) = (orders.where(col("o_orderkey") % 2 === 0),
      orders.where(col("o_orderkey") % 2 =!= 0))
    Layout.writeBucketed(base, "b_app_orders", "o_orderkey", 4)
    Layout.appendBucketed(batch, "b_app_orders", "o_orderkey", 4)
    val t = Layout.readTable(spark, "b_app_orders")
    // nothing lost, nothing duplicated
    assert(t.count() == orders.count())
    assert(t.select("o_orderkey").distinct().count()
      == orders.select("o_orderkey").distinct().count())
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = t.join(t.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true"), p)
      assert(shuffles(p) == 0, s"appended bucketed table must keep co-location:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("q_bucketed_join runs join AND group-by with zero exchanges off the layout") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // pin the SMJ path
    try {
      val q = SparkEntry.queries("q_bucketed_join")(spark, sf)
      val p = q.queryExecution.explainString(FormattedMode)
      assert(p.contains("SortMergeJoin") && p.contains("Bucketed: true"), p)
      assert(shuffles(p) == 0,
        s"the registered bucketed query must not exchange anywhere:\n$p")
      // second call reuses the session's bucket tables (the bench contract):
      // same result, still no exchange, no rewrite
      assert(SparkEntry.queries("q_bucketed_join")(spark, sf).count() == q.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("compact rewrites many small files into few sized ones, losslessly") {
    val inDir = java.nio.file.Files.createTempDirectory("small-files").toString
    val outDir = java.nio.file.Files.createTempDirectory("compacted").toString + "/out"
    val events = Tables.events(spark, sf)
    events.repartition(20).write.mode("overwrite").parquet(inDir)
    val nIn = new java.io.File(inDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nIn == 20, s"setup: expected 20 input files, got $nIn")
    Layout.compact(spark, inDir, outDir, targetFileBytes = 512L * 1024)
    val nOut = new java.io.File(outDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nOut < nIn, s"expected fewer files, got $nOut")
    assert(spark.read.parquet(outDir).count() == events.count())
  }

  test("partitioned layout prunes directories for equality filters") {
    val dir = java.nio.file.Files.createTempDirectory("events-part").toString
    Layout.writePartitioned(Tables.events(spark, sf), dir, "event_type")
    val read = spark.read.parquet(dir).where(col("event_type") === "click")
    val p = read.queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p)
    // pruning really happened: only the click partition's rows are read
    val clicks = Tables.events(spark, sf).where(col("event_type") === "click").count()
    assert(read.count() == clicks)
  }

  test("zorderWrite clusters both dimensions: a 2nd-dim predicate skips most files") {
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey", "l_quantity")
    val zdir = "/tmp/graft-layout-z"
    val ldir = "/tmp/graft-layout-linear"
    Layout.zorderWrite(li, zdir, "l_partkey", "l_suppkey", files = 16)
    li.repartitionByRange(16, col("l_partkey")) // linear sort on dim 1 only
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(ldir)
    // per-file (min,max) of the SECOND dim — parquet's own footer stats in
    // miniature; a file can be skipped iff its range misses the predicate
    def filesHit(dir: String, lo: Long, hi: Long): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(fmin("l_suppkey").as("mn"), fmax("l_suppkey").as("mx"))
      (stats.where(col("mx") >= lo && col("mn") <= hi).count(), stats.count())
    }
    val mid = Tables.lineitem(spark, sf)
      .agg(fmin("l_suppkey"), fmax("l_suppkey")).first()
    val (lo, hi) = (mid.getLong(0), (mid.getLong(0) + mid.getLong(1)) / 8)
    val (zHit, zAll) = filesHit(zdir, lo, hi)
    val (lHit, lAll) = filesHit(ldir, lo, hi)
    assert(zAll >= 8 && lAll >= 8, s"enough files to make skipping meaningful ($zAll/$lAll)")
    assert(lHit == lAll, "linear-on-dim1 layout cannot skip for a dim2 predicate")
    assert(zHit * 2 <= zAll, s"z-order skips at least half the files ($zHit of $zAll)")
    // the layouts hold identical data
    assert(spark.read.parquet(zdir).count() == li.count())
  }

  test("deriveBuckets sizes from input bytes: floor, power-of-two, monotone") {
    val paths = Seq(s"$sf/orders.parquet", s"$sf/lineitem.parquet")
    // tiny corpus → the floor
    assert(Layout.deriveBuckets(spark, paths) == 8)
    val bytes = Layout.inputBytes(spark, paths: _*)
    assert(bytes > 0)
    val grown = Layout.deriveBuckets(spark, paths,
      targetBucketBytes = math.max(1, bytes / 20))
    assert(grown > 8 && Integer.bitCount(grown) == 1, s"grown=$grown")
    // a bigger corpus (≡ smaller target) never shrinks the count
    assert(Layout.deriveBuckets(spark, paths,
      targetBucketBytes = math.max(1, bytes / 40)) >= grown)
  }

  test("zero-Exchange join+agg holds at two different derived bucket counts") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val path = Seq(s"$sf/orders.parquet")
    val bytes = Layout.inputBytes(spark, path: _*)
    val b1 = Layout.deriveBuckets(spark, path) // floor
    val b2 = Layout.deriveBuckets(spark, path,
      targetBucketBytes = math.max(1, bytes / 20))
    assert(b1 != b2, s"fixture must exercise two counts, got $b1/$b2")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for ((b, t) <- Seq((b1, "b_derived_lo"), (b2, "b_derived_hi"))) {
        Layout.writeBucketed(orders, t, "o_orderkey", b)
        val joined = Layout.readTable(spark, t)
          .join(Layout.readTable(spark, t).groupBy("o_orderkey").count(), "o_orderkey")
        val p = joined.queryExecution.explainString(FormattedMode)
        assert(p.contains("Bucketed: true"), p)
        assert(shuffles(p) == 0, s"derived count $b must keep zero-Exchange:\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("compactBucketed bounds append growth: 1 file/bucket, plan + rows preserved") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val parts = (0 until 4).map(i => orders.where(col("o_orderkey") % 4 === i))
    Layout.writeBucketed(parts(0), "b_cmp_orders", "o_orderkey", 4)
    parts.drop(1).foreach(Layout.appendBucketed(_, "b_cmp_orders", "o_orderkey", 4))
    val before = parquetFiles("b_cmp_orders")
    assert(before == 16, s"setup: 4 writes × 4 buckets = 16 files, got $before")
    Layout.compactBucketed(spark, "b_cmp_orders", "o_orderkey", 4)
    assert(parquetFiles("b_cmp_orders") == 4, "compaction must leave one file per bucket")
    val t = Layout.readTable(spark, "b_cmp_orders")
    assert(t.count() == orders.count(), "compaction must be lossless")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = t.join(t.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true"), p)
      assert(shuffles(p) == 0, s"compacted table must keep the zero-Exchange plan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("streaming ingest: foreachBatch appendBucketed keeps co-location; compactBucketed bounds it") {
    // The continuous-ingest cadence the maintenance loop exists for: a
    // bucketed fact table serves zero-Exchange joins while micro-batches
    // land through appendBucketed (one new file per bucket per trigger),
    // and the periodic compactBucketed pass re-bounds files-per-bucket
    // without losing the layout. MemoryStream + foreachBatch is the same
    // plumbing AnnIndexSpec pins for index ingest.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    Layout.writeBucketed(orders.where(col("o_orderkey") % 4 === 0),
      "b_stream_orders", "o_orderkey", 4)
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("o_orderkey", "o_custkey").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Layout.appendBucketed(batch, "b_stream_orders", "o_orderkey", 4)
      }.start()
    val tail = orders.where(col("o_orderkey") % 4 =!= 0)
      .as[(Long, Long)].collect()
    val (b1, rest) = tail.splitAt(tail.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    Seq(b1, b2, b3).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val t = Layout.readTable(spark, "b_stream_orders")
    assert(t.count() == orders.count(), "every micro-batch row landed exactly once")
    val grown = parquetFiles("b_stream_orders")
    assert(grown >= 8, s"setup: appends must have grown files-per-bucket ($grown)")
    Layout.compactBucketed(spark, "b_stream_orders", "o_orderkey", 4)
    assert(parquetFiles("b_stream_orders") == 4, "compaction leaves 1 file/bucket")
    val t2 = Layout.readTable(spark, "b_stream_orders")
    assert(t2.count() == orders.count(), "compaction is lossless")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = t2.join(t2.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true") && shuffles(p) == 0,
        s"streamed-then-compacted table must keep the zero-Exchange plan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("jsonl landing zone -> file-source stream -> bucketed table (the raw-ingest path)") {
    // The full production front door at 100 TB/day: raw JSONL drops land
    // in a directory, a file-source stream (schema DECLARED — inference
    // would re-scan every drop) picks up exactly the new files per
    // trigger, and foreachBatch appendBucketed lands them co-located so
    // every downstream join is zero-Exchange. This is the file-source
    // twin of the MemoryStream cadence above — it additionally pins that
    // Spark's json streaming source + JsonLines' schema contract compose.
    import org.apache.spark.sql.streaming.Trigger
    val landing = java.nio.file.Files.createTempDirectory("jsonl-landing").toString
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val schema = orders.schema
    Layout.writeBucketed(orders.where(col("o_orderkey") % 3 === 0),
      "b_jsonl_orders", "o_orderkey", 4)
    // two JSONL drops (distinct subdirs = distinct files for the source)
    graft.io.JsonLines.write(orders.where(col("o_orderkey") % 3 === 1), s"$landing/drop1")
    graft.io.JsonLines.write(orders.where(col("o_orderkey") % 3 === 2), s"$landing/drop2")
    val q = spark.readStream.schema(schema).json(s"$landing/drop*")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("jsonl-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Layout.appendBucketed(batch, "b_jsonl_orders", "o_orderkey", 4)
      }.start()
    q.awaitTermination()
    val t = Layout.readTable(spark, "b_jsonl_orders")
    assert(t.count() == orders.count(), "every JSONL row landed exactly once")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = t.join(t.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true") && shuffles(p) == 0,
        s"JSONL-ingested table must keep the zero-Exchange plan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("quantile z-codes keep file-skipping on a power-law column where linear dies") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    // dim a: power-law — 99% of mass in [0, 1000), outliers out to ~10^9;
    // dim b: uniform. Deterministic (hash-derived), no RNG.
    val df = (0 until 20000).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val a = if (i % 100 == 0) 1000L + (h % 1000000000L) else h % 1000L
      (a, (i * 48271L) % 4096L)
    }.toDF("a", "b")
    val qdir = "/tmp/graft-layout-zq"
    Layout.zorderWrite(df, qdir, "a", "b", files = 16)
    // the OLD linear (min,max) scaling, reconstructed: outliers stretch the
    // range so the whole 99% head collapses into code 0 and the curve
    // degenerates to a 1-D sort on b
    val r = df.agg(fmin("a"), fmax("a")).first()
    val lin = ((col("a") - r.getLong(0)) * 65535.0 /
      math.max(1L, r.getLong(1) - r.getLong(0))).cast("long")
    val ldir = "/tmp/graft-layout-zlin"
    df.withColumn("__z", graft.functions.VectorExpressions.interleave16(
        lin, ((col("b") - 0) * 65535.0 / 4095.0).cast("long")))
      .repartitionByRange(16, col("__z")).sortWithinPartitions("__z").drop("__z")
      .write.mode("overwrite").parquet(ldir)
    def filesHit(dir: String, lo: Long, hi: Long): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(fmin("a").as("mn"), fmax("a").as("mx"))
      (stats.where(col("mx") >= lo && col("mn") <= hi).count(), stats.count())
    }
    // a mid-head predicate on the SKEWED dimension
    val (qHit, qAll) = filesHit(qdir, 400, 500)
    val (lHit, lAll) = filesHit(ldir, 400, 500)
    assert(qAll >= 8 && lAll >= 8, s"need enough files ($qAll/$lAll)")
    assert(lHit == lAll,
      s"fixture check: linear codes collapse the head → no skip ($lHit of $lAll)")
    assert(qHit * 2 <= qAll,
      s"quantile codes must keep the skewed dim's skip ($qHit of $qAll)")
    assert(spark.read.parquet(qdir).count() == 20000)
  }

  test("sourceFingerprint changes when the source dir is regenerated in place") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fp-src").toString + "/t.parquet"
    (0 until 100).toDF("x").write.mode("overwrite").parquet(dir)
    val fp1 = Layout.sourceFingerprint(spark, dir)
    (0 until 250).toDF("x").write.mode("overwrite").parquet(dir)
    Layout.invalidateFingerprints() // bypass the TTL memo for the immediate re-read
    val fp2 = Layout.sourceFingerprint(spark, dir)
    assert(fp1 != fp2, "regenerated data must produce a different fingerprint")
    assert(Layout.sourceFingerprint(spark, dir) == fp2, "fingerprint is stable")
  }

  test("sourceFingerprint tail sample catches a same-size same-mtime regeneration") {
    // the object-store corner (ADVICE r14): coarse/zero mtimes + an
    // in-place regeneration to identical file sizes — names, lengths and
    // mtimes all collide, only the content tail differs
    val dir = java.nio.file.Files.createTempDirectory("fp-tail")
    val f = dir.resolve("part-0.bin").toFile
    def writePinned(fill: Byte): Unit = {
      val out = new java.io.FileOutputStream(f)
      try out.write(Array.fill(1024)(fill)) finally out.close()
      assert(f.setLastModified(1700000000000L), "must pin mtime")
    }
    writePinned(1)
    Layout.invalidateFingerprints()
    val fp1 = Layout.sourceFingerprint(spark, dir.toString)
    writePinned(2)
    Layout.invalidateFingerprints()
    val fp2 = Layout.sourceFingerprint(spark, dir.toString)
    assert(fp1 != fp2,
      "identical (name, length, mtime) but different bytes must fingerprint differently")
  }

  test("sourceFingerprint memoizes within the TTL and invalidate drops the memo") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fp-memo").toString + "/t.parquet"
    (0 until 50).toDF("x").write.mode("overwrite").parquet(dir)
    Layout.invalidateFingerprints()
    val fp1 = Layout.sourceFingerprint(spark, dir)
    (0 until 99).toDF("x").write.mode("overwrite").parquet(dir)
    assert(Layout.sourceFingerprint(spark, dir) == fp1,
      "within the TTL the memoized fingerprint is served (bounded staleness by design)")
    Layout.invalidateFingerprints()
    assert(Layout.sourceFingerprint(spark, dir) != fp1,
      "after invalidation the fresh listing must see the regeneration")
  }

  test("compactBucketed auto-recovers a swap crashed between DROP and RENAME") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    Layout.writeBucketed(orders, "b_rec_orders", "o_orderkey", 4)
    val n = orders.count()
    // simulate the crash window: the table is gone, the full copy sits
    // under the staging name
    spark.sql("ALTER TABLE `b_rec_orders` RENAME TO `b_rec_orders_compacting`")
    assert(!spark.catalog.tableExists("b_rec_orders"))
    Layout.compactBucketed(spark, "b_rec_orders", "o_orderkey", 4)
    assert(spark.catalog.tableExists("b_rec_orders"), "recovery must restore the table")
    assert(!spark.catalog.tableExists("b_rec_orders_compacting"))
    assert(Layout.readTable(spark, "b_rec_orders").count() == n,
      "recovered + compacted table must be lossless")
  }

  test("zorderWrite accepts non-long integral columns") {
    import spark.implicits._
    val df = (0 until 256).map(i => (i % 16, i / 16)).toDF("a", "b") // ints
    val dir = java.nio.file.Files.createTempDirectory("z-int").toString
    Layout.zorderWrite(df, dir, "a", "b", files = 4)
    assert(spark.read.parquet(dir).count() == 256)
  }

  private def tableLoc(table: String): java.io.File =
    new java.io.File(new java.net.URI(
      spark.sql(s"DESCRIBE TABLE EXTENDED `$table`")
        .where(col("col_name") === "Location").first().getString(1)))

  private def fileInventory(table: String): Map[String, (Long, Long)] =
    tableLoc(table).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

  test("mergeBucketed rewrites only affected buckets; semantics + zero-exchange hold") {
    import spark.implicits._
    val buckets = 8
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(orders, "b_cdc_orders", "o_orderkey", buckets)
    val before = fileInventory("b_cdc_orders")
    val keys = orders.select("o_orderkey").as[Long].collect().sorted
    val (u1, u2, gone) = (keys(0), keys(1), keys(2))
    val newKey = keys.max + 1001
    val delta = Seq(
      (u1, 7001L, 1.25, false), (u2, 7002L, 2.5, false),
      (newKey, 7003L, 3.75, false), (gone, 0L, 0.0, true))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "is_delete")
    Layout.mergeBucketed(spark, "b_cdc_orders", "o_orderkey", buckets,
      delta, deleteCol = Some("is_delete"))
    // semantics: replaced keys carry delta values, tombstone gone, rest intact
    val expected = orders.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      .filterNot(t => Set(u1, u2, gone, newKey)(t._1)) ++
      Set((u1, 7001L, 1.25), (u2, 7002L, 2.5), (newKey, 7003L, 3.75))
    val got = Layout.readTable(spark, "b_cdc_orders").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    // physical: untouched buckets keep their exact files (name, size, mtime);
    // affected buckets are fully replaced
    val affected = delta
      .select(pmod(hash(col("o_orderkey")), lit(buckets)).as("b"))
      .distinct().as[Int].collect().toSet
    assert(affected.size < buckets, "fixture must leave some bucket untouched")
    val after = fileInventory("b_cdc_orders")
    before.foreach { case (name, meta) =>
      val b = Layout.bucketIdOf(name).get
      if (affected(b)) assert(!after.contains(name), s"affected $name must be replaced")
      else assert(after.get(name).contains(meta), s"untouched $name must be byte-identical")
    }
    after.keys.foreach { name =>
      val b = Layout.bucketIdOf(name).get
      assert(affected(b) || before.contains(name))
    }
    // retired originals are preserved under the invisible _pre_merge dir
    val retired = tableLoc("b_cdc_orders").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_pre_merge"))
    assert(retired.nonEmpty && retired.flatMap(_.listFiles()).nonEmpty)
    // the zero-Exchange contract survives the partial rewrite
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = Layout.readTable(spark, "b_cdc_orders")
      val p = t.join(t.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true"), p)
      assert(shuffles(p) == 0, s"merged bucketed table must keep co-location:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("mergeBucketed bucket-id arithmetic matches bucketBy file placement row-by-row") {
    import spark.implicits._
    // the partial rewrite is only sound if pmod(hash(key), n) IS the bucket
    // id bucketBy encodes in file names — pin it on every row of every file
    val loc = tableLoc("b_cdc_orders")
    loc.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      val fromName = Layout.bucketIdOf(f.getName).get
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select(pmod(hash(col("o_orderkey")), lit(8)).as("b"))
        .distinct().as[Int].collect().toSet
      assert(ids.subsetOf(Set(fromName)), s"${f.getName}: rows hash to $ids")
    }
  }

  test("streaming CDC: foreachBatch latest-wins reduce + mergeBucketed converges to the final state") {
    // The production CDC cadence: a changelog stream lands in micro-
    // batches; each trigger reduces its batch to one latest row per key
    // (max_by on the version — the in-batch half of D16's latest-wins)
    // and mergeBucketed applies it. Cross-batch latest-wins holds because
    // a later trigger's merge REPLACES the key — so the table converges
    // to "latest version per key, tombstones gone" no matter how the
    // changelog splits across triggers.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = (0L until 40L).map(k => (k, 0L, 0.0)).toDF(
      "o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(base, "b_cdc_stream", "o_orderkey", 4)
    // changelog: (key, version, value, delete) — interleaved re-updates
    // and deletes of the same keys across batches
    val log = Seq(
      Seq((1L, 1L, 10.0, false), (2L, 1L, 20.0, false), (1L, 2L, 11.0, false)),
      Seq((2L, 2L, 0.0, true), (3L, 1L, 30.0, false), (50L, 1L, 500.0, false)),
      Seq((2L, 3L, 22.0, false), (50L, 2L, 0.0, true), (1L, 3L, 12.0, false)))
    val input = MemoryStream[(Long, Long, Double, Boolean)]
    val q = input.toDF().toDF("o_orderkey", "version", "o_totalprice", "is_delete")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = batch
          .groupBy(col("o_orderkey"))
          .agg(max(struct(col("version"), col("o_totalprice"), col("is_delete"))).as("v"))
          .select(col("o_orderkey"), col("v.version").as("o_custkey"),
            col("v.o_totalprice").as("o_totalprice"), col("v.is_delete").as("is_delete"))
        Layout.mergeBucketed(spark, "b_cdc_stream", "o_orderkey", 4,
          latest, deleteCol = Some("is_delete"))
      }.start()
    log.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val got = Layout.readTable(spark, "b_cdc_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val untouched = (0L until 40L).filterNot(Set(1L, 2L, 3L)).map((_, 0L, 0.0)).toSet
    assert(got == untouched ++ Set((1L, 3L, 12.0), (2L, 3L, 22.0), (3L, 1L, 30.0)),
      "final state = latest version per key, tombstone-resurrected key kept, deleted insert gone")
  }

  test("mergeBucketed rejects a delta with duplicate keys") {
    import spark.implicits._
    val dup = Seq((1L, 1L, 1.0), (1L, 2L, 2.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val e = intercept[IllegalArgumentException] {
      Layout.mergeBucketed(spark, "b_cdc_orders", "o_orderkey", 8, dup)
    }
    assert(e.getMessage.contains("latest-wins"))
  }

  test("mergeBucketed rejects a delta whose key dtype differs from the table's") {
    import spark.implicits._
    // an INT-typed delta key Murmur3-hashes differently from the table's
    // BIGINT — the wrong buckets would rewrite and replaced keys survive
    val intKey = Seq((1, 1L, 1.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val e = intercept[IllegalArgumentException] {
      Layout.mergeBucketed(spark, "b_cdc_orders", "o_orderkey", 8, intKey)
    }
    assert(e.getMessage.contains("type-sensitive"), e.getMessage)
  }

  test("mergeBucketed refuses a data file with no parseable bucket id") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(orders, "b_strayfile", "o_orderkey", 4)
    // a foreign write path drops a non-bucketBy file into the table dir —
    // merging around it would keep its stale rows for replaced keys
    val stray = new java.io.File(tableLoc("b_strayfile"), "foreign-upload.parquet")
    orders.limit(1).coalesce(1).write.mode("overwrite")
      .parquet(stray.getAbsolutePath + ".dir")
    val part = new java.io.File(stray.getAbsolutePath + ".dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, stray.toPath)
    val delta = Seq((1L, 9L, 9.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val e = intercept[IllegalArgumentException] {
      Layout.mergeBucketed(spark, "b_strayfile", "o_orderkey", 4, delta)
    }
    assert(e.getMessage.contains("no parseable bucket id"), e.getMessage)
  }

  test("manifest: every layout write leaves the manifest equal to the dir's data files") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    def manifest(table: String): Set[String] = {
      val loc = new org.apache.hadoop.fs.Path(tableLoc(table).toURI)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Layout.readManifest(fs, loc).get._2
    }
    def dataFiles(table: String): Set[String] =
      tableLoc(table).listFiles().map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    Layout.writeBucketed(orders, "b_manifest", "o_orderkey", 4)
    assert(manifest("b_manifest") == dataFiles("b_manifest"))
    Layout.appendBucketed(orders.limit(5), "b_manifest", "o_orderkey", 4)
    assert(manifest("b_manifest") == dataFiles("b_manifest"))
    val delta = Seq((1L, 9L, 9.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    Layout.mergeBucketed(spark, "b_manifest", "o_orderkey", 4, delta)
    assert(manifest("b_manifest") == dataFiles("b_manifest"))
    // r19: generations are RETAINED (the readTableAt version log) — one
    // per write here, reclaimed by vacuum past the retention
    assert(tableLoc("b_manifest").listFiles()
      .count(_.getName.matches("_manifest-\\d+\\.json")) == 3)
  }

  test("manifest reader never double-reads a key mid-swap (staged file set)") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(orders, "b_midswap", "o_orderkey", 4)
    val expected = orders.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    // Simulate a reader landing MID-SWAP: an affected bucket's retiring
    // file is still present next to its replacement (the one-at-a-time
    // move window mergeBucketed documents). Stage it by copying a current
    // bucket file under a fresh bucketBy-shaped name the manifest does NOT
    // list — exactly what the old file looks like after the new one moved
    // in and before retirement.
    val loc = tableLoc("b_midswap")
    val victim = loc.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ghostName = victim.getName.replaceFirst("part-\\d{5}", "part-90000")
    assert(ghostName != victim.getName)
    java.nio.file.Files.copy(victim.toPath,
      new java.io.File(loc, ghostName).toPath)
    // NO manual refreshTable here: the ghost landed EXTERNALLY (another
    // process's swap) and readTable must self-refresh the session's
    // cached listing to even see it (r17 review — a stale cached listing
    // would silently miss moved-in files behind the filter)
    val got = Layout.readTable(spark, "b_midswap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(got == expected)
    // whereas the plain table scan (now over the refreshed listing)
    // double-reads the bucket's keys — the fixture really is a mid-swap
    val naive = spark.table("b_midswap").count()
    assert(naive > expected.size, "fixture must actually present a double-read")
    // and the mid-swap plan keeps the bucketed scan (Filter preserves
    // the scan's partitioning — no Exchange sneaks in)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = Layout.readTable(spark, "b_midswap")
      val p = t.join(t.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true"), p)
      assert(shuffles(p) == 0, s"mid-swap read must keep co-location:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // quiescent again (ghost gone): the fast path is a plain bucketed scan
    // with no per-row filename filter
    new java.io.File(loc, ghostName).delete()
    val quiet = Layout.readTable(spark, "b_midswap")
    assert(!quiet.queryExecution.optimizedPlan.toString.contains("input_file_name"),
      "quiescent read must take the filter-free fast path")
    assert(quiet.count() == expected.size)
  }

  test("manifest round-trips any data file name, not just .parquet; bad names fail loudly") {
    val loc = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("manifest-rt").toUri)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = Set("part-00000-aa_00000.c000.snappy.parquet",
      "part-00001-bb_00001.c000.zstd.orc", "oddly.named.data")
    Layout.writeManifest(fs, loc, names)
    assert(Layout.readManifest(fs, loc).exists(_._2 == names))
    // generation replacement still holds for the generic parse
    Layout.writeManifest(fs, loc, Set("only.parquet"))
    assert(Layout.readManifest(fs, loc).exists(_._2 == Set("only.parquet")))
    // a name the quoted-string scan cannot round-trip is rejected at write
    intercept[IllegalArgumentException] {
      Layout.writeManifest(fs, loc, Set("evil\"name.parquet"))
    }
  }

  test("compactBucketed reads the manifest view: a crashed-merge orphan never bakes in") {
    import spark.implicits._
    val base = (0L until 40L).map(k => (k, k * 10, k * 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(base, "b_crashcompact", "o_orderkey", 4)
    val expected = base.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    // simulate the documented crash window: an affected bucket's OLD file
    // is still in the dir (retirement never ran) while the manifest names
    // only the current set
    val loc = tableLoc("b_crashcompact")
    val victim = loc.listFiles().filter(_.getName.endsWith(".parquet")).head
    val orphan = victim.getName.replaceFirst("part-\\d{5}", "part-91000")
    java.nio.file.Files.copy(victim.toPath, new java.io.File(loc, orphan).toPath)
    Layout.compactBucketed(spark, "b_crashcompact", "o_orderkey", 4)
    val got = Layout.readTable(spark, "b_crashcompact").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(got == expected, "compact must not duplicate the orphan's keys")
    // and the compacted dir carries no orphan: manifest == files again
    val after = tableLoc("b_crashcompact").listFiles()
      .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    val fsLoc = new org.apache.hadoop.fs.Path(tableLoc("b_crashcompact").toURI)
    val fs2 = fsLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(Layout.readManifest(fs2, fsLoc).exists(_._2 == after))
  }

  test("mergeBucketed retires a crashed-merge orphan instead of merging or re-manifesting it") {
    import spark.implicits._
    val base = (0L until 40L).map(k => (k, k * 10, k * 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(base, "b_crashmerge", "o_orderkey", 4)
    // the crashed-merge window: a dead old copy sits in the dir, excluded
    // by the manifest (retirement never ran)
    val loc = tableLoc("b_crashmerge")
    val victim = loc.listFiles().filter(_.getName.endsWith(".parquet")).head
    val orphan = victim.getName.replaceFirst("part-\\d{5}", "part-92000")
    java.nio.file.Files.copy(victim.toPath, new java.io.File(loc, orphan).toPath)
    val delta = Seq((1L, 999L, 9.9)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    Layout.mergeBucketed(spark, "b_crashmerge", "o_orderkey", 4, delta)
    // semantics: no duplicated keys, delta applied, everything else intact
    val got = Layout.readTable(spark, "b_crashmerge").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val expected = ((0L until 40L).filter(_ != 1L).map(k => (k, k * 10, k * 1.0))
      :+ (1L, 999L, 9.9)).sorted
    assert(got == expected, "orphan rows must not survive the merge")
    // physical: the orphan is retired, not merged and not re-manifested
    val names = loc.listFiles().map(_.getName).toSet
    assert(!names.contains(orphan), "orphan must leave the data dir")
    // r19: retirement is per-generation — the orphan parks under
    // _pre_merge/g<superseded gen>
    def walkNames(f: java.io.File): Set[String] =
      if (f.isDirectory) f.listFiles().toSet.flatMap(walkNames) else Set(f.getName)
    assert(walkNames(new java.io.File(loc, "_pre_merge")).contains(orphan),
      "orphan parks under _pre_merge")
    val fsLoc = new org.apache.hadoop.fs.Path(loc.toURI)
    val fs = fsLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!Layout.readManifest(fs, fsLoc).get._2.contains(orphan))
  }

  test("manifestView (the readTable exhaustion fallback) re-plans and filters to exactly the given set") {
    import spark.implicits._
    val base = (0L until 40L).map(k => (k, k * 1.0)).toDF("o_orderkey", "o_totalprice")
    Layout.writeBucketed(base, "b_mview", "o_orderkey", 4)
    val loc = tableLoc("b_mview")
    val files = loc.listFiles().map(_.getName)
      .filter(_.endsWith(".parquet")).sorted
    // exclude one bucket's file: the view must contain exactly the other
    // buckets' rows — proving both the fresh plan and the name filter
    val kept = files.tail.toSet
    val got = Layout.manifestView(spark, "b_mview", kept)
      .select("o_orderkey").as[Long].collect().toSet
    val dropped = Layout.bucketIdOf(files.head).get
    import org.apache.spark.sql.functions.{pmod, hash, lit, col}
    val expected = base
      .where(pmod(hash(col("o_orderkey")), lit(4)) =!= dropped)
      .select("o_orderkey").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty && got.size < 40)
  }

  test("resolveOn rejects a non-integral id column loudly") {
    import spark.implicits._
    val df = Seq(("u-1", "alice", "US")).toDF("uid", "nm", "b")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Fuzzy.resolveOn(df, "uid", "nm", "b")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  private def manifestOf(table: String): (Long, Set[String], Long) = {
    val loc = new org.apache.hadoop.fs.Path(tableLoc(table).toURI)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.readManifest(fs, loc).get
  }

  test("exactly-once ingest: a re-delivered micro-batch is a no-op through the full cadence") {
    // The r17 verdict's #1: the streaming→bucketed front door. Batches
    // land through ingestSink (appendBucketedBatch); a checkpoint-restart
    // re-delivery of a committed id must append NOTHING — same rows, same
    // manifest generation — and the mark must survive compaction and CDC
    // merges, or the first maintenance pass would silently reopen the
    // duplication window.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    Layout.writeBucketed(orders.where(col("o_orderkey") % 4 === 0),
      "b_eo_orders", "o_orderkey", 4)
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("o_orderkey", "o_custkey").writeStream
      .foreachBatch(Layout.ingestSink("b_eo_orders", "o_orderkey", 4)).start()
    val tail = orders.where(col("o_orderkey") % 4 =!= 0).as[(Long, Long)].collect()
    val (b0, b1) = tail.splitAt(tail.length / 2)
    Seq(b0, b1).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val expected = orders.count()
    assert(Layout.readTable(spark, "b_eo_orders").count() == expected)
    val genBefore = manifestOf("b_eo_orders")
    assert(genBefore._3 == 1L, s"two micro-batches → hwm 1, got ${genBefore._3}")
    // the restart re-delivery: same id, even DIFFERENT payload — no-op
    val redelivered = Seq((999999L, 1L)).toDF("o_orderkey", "o_custkey")
    assert(!Layout.appendBucketedBatch(redelivered, "b_eo_orders", "o_orderkey", 4, 1L))
    assert(Layout.readTable(spark, "b_eo_orders").count() == expected,
      "a re-delivered batch must not append")
    assert(manifestOf("b_eo_orders") == genBefore,
      "a re-delivery no-op must not touch the manifest")
    // maintenance passes carry the mark: compaction…
    Layout.compactBucketed(spark, "b_eo_orders", "o_orderkey", 4)
    assert(manifestOf("b_eo_orders")._3 == 1L, "compaction must carry the ingest hwm")
    assert(!Layout.appendBucketedBatch(redelivered, "b_eo_orders", "o_orderkey", 4, 1L))
    assert(Layout.readTable(spark, "b_eo_orders").count() == expected)
    // …and a CDC merge
    val delta = Seq((2L, 777L)).toDF("o_orderkey", "o_custkey")
    Layout.mergeBucketed(spark, "b_eo_orders", "o_orderkey", 4, delta)
    assert(manifestOf("b_eo_orders")._3 == 1L, "merge must carry the ingest hwm")
    assert(!Layout.appendBucketedBatch(redelivered, "b_eo_orders", "o_orderkey", 4, 1L))
    // the NEXT id still appends
    assert(Layout.appendBucketedBatch(
      Seq((1000001L, 5L)).toDF("o_orderkey", "o_custkey"),
      "b_eo_orders", "o_orderkey", 4, 2L))
    assert(manifestOf("b_eo_orders")._3 == 2L)
    assert(Layout.readTable(spark, "b_eo_orders").count() == expected + 1)
    // a FRESH checkpoint (ids restarting at 0) against the ingested table
    // is the silent-row-loss foot-gun — rejected loudly
    val e = intercept[IllegalArgumentException] {
      Layout.appendBucketedBatch(redelivered, "b_eo_orders", "o_orderkey", 4, 0L)
    }
    assert(e.getMessage.contains("fresh checkpoint"), e.getMessage)
    // and the cadence's whole point: the table still joins zero-Exchange
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = Layout.readTable(spark, "b_eo_orders")
      val p = t.join(t.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true") && shuffles(p) == 0, p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("exactly-once ingest: a crashed delivery's unmanifested files retire, never duplicate") {
    // The window between a delivery's parquet job commit and its manifest
    // write: data files exist that no manifest names. The id re-delivers
    // (the mark never advanced) — re-appending must RETIRE the crashed
    // files first, or this write's manifest (the raw listing) would bless
    // them as duplicates.
    import spark.implicits._
    val base = (0L until 40L).map(k => (k, k * 10)).toDF("o_orderkey", "o_custkey")
    Layout.writeBucketed(base, "b_eo_crash", "o_orderkey", 4)
    val batch = (100L until 110L).map(k => (k, k)).toDF("o_orderkey", "o_custkey")
    // simulate the crash: the batch's files land via a raw bucketed
    // append that never updates the manifest
    batch.repartition(4, col("o_orderkey"))
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("append").format("parquet").saveAsTable("b_eo_crash")
    val (_, manifested, _) = manifestOf("b_eo_crash")
    val present = tableLoc("b_eo_crash").listFiles().map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    assert((present -- manifested).nonEmpty, "fixture: crash left unmanifested files")
    // the re-delivery lands the batch exactly once
    assert(Layout.appendBucketedBatch(batch, "b_eo_crash", "o_orderkey", 4, 0L))
    val t = Layout.readTable(spark, "b_eo_crash")
    assert(t.count() == 50, s"40 base + 10 batch, got ${t.count()}")
    assert(t.where(col("o_orderkey") === 100L).count() == 1,
      "the crashed delivery's rows must not survive as duplicates")
    // physical: manifest == dir files again; the crashed files parked
    val after = tableLoc("b_eo_crash").listFiles().map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    assert(manifestOf("b_eo_crash")._2 == after)
    assert(new java.io.File(tableLoc("b_eo_crash"), "_pre_merge").exists())
  }

  test("an ad-hoc appendBucketed between a crash and the restart does not bless the crashed files") {
    // the r18 review's coexistence hole: a crashed delivery's files sit
    // unmanifested; an operator runs a plain appendBucketed before
    // restarting the stream. If that append manifested the RAW listing,
    // the crashed files would be blessed and the id's re-delivery would
    // land the batch twice. appendBucketed must retire them exactly like
    // appendBucketedBatch does — and must carry the hwm.
    import spark.implicits._
    val base = (0L until 40L).map(k => (k, k * 10)).toDF("o_orderkey", "o_custkey")
    Layout.writeBucketed(base, "b_eo_adhoc", "o_orderkey", 4)
    val batch = (100L until 110L).map(k => (k, k)).toDF("o_orderkey", "o_custkey")
    assert(Layout.appendBucketedBatch(batch, "b_eo_adhoc", "o_orderkey", 4, 0L))
    // batch 1 crashes after its parquet job, before its manifest
    val crashed = (200L until 210L).map(k => (k, k)).toDF("o_orderkey", "o_custkey")
    crashed.repartition(4, col("o_orderkey"))
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("append").format("parquet").saveAsTable("b_eo_adhoc")
    // the ad-hoc append: crashed files retire, hwm survives
    val adhoc = (300L until 305L).map(k => (k, k)).toDF("o_orderkey", "o_custkey")
    Layout.appendBucketed(adhoc, "b_eo_adhoc", "o_orderkey", 4)
    assert(manifestOf("b_eo_adhoc")._3 == 0L, "ad-hoc append carries the ingest hwm")
    assert(Layout.readTable(spark, "b_eo_adhoc")
      .where(col("o_orderkey") === 200L).count() == 0,
      "crashed files must not be blessed by the ad-hoc append")
    // the stream restarts and re-delivers batch 1: lands exactly once
    assert(Layout.appendBucketedBatch(crashed, "b_eo_adhoc", "o_orderkey", 4, 1L))
    val t = Layout.readTable(spark, "b_eo_adhoc")
    assert(t.count() == 40 + 10 + 5 + 10, s"got ${t.count()}")
    assert(t.where(col("o_orderkey") === 200L).count() == 1,
      "the re-delivered batch lands exactly once")
  }

  test("compact of a partitioned manifested input keeps the partition columns and the manifest view") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cmp-part").toString + "/t"
    val out = java.nio.file.Files.createTempDirectory("cmp-part-out").toString + "/t"
    val v = (0L until 30L).map(k => (k, if (k % 3 == 0) "a" else "b")).toDF("id", "p")
    Layout.writePartitioned(v, dir, "p")
    // a crashed-swap leftover the manifest excludes: compact must read the
    // MANIFEST view (a raw read would bake the ghost's rows in) and keep
    // the col=value column alive through the explicit leaf-file read
    val root = new java.io.File(new java.io.File(dir).getCanonicalPath)
    val part = new java.io.File(root, "p=a")
    val victim = part.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ghost = new java.io.File(part,
      victim.getName.replaceFirst("part-\\d{5}", "part-90000"))
    java.nio.file.Files.copy(victim.toPath, ghost.toPath)
    Layout.compact(spark, dir, out)
    val got = Layout.readDir(spark, out)
    assert(got.columns.toSet == Set("id", "p"),
      s"partition column must survive compaction: ${got.columns.toSeq}")
    assert(got.count() == 30, "the unmanifested ghost's rows must not bake in")
    assert(got.where(col("p") === "a").count() == 10)
    ghost.delete()
  }

  test("vacuum reclaims aged retirement dirs and stale staging, never live data") {
    import spark.implicits._
    // bucketed table: a merge retires files into _pre_merge
    val base = (0L until 40L).map(k => (k, k * 10, k * 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeBucketed(base, "b_vac", "o_orderkey", 4)
    Layout.mergeBucketed(spark, "b_vac", "o_orderkey", 4,
      Seq((1L, 99L, 9.9)).toDF("o_orderkey", "o_custkey", "o_totalprice"))
    val loc = tableLoc("b_vac")
    assert(new java.io.File(loc, "_pre_merge").exists(), "fixture: merge retired files")
    val before = Layout.readTable(spark, "b_vac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // retention not yet reached → nothing reclaimed
    assert(Layout.vacuumTable(spark, "b_vac", retentionMs = 3600_000L) == 0L)
    assert(new java.io.File(loc, "_pre_merge").exists())
    // aged out → retirement reclaimed, live table byte-identical
    assert(Layout.vacuumTable(spark, "b_vac", retentionMs = 0L) > 0L)
    assert(!new java.io.File(loc, "_pre_merge").exists())
    assert(Layout.readTable(spark, "b_vac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == before)
    assert(manifestOf("b_vac")._2 == loc.listFiles().map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet,
      "manifest untouched by vacuum")
    // staged dir: a swap's _pre_swap + a planted crashed .swap- staging
    val dir = java.nio.file.Files.createTempDirectory("vac-dir").toString + "/t"
    val v1 = (0L until 10L).map(k => (k, "a")).toDF("id", "p")
    Layout.writePartitioned(v1, dir, "p")
    Layout.writePartitioned((10L until 15L).map(k => (k, "b")).toDF("id", "p"), dir, "p")
    val root = new java.io.File(new java.io.File(dir).getCanonicalPath)
    assert(new java.io.File(root, "_pre_swap").exists())
    val ghost = new java.io.File(root, ".swap-deadbeef")
    (20L until 22L).map(k => (k, "c")).toDF("id", "p")
      .write.parquet(new java.io.File(ghost, "stage").toString)
    assert(Layout.vacuum(spark, dir, retentionMs = 0L) > 0L)
    assert(!new java.io.File(root, "_pre_swap").exists() && !ghost.exists())
    assert(Layout.readDir(spark, dir).select("id").as[Long].collect().toSet
      == (10L until 15L).toSet, "live post-swap table untouched")
  }

  test("addColumn evolves the bucketed schema in place: old files untouched, appends and merges carry it") {
    import spark.implicits._
    val base = (0L until 20L).map(k => (k, k * 10)).toDF("o_orderkey", "o_custkey")
    Layout.writeBucketed(base, "b_evolve", "o_orderkey", 4)
    val loc = tableLoc("b_evolve")
    val filesBefore = loc.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    Layout.addColumn(spark, "b_evolve", "score", "double")
    // the migration is metadata-only: byte-identical files
    val filesAfter = loc.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    assert(filesAfter == filesBefore, "no data file may be rewritten by the ALTER")
    // old rows read the new column as null
    val t0 = Layout.readTable(spark, "b_evolve")
    assert(t0.columns.toSeq == Seq("o_orderkey", "o_custkey", "score"))
    assert(t0.where(col("score").isNotNull).count() == 0)
    // the exactly-once append carries the evolved schema
    val batch = (100L until 105L).map(k => (k, k, k * 0.5)).toDF("o_orderkey", "o_custkey", "score")
    assert(Layout.appendBucketedBatch(batch, "b_evolve", "o_orderkey", 4, 0L))
    val t1 = Layout.readTable(spark, "b_evolve")
    assert(t1.where(col("score").isNotNull).count() == 5)
    // a CDC merge whose affected bucket spans pre- and post-evolution
    // files reads the old files through the evolved schema (null score)
    Layout.mergeBucketed(spark, "b_evolve", "o_orderkey", 4,
      Seq((1L, 999L, 9.9)).toDF("o_orderkey", "o_custkey", "score"))
    val t2 = Layout.readTable(spark, "b_evolve")
    assert(t2.where(col("o_orderkey") === 1L).select("o_custkey", "score")
      .as[(Long, Double)].head() == ((999L, 9.9)))
    assert(t2.count() == 25)
    // layout contract intact across the evolution
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = t2.join(t2.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true") && shuffles(p) == 0, p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // double-add is rejected loudly
    intercept[IllegalArgumentException] {
      Layout.addColumn(spark, "b_evolve", "score", "double")
    }
  }

  test("forgetKeys erases the keys' BYTES from the location, not just the references") {
    import spark.implicits._
    val base = (0L until 40L).map(k => (k, k * 10, s"user-$k"))
      .toDF("o_orderkey", "o_custkey", "name")
    Layout.writeBucketed(base, "b_forget", "o_orderkey", 4)
    // a prior CDC merge parks key 5's ORIGINAL row under _pre_merge — the
    // recovery copy an erasure must also purge
    Layout.mergeBucketed(spark, "b_forget", "o_orderkey", 4,
      Seq((5L, 555L, "user-5-v2")).toDF("o_orderkey", "o_custkey", "name"))
    val loc = tableLoc("b_forget")
    assert(new java.io.File(loc, "_pre_merge").exists(), "fixture: recovery copy parked")
    val n = Layout.forgetKeys(spark, "b_forget", "o_orderkey",
      Seq(5L, 7L, 7L, 999L).toDF("id"))
    // an id batch whose dtype differs from the table key is rejected
    // loudly — a silent cast could erase the WRONG key
    val te = intercept[IllegalArgumentException] {
      Layout.forgetKeys(spark, "b_forget", "o_orderkey", Seq(5.0).toDF("id"))
    }
    assert(te.getMessage.contains("cast the id batch"), te.getMessage)
    assert(n == 3, "distinct requested keys (absent ones vacuously erased)")
    val t = Layout.readTable(spark, "b_forget")
    assert(t.where(col("o_orderkey").isin(5L, 7L)).count() == 0)
    assert(t.count() == 38, "every other row survives")
    // the hard guarantee: NO file anywhere under the location still holds
    // the keys — recovery copies purged, affected buckets rewritten
    assert(!new java.io.File(loc, "_pre_merge").exists(), "recovery copies purged")
    val allFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(loc).filter(_.getName.endsWith(".parquet"))
    }
    val residual = spark.read.parquet(allFiles.map(_.toString): _*)
      .where(col("o_orderkey").isin(5L, 7L)).count()
    assert(residual == 0, "no surviving file may hold the erased keys' bytes")
    // layout contract intact
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = t.join(t.groupBy("o_orderkey").count(), "o_orderkey")
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("Bucketed: true") && shuffles(p) == 0, p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("writePartitioned swaps staged: readDir pins pre-or-post, never partial or union") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("staged-part").toString + "/t"
    val v1 = (0L until 30L).map(k => (k, if (k % 2 == 0) "click" else "view"))
      .toDF("id", "event_type")
    Layout.writePartitioned(v1, dir, "event_type")
    assert(Layout.readDir(spark, dir).count() == 30)
    // overwrite with a DIFFERENT table: the old files must retire whole
    val v2 = (100L until 120L).map(k => (k, "buy")).toDF("id", "event_type")
    Layout.writePartitioned(v2, dir, "event_type")
    val got = Layout.readDir(spark, dir).select("id").as[Long].collect().toSet
    assert(got == (100L until 120L).toSet, s"post-swap read must be exactly v2: $got")
    // v1 is retired (recoverable), not visible — to readDir OR a raw scan
    assert(spark.read.parquet(dir).count() == 20, "raw quiescent read sees only v2")
    val root = new java.io.File(new java.net.URI(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration).makeQualified(
        new org.apache.hadoop.fs.Path(dir)).toUri.toString))
    assert(new java.io.File(root, "_pre_swap").exists(), "old files park under _pre_swap")
    // v1's emptied partition dirs are pruned (no stale click/view entries)
    assert(!new java.io.File(root, "event_type=click").exists())
    // mid-swap fixture (the LayoutSpec:568 device on a plain dir): a file
    // the manifest does NOT name sits next to the live set — a raw reader
    // double-counts; readDir must pin the manifest view
    val part = new java.io.File(root, "event_type=buy")
    val victim = part.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ghost = new java.io.File(part,
      victim.getName.replaceFirst("part-\\d{5}", "part-90000"))
    java.nio.file.Files.copy(victim.toPath, ghost.toPath)
    assert(spark.read.parquet(dir).count() > 20, "fixture really is a mid-swap union")
    assert(Layout.readDir(spark, dir).select("id").as[Long].collect().toSet == got
      && Layout.readDir(spark, dir).count() == 20,
      "mid-swap readDir serves the manifest view, never the union")
    ghost.delete()
    // partition pruning still works through the staged layout
    val p = Layout.readDir(spark, dir).where(col("event_type") === "buy")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p)
  }

  test("zorderWrite swaps staged: a rewrite never exposes a partial directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("staged-z").toString + "/t"
    val v1 = (0L until 4000L).map(k => (k, k * 7 % 4000)).toDF("a", "b")
    Layout.zorderWrite(v1, dir, "a", "b", files = 8)
    assert(Layout.readDir(spark, dir).count() == 4000)
    val v2 = (0L until 2000L).map(k => (k, k * 13 % 2000)).toDF("a", "b")
    Layout.zorderWrite(v2, dir, "a", "b", files = 8)
    val post = Layout.readDir(spark, dir)
    assert(post.count() == 2000, "post-swap read is exactly the rewrite")
    val root = new java.io.File(new java.net.URI(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration).makeQualified(
        new org.apache.hadoop.fs.Path(dir)).toUri.toString))
    assert(new java.io.File(root, "_pre_swap").exists())
    // manifest == live files, and no staging leftovers
    val names = root.listFiles().map(_.getName)
    assert(!names.exists(_.startsWith(".swap-")), "staging dir is cleaned up")
    val loc = new org.apache.hadoop.fs.Path(root.toURI)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(Layout.readManifest(fs, loc).get._2
      == names.filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet)
  }
}
