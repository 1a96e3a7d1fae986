package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.io.{Layout, Tables}

class LayoutSpec extends GraftSuite {

  private def shuffles(p: String): Int =
    p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))

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

  test("zorderWrite accepts non-long integral columns") {
    import spark.implicits._
    val df = (0 until 256).map(i => (i % 16, i / 16)).toDF("a", "b") // ints
    val dir = java.nio.file.Files.createTempDirectory("z-int").toString
    Layout.zorderWrite(df, dir, "a", "b", files = 4)
    assert(spark.read.parquet(dir).count() == 256)
  }
}
