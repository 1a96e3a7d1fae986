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
}
