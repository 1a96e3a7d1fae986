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
    else {
      run("call-1")
      run("call-2")
      run("call-3")
    }
    spark.stop()
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
    val delta = li.where(pmod(col("l_orderkey"), lit(97)) === 0)
      .dropDuplicates("l_orderkey")
      .withColumn("l_comment", lit("cdc-update"))
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
    val applied = spark.table(table).where(col("l_comment") === "cdc-update").count()
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
  }
}
