package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-layout tools for the 100 TB tier (SURVEY.md §5): bucketing
  * co-locates every future join/aggregation on the bucket key (the shuffle
  * is paid ONCE at write time, then every consumer reads pre-partitioned,
  * pre-sorted buckets), and partitioned directories give scans partition
  * pruning — the file-level analogue of predicate pushdown.
  *
  * Pangool had no storage-layout story (TupleFile is a flat sequence);
  * this is the Spark-native replacement for the "pre-partitioned inputs"
  * idiom its reduce-side joins assumed
  * (reference: core/.../tuplemr/mapred/lib/input/TupleInputFormat.java).
  */
object Layout {

  /** Write as a bucketed+sorted managed parquet table. A join or groupBy on
    * `key` between tables bucketed the same way plans with ZERO Exchange —
    * pinned in LayoutSpec; at 100 TB that's the fact⋈fact shuffle paid once
    * at write time instead of per query. (Spark ≥3.0 still inserts a
    * partition-LOCAL sort before an SMJ — it doesn't propagate bucket-file
    * ordering by default since that forces one-bucket-per-task scans; the
    * sort is exchange-free and spill-bounded.)
    *
    * The repartition aligns write tasks with buckets (same Murmur3 hash) so
    * each bucket is ONE file — predictable file sizes and the layout AQE
    * and bucket pruning reason about best.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // an orphaned location (table dir left by a session whose in-memory
    // catalog is gone) fails managed-table creation — clear both
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    bucketWriter(df, table, key, buckets, "overwrite")
  }

  /** The ONE write recipe both the full write and the append share — the
    * zero-Exchange contract depends on every write of a table using the
    * same bucket hash, count, and sort; keeping the chain here makes a
    * future desync impossible.
    */
  private def bucketWriter(df: DataFrame, table: String, key: String,
      buckets: Int, mode: String): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .mode(mode).format("parquet").saveAsTable(table)

  /** Collision-free per-dir tag for session-scoped layout table names —
    * md5-derived, NOT String.hashCode (32-bit hashCode collisions across
    * two data dirs would silently serve one dir's materialized layout for
    * the other).
    */
  def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  /** Append an ingest batch into an existing bucketed table WITHOUT
    * rewriting it — the daily-ingest maintenance path for a 100 TB
    * bucketed fact table (the [[graft.operators.AnnIndex.append]] economics
    * applied to storage): the batch pays its own bucket shuffle, lands as
    * one new file per bucket, and every later join/group-by on the key
    * keeps the ZERO-Exchange plan (Spark unions the per-write files of a
    * bucket into that bucket's scan partition; LayoutSpec pins it). Cost is
    * O(batch); the base table's files are untouched. Periodic
    * [[writeBucketed]] re-writes (or [[compact]]) bound the
    * files-per-bucket growth of a long append cadence.
    */
  def appendBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    // the contract is append into an EXISTING bucketed table; a typo'd or
    // not-yet-created name would otherwise silently fork a one-batch table
    // that later joins read as if it were the full fact table
    require(df.sparkSession.catalog.tableExists(table),
      s"appendBucketed target '$table' does not exist — create it with writeBucketed first")
    bucketWriter(df, table, key, buckets, "append")
  }

  /** Write partitioned by low-cardinality columns: `dir/col=value/...`
    * layout; equality/IN filters on those columns prune whole directories
    * at planning time (visible as PartitionFilters in the scan).
    */
  def writePartitioned(df: DataFrame, dir: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(dir)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Compact a directory of small parquet files into ~`targetFileBytes`
    * outputs — the standard maintenance pass after streaming/incremental
    * ingest (thousands of tiny files per trigger kill scan parallelism
    * bookkeeping and NameNode/liststore load at 100 TB). Partition count is
    * sized from the actual input bytes; `repartition` (round-robin, no
    * key) rebalances evenly without assuming any distribution.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(in).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inDir).repartition(parts)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Z-order (Morton-curve) clustering for TWO-dimensional min/max file
    * skipping: each column rank-scales to 16 bits off its global (min,
    * max), the interleaved code range-partitions + sorts the write, and
    * every output file ends up covering a small RECTANGLE in (a, b) space
    * — so a predicate on EITHER column (or a box on both) intersects only
    * ~√(files) of them, where a linear sort on `a` would leave a `b`-only
    * predicate scanning everything. The footer min/max stats parquet
    * already writes are the skipping index; no extra metadata needed. This
    * is the standard lakehouse layout trick (Delta/Iceberg `ZORDER BY`),
    * here as a plain write pass.
    */
  def zorderWrite(df: DataFrame, dir: String, colA: String, colB: String,
      files: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    // Cast inside the agg: min/max return the column's own type, and
    // Row.getLong on an int/short column throws — a long agg always works.
    val r = df.agg(min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).first()
    def scale(c: String, mn: Long, mx: Long) = // truncation == floor: nonneg
      ((col(c).cast("long") - mn) * 65535.0 / math.max(1L, mx - mn)).cast("long")
    val z = graft.functions.VectorExpressions.interleave16(
      scale(colA, r.getLong(0), r.getLong(1)),
      scale(colB, r.getLong(2), r.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
