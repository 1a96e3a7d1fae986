package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** D20 — exactly-once parquet landing for `foreachBatch` (SURVEY.md §2D).
  *
  * Structured Streaming guarantees foreachBatch runs AT-LEAST-once per
  * micro-batch: after a failure or checkpoint restart the same
  * (batchId, data) can be re-delivered, and a naive `append` writes the
  * batch twice — the classic silent-duplication failure of streaming
  * ingest (Pangool's Hadoop world had no streaming story at all; this is
  * the Spark-deployment piece that makes the landing table trustworthy).
  *
  * Mechanics — idempotence from the FILESYSTEM, no transaction log:
  * each batch writes to a dot-prefixed staging dir (invisible to parquet
  * scans), then RENAMES it to `dir/batch=<id>` — one atomic publish per
  * batch id. A `batch=<id>` dir that already exists means the id
  * committed before (this run or a previous incarnation) → the re-run is
  * a no-op, staging is discarded. A crash before the rename leaves only
  * a hidden staging dir (swept on the id's next delivery); a crash after
  * it is exactly the committed state. Readers see a plain
  * `batch=<id>`-partitioned parquet table, so partition pruning by batch
  * id is free and the batch column doubles as the ingest audit trail.
  *
  * At 100 TB: one rename + one dir probe per micro-batch of metadata
  * overhead; data is written exactly once, never rewritten. (On an
  * object store without atomic dir rename, swap the rename for the
  * store's conditional-put commit — the contract of this surface is the
  * probe-stage-publish sequence, not the POSIX rename.)
  */
object IdempotentSink {

  /** Land `batch` as `dir/batch=<batchId>` exactly once. Returns true if
    * this call committed the batch, false if the id was already committed
    * (the re-delivery no-op).
    */
  def writeBatch(batch: DataFrame, dir: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = new org.apache.hadoop.fs.Path(root, s"batch=$batchId")
    // sweep this id's crashed staging leftovers (a crash between the
    // write and the publish strands one hidden micro-batch of parquet —
    // the id's next delivery is the reclaim point). If the leftover
    // belongs to a LIVE racer, its write or rename fails loudly and
    // resolves to a single commit either way.
    if (fs.exists(root))
      fs.listStatus(root)
        .filter(_.getPath.getName.startsWith(s".staging-$batchId-"))
        .foreach(s => fs.delete(s.getPath, true))
    if (fs.exists(committed)) return false
    fs.mkdirs(root)
    // stage under a dot prefix: parquet scans skip hidden dirs, so a
    // crash mid-write can never surface half a batch to readers; the
    // uuid keeps two racing re-deliveries of one id from colliding on
    // the staging path
    val staging = new org.apache.hadoop.fs.Path(root,
      s".staging-$batchId-${java.util.UUID.randomUUID()}")
    batch.write.mode("overwrite").parquet(staging.toString)
    // Atomic publish — with the Hadoop-semantics trap handled: rename
    // into an EXISTING directory does not fail, it NESTS the source
    // inside it and returns true (HDFS moves it under, LocalFileSystem
    // falls back to copy-under) — so "rename returned true" is NOT
    // "this call committed". The winner's rename creates `committed`
    // itself; a loser's rename lands as committed/.staging-<id>-<uuid>.
    // Detect the nesting, sweep it, and report the loss.
    if (!fs.rename(staging, committed)) {
      fs.delete(staging, true)
      require(fs.exists(committed),
        s"idempotent publish of batch=$batchId failed without a prior commit")
      false
    } else {
      val nested = new org.apache.hadoop.fs.Path(committed, staging.getName)
      if (fs.exists(nested)) { fs.delete(nested, true); false }
      else true
    }
  }

  /** The `foreachBatch` form: `.writeStream.foreachBatch(sink(dir))`. */
  def sink(dir: String): (DataFrame, Long) => Unit =
    (batch, id) => { writeBatch(batch, dir, id); () }

  /** Read the landed table (every committed batch, hidden staging
    * invisible); `batch` arrives as a LONG partition column for
    * audit/pruning (normalized — partition discovery would otherwise
    * infer int for small ids). Before the first commit there is nothing
    * to infer a schema from: pass `schema` (the DATA columns, without
    * `batch`) to get an empty table instead of an error — the
    * monitor-starts-before-the-stream case.
    */
  def read(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType = null): DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatch = fs.exists(root) && fs.listStatus(root)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (hasBatch)
      spark.read.parquet(dir).withColumn("batch", col("batch").cast("long"))
    else {
      require(schema != null,
        s"no committed batches under $dir yet — pass the data schema to read an empty table")
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.add("batch", org.apache.spark.sql.types.LongType))
    }
  }
}
