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
    if (fs.exists(committed)) return false
    fs.mkdirs(root)
    // stage under a dot prefix: parquet scans skip hidden dirs, so a
    // crash mid-write can never surface half a batch to readers; the
    // uuid keeps two racing re-deliveries of one id from colliding on
    // the staging path (only one of their renames can win below)
    val staging = new org.apache.hadoop.fs.Path(root,
      s".staging-$batchId-${java.util.UUID.randomUUID()}")
    batch.write.mode("overwrite").parquet(staging.toString)
    // atomic publish: rename reports a losing race (or a concurrent
    // commit of the same id) as `false` — then this delivery is the
    // duplicate and its staging is swept
    if (fs.rename(staging, committed)) true
    else {
      fs.delete(staging, true)
      require(fs.exists(committed),
        s"idempotent publish of batch=$batchId failed without a prior commit")
      false
    }
  }

  /** The `foreachBatch` form: `.writeStream.foreachBatch(sink(dir))`. */
  def sink(dir: String): (DataFrame, Long) => Unit =
    (batch, id) => { writeBatch(batch, dir, id); () }

  /** Read the landed table (every committed batch, hidden staging
    * invisible); `batch` arrives as a partition column for audit/pruning.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
