package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * each batch writes under `dir/.staging/.s-<id>-<uuid>` (the hidden
  * parent keeps the hot root listing free of staging entries; the
  * dot-prefixed dir NAME stays hidden even if a losing publish nests it
  * somewhere visible), then RENAMES it to `dir/batch=<id>` — one atomic
  * publish per batch id. A `batch=<id>` dir that already exists means
  * the id committed before (this run or a previous incarnation) → the
  * re-run is a no-op. Crash leftovers are reclaimed on the id's NEXT
  * delivery — and only on paths where no live racer can still commit the
  * id (after our own commit, or when the id is already committed), so a
  * sweep can never turn a concurrent writer's in-flight output into a
  * partial commit. Readers see a plain `batch=<id>`-partitioned parquet
  * table, so partition pruning by batch id is free and the batch column
  * doubles as the ingest audit trail.
  *
  * At 100 TB: per micro-batch, one probe of `batch=<id>`, one listing of
  * the O(in-flight) `.staging/` dir, one rename — metadata cost
  * independent of how many batches the table has accumulated; data is
  * written exactly once, never rewritten. (On an object store without
  * atomic dir rename, swap [[publish]] for the store's conditional-put
  * commit — the contract of this surface is the probe-stage-publish
  * sequence, not the POSIX rename.)
  */
object IdempotentSink {

  // The staging layout (`.staging/.s-<id>-<uuid>` + the `.committer-*`
  // marker) is the sink's ON-DISK contract: reclaim sweeps exactly these
  // names, so the layout must never change without a migration sweep for
  // the old names. (No earlier layout ever shipped — the pre-r17-review
  // root-level `.staging-<id>-*` form existed only within this round.)
  private def stagingRoot(root: Path) = new Path(root, ".staging")

  /** Delete this id's staging leftovers (root `.staging/.s-<id>-*`) and
    * any hidden copy a losing publish nested inside the committed dir
    * before crashing (`batch=<id>/.s-<id>-*`). Callers invoke this ONLY
    * when the id can no longer be committed by anyone else (it is
    * already committed) — deleting a LIVE racer's staging mid-write
    * could otherwise let its half-written job commit a partial batch.
    *
    * `stagingGraceMs` age-gates the `.staging/` sweep (r17 ADVICE): even
    * with the id committed, a concurrent ZOMBIE re-delivery of the same
    * id may still be mid-write into its staging dir — its publish can
    * never win (the commit exists), but sweeping under it turns its clean
    * lost-race no-op into opaque missing-file write errors. Age is the
    * NEWEST mtime in the staging subtree, not the dir's own (r18 review:
    * task files land under `_temporary/` without bumping the dir, so a
    * write merely LONGER than the grace would read as stale by dir
    * mtime) — any recent write activity protects the dir; the recursive
    * walk costs O(one in-flight batch's files), paid only when same-id
    * leftovers exist at all. Staging younger than the grace waits for a
    * later delivery's sweep; nested copies inside `committed` are always
    * reclaimed (they only appear via a completed — lost — rename, never
    * under a live writer).
    */
  private def reclaim(fs: FileSystem, root: Path, committed: Path,
      batchId: Long, stagingGraceMs: Long = 0L): Unit = {
    val prefix = s".s-$batchId-"
    val sr = stagingRoot(root)
    val cutoff = System.currentTimeMillis() - stagingGraceMs
    // a subtree that VANISHES mid-walk (the zombie published or swept it
    // concurrently — the very race the gate exists for) must read as
    // "don't touch", not crash the no-op fast path (r18 review): report
    // it as maximally fresh and let a later delivery sweep what remains.
    // Recurses on the FileStatus already in hand — no per-dir re-stat RPC.
    def newestMtime(st: org.apache.hadoop.fs.FileStatus): Long =
      try {
        val kids = if (st.isDirectory) fs.listStatus(st.getPath)
                   else Array.empty[org.apache.hadoop.fs.FileStatus]
        (Seq(st.getModificationTime) ++ kids.map(newestMtime)).max
      } catch { case _: java.io.FileNotFoundException => Long.MaxValue }
    if (fs.exists(sr))
      fs.listStatus(sr).filter(s => s.getPath.getName.startsWith(prefix)
          && (stagingGraceMs <= 0L || newestMtime(s) <= cutoff))
        .foreach(s => fs.delete(s.getPath, true))
    if (fs.exists(committed))
      fs.listStatus(committed).filter(_.getPath.getName.startsWith(prefix))
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** Atomic publish of a staged batch dir — with the Hadoop-semantics
    * trap handled: `rename` into an EXISTING directory does not fail, it
    * NESTS the source inside it and returns true (HDFS moves it under,
    * LocalFileSystem falls back to copy-under) — so "rename returned
    * true" is NOT "this call committed". The winner's rename makes the
    * staging dir BECOME `committed`; a loser's lands as
    * `committed/.s-<id>-<uuid>` (hidden — readers never see it).
    *
    * Win/loss is decided by the COMMITTER MARKER, not by observing the
    * nested copy (r17 pass 5): each staging carries a hidden
    * `.committer-<uuid>` file, so "my marker sits DIRECTLY under
    * committed" ⇔ "my dir became committed" — a deterministic fact of
    * the rename, immune to the race where the winner's reclaim deletes
    * the loser's nested copy before the loser looks for it (both racers
    * would then have claimed the commit). The winner's marker stays in
    * the committed dir as a zero-cost audit of which delivery won.
    * Returns true iff THIS staging became the committed batch.
    */
  private[graft] def publish(fs: FileSystem, staging: Path,
      committed: Path): Boolean = {
    val marker = s".committer-${staging.getName.stripPrefix(".s-")}"
    fs.create(new Path(staging, marker), true).close()
    if (!fs.rename(staging, committed)) {
      fs.delete(staging, true)
      require(fs.exists(committed),
        s"idempotent publish to $committed failed without a prior commit")
      false
    } else if (fs.exists(new Path(committed, marker))) true
    else {
      // nested loss: best-effort sweep of our copy (a crash here is
      // reclaimed on the id's next delivery)
      fs.delete(new Path(committed, staging.getName), true)
      false
    }
  }

  /** Land `batch` as `dir/batch=<batchId>` exactly once. Returns true if
    * this call committed the batch, false if the id was already committed
    * (the re-delivery no-op).
    *
    * Zombie-racer failure mode, documented (r17 verdict): the POST-commit
    * reclaim below sweeps other leftovers of the now-committed id without
    * an age gate — a zombie driver still writing its own staging for this
    * id loses its files mid-write and fails LOUDLY (its publish could
    * never win anyway; correctness is unaffected). The already-committed
    * fast path, which a zombie is far more likely to race, IS age-gated.
    */
  def writeBatch(batch: DataFrame, dir: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = new Path(root, s"batch=$batchId")
    if (fs.exists(committed)) {
      // already committed → nobody else can commit this id again; safe
      // point to reclaim crash leftovers (staging and nested copies).
      // The staging sweep is age-gated here: a fresh same-id staging may
      // be a live zombie re-delivery mid-write (see [[reclaim]]);
      // `spark.graft.sink.reclaimGraceMs` tunes the gate (0 sweeps all).
      reclaim(fs, root, committed, batchId, stagingGraceMs =
        spark.conf.get("spark.graft.sink.reclaimGraceMs", "600000").toLong)
      return false
    }
    // stage hidden: parquet scans skip dot dirs, so a crash mid-write can
    // never surface half a batch to readers; the uuid keeps two racing
    // re-deliveries of one id from colliding on the staging path
    val staging = new Path(stagingRoot(root),
      s".s-$batchId-${java.util.UUID.randomUUID()}")
    batch.write.mode("overwrite").parquet(staging.toString)
    val won = publish(fs, staging, committed)
    // the id is committed now (by us or the racer that beat us) — reclaim
    // any other leftovers of this id
    reclaim(fs, root, committed, batchId)
    won
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
    val root = new Path(dir)
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
