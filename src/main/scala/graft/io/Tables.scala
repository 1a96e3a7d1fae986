package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * Mirrors the role of Pangool's TupleInputFormat/TupleFile
  * (reference: core/src/main/java/com/datasalt/pangool/io/TupleFile.java) —
  * a schema-carrying binary tuple source. In Spark the columnar successor is
  * parquet: the scan prunes columns and pushes filters down, which is the
  * property TupleFile never had.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan a CPU-bound derivation's input out to one partition per core —
    * IF the scan can't already feed that many tasks. Scan parallelism is
    * bounded by parquet row groups, and the driver's documents.parquet /
    * embeddings.parquet ship as a SINGLE row group at every SF (sf10:
    * 500k docs, 62 MB, one group), so tokenize/shingle/hash/quantize —
    * the dominant cost of the text and vector families — otherwise runs
    * in ONE task while the other 31 cores idle (measured: 16 s of
    * q_dedup_containment's 48 s at sf10; the fix took the query to
    * 12.4 s). The condition makes the device self-disabling at real
    * scale: a 100 TB corpus scans as thousands of splits, so the check
    * sees enough partitions and adds NOTHING — narrow queries stay
    * narrow. The explicit partition count matters: a bare repartition()
    * is an AQE-advisory shuffle that would coalesce ~60 MB right back to
    * one partition.
    */
  def cpuFanOut(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df else df.repartition(cores)
  }

  /** Below this input size the fan-out hurts: a RoundRobin exchange costs
    * a fixed ~100 ms (extra stage, sort-before-repartition, 32-task
    * scheduling) while the single-task scan CPU scales with bytes — at
    * the measured ~4 MB/s tokenize+shingle+hash throughput, 4 MB is the
    * break-even neighbourhood (measured: un-gated fan-out added ~8 s
    * across the 600 KB-corpus sf0.1 suite while saving hundreds of
    * seconds at sf10's 62 MB).
    */
  val MinFanOutBytes: Long = 4L << 20

  /** The media family's fan-out gate. Media derivation pays ~100× more
    * CPU per input byte than tokenize (a PNG encode + decode per row —
    * measured ~0.17 ms/frame encode + ~0.08 ms/frame decode vs the ~4 MB/s
    * tokenize+shingle throughput [[MinFanOutBytes]] was tuned for), so its
    * single-task break-even is ~50 KB of document bytes, not 4 MB. At
    * sf0.1 the 584 KB documents table ran the WHOLE video pipeline (20k
    * PNG encodes + decodes, ~5 s of kernel CPU) in one task while 31
    * cores idled — exactly the q_dedup_containment sf10 lesson one tier
    * down the byte scale.
    */
  val MinMediaFanOutBytes: Long = 48L << 10

  /** Memoized fan-out decision per (table path, core count): probing the
    * scan's partition count (`df.rdd.getNumPartitions`) plans the physical
    * scan — ~100 ms of driver work that, paid on EVERY Tables.documents
    * call (most queries make 2–4), added ~0.3–0.5 s to nearly every
    * corpus query at sf0.1 (measured: suite 70.6 → 101 s). The artifact's
    * layout is immutable within a session, so the probe result is cached
    * by path; the repartition itself stays lazy per plan.
    */
  private val fanOutNeeded = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def cpuFanOutCached(df: DataFrame, path: String,
      minBytes: Long = MinFanOutBytes): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val need = fanOutNeeded.computeIfAbsent(s"$path@$cores@$minBytes", _ =>
      java.lang.Boolean.valueOf(
        pathBytes(df.sparkSession, path) >= minBytes &&
          df.rdd.getNumPartitions < cores))
    if (need) df.repartition(cores) else df
  }

  /** Total bytes under a table path (file or directory of parts) — one
    * driver-side FS stat, no job.
    */
  private def pathBytes(s: SparkSession, path: String): Long =
    scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    }.getOrElse(Long.MaxValue) // unknown size: err on the fan-out side

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` column has changed physical type across data
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects at
    * schema inference) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (which
    * inference loads as TIMESTAMP_NTZ). Detect the unit from the parquet
    * FOOTER instead of assuming it — one driver-side metadata read, no
    * probe Spark job (an earlier try-inference-catch-fallback version paid
    * a failed inference job and an ERROR log line per read on nanos data).
    * MICROS/MILLIS files load by inference and normalize to TimestampType
    * (session TZ is pinned to UTC everywhere, so NTZ→TZ is
    * value-preserving); NANOS and raw-INT64 files read the column as
    * BIGINT epoch nanos and convert explicitly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampType
    val path = s"$d/events.parquet"
    if (tsNeedsNanosPath(s, path))
      // Integer division: epoch nanos (~1.7e18) exceed double's exact
      // range, so `/ 1000` via double would corrupt the low microseconds.
      s.read
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
        .parquet(path)
        .withColumn(
          "ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    else
      s.read.parquet(path).withColumn("ts", col("ts").cast(TimestampType))
  }

  /** True iff the file's `ts` is TIMESTAMP(NANOS) or un-annotated INT64 —
    * the layouts Spark's reader can't (or shouldn't) infer as a timestamp.
    * Reads one footer on the driver; any sniffing failure returns false so
    * the plain inference path surfaces the real error.
    */
  private def tsNeedsNanosPath(s: SparkSession, path: String): Boolean =
    scala.util.Try {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val conf = s.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      // the "file" may be a Spark-written directory of part files
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet") || f.getName.startsWith("part-"))
            .head
        else p
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val ts = schema.getFields.get(schema.getFieldIndex("ts"))
        ts.asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case null => true // bare INT64: legacy epoch-nanos layout
          case _ => false
        }
      } finally reader.close()
    }.getOrElse(false)
  /** documents and embeddings ship as single-row-group artifacts at every
    * SF, so they load through [[cpuFanOut]]: every downstream tokenize/
    * hash/quantize/decode stage gets core-count parallelism instead of one
    * task. Catalyst still prunes columns and pushes filters below the
    * fan-out exchange, so cheap aggregate queries shuffle only the columns
    * they read (~60 MB of text at sf10 worst-case). The TPC-H tables and
    * events are left alone — at bench SFs they carry enough row groups,
    * and their queries are shuffle-dominated, not scan-CPU-bound.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    cpuFanOutCached(load(s, d, "documents"), s"$d/documents.parquet")
  /** [[documents]] for media-synthesis/decode consumers ([[graft.operators
    * .Multimodal]]): same loader, same memoized probe, but the
    * [[MinMediaFanOutBytes]] gate — per-row codec cost reaches break-even
    * ~80× earlier than tokenize. Self-disabling at real scale exactly like
    * the text gate (enough scan splits → no repartition).
    */
  def documentsMedia(s: SparkSession, d: String): DataFrame =
    cpuFanOutCached(load(s, d, "documents"), s"$d/documents.parquet",
      MinMediaFanOutBytes)
  def embeddings(s: SparkSession, d: String): DataFrame =
    cpuFanOutCached(load(s, d, "embeddings"), s"$d/embeddings.parquet")
}
