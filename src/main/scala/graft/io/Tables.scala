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
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
