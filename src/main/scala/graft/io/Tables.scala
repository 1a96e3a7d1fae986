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
    * inference loads as TIMESTAMP_NTZ). Detect the unit instead of assuming
    * it: try plain inference first and normalize to TimestampType (session
    * TZ is pinned to UTC everywhere, so NTZ→TZ is value-preserving); only
    * when inference throws the nanos-unsupported error fall back to reading
    * the column as BIGINT epoch nanos and converting explicitly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val path = s"$d/events.parquet"
    scala.util.Try(s.read.parquet(path)) match {
      case scala.util.Success(df) if df.schema("ts").dataType != LongType =>
        // TIMESTAMP(MICROS/MILLIS), possibly NTZ — normalize to TimestampType.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        // Inference threw (TIMESTAMP(NANOS) is unsupported) or the file stores
        // raw INT64: read as BIGINT epoch nanos. Integer division: epoch nanos
        // (~1.7e18) exceed double's exact range, so `/ 1000` via double would
        // corrupt the low microseconds.
        s.read
          .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
          .parquet(path)
          .withColumn(
            "ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
