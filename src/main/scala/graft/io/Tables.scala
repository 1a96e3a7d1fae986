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
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects at schema inference; an EXPLICIT schema requesting the
    * column as BIGINT (epoch nanos) skips inference and reads fine — without
    * the session-wide `spark.sql.legacy.parquet.nanosAsLong` toggle this
    * loader used to set (a config side effect on unrelated reads).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // integer division: epoch nanos (~1.7e18) exceed double's exact range,
    // so `/ 1000` via double would corrupt the low microseconds.
    s.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")
      .withColumn(
        "ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
