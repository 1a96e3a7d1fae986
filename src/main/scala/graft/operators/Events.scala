package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Event-stream analytics in batch form (SURVEY.md §2D). The same plans run
  * under Structured Streaming via [[graft.streaming.EventsStream]]; here they
  * are batch queries so the DuckDB oracle can check them.
  */
object Events {

  /** D1 — tumbling 1-hour window aggregate per event type. Hour emitted as
    * epoch millis (BIGINT) for engine-portable comparison.
    */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))

  /** D2 — sessionization: a session breaks after a 30-minute silence per
    * user. Session id = running count of gap-breaks (one window exchange
    * keyed by user); output is per-session shape.
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapSec * 1000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("start_ms"),
        unix_millis(max(col("ts"))).as("end_ms"))
  }

  /** D3 — top-5 users per event type by activity (window top-N, ties broken
    * by user_id).
    */
  def topUsers(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("cnt").desc, col("user_id"))
    counts.withColumn("rk", row_number().over(w))
      .where(col("rk") <= n)
      .select(col("event_type"), col("rk"), col("user_id"), col("cnt"))
  }
}
