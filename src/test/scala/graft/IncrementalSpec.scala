package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventsStream

class IncrementalSpec extends GraftSuite {

  test("Trigger.AvailableNow + checkpoint processes each landed file exactly once") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val landing = Files.createTempDirectory("landing").toString
    val chk = Files.createTempDirectory("chk").toString
    val out = Files.createTempDirectory("incout").toString

    // batch 1: even event ids only
    raw.where(col("event_id") % 2 === 0).write.mode("append").parquet(landing)
    EventsStream.incrementalCounts(spark, landing, raw.schema, chk, s"$out/b1")
    val b1 = spark.read.parquet(s"$out/b1").as[(String, Long)].collect().toMap

    // batch 2: rest lands; complete-mode counts now cover everything, but
    // the checkpoint proves the first files weren't re-read (state resumed)
    raw.where(col("event_id") % 2 =!= 0).write.mode("append").parquet(landing)
    EventsStream.incrementalCounts(spark, landing, raw.schema, chk, s"$out/b2")
    val b2 = spark.read.parquet(s"$out/b2").as[(String, Long)].collect().toMap

    val full = raw.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(b2 == full, "cumulative state after second increment must equal batch totals")
    assert(b1.values.sum < full.values.sum, "first increment saw only the first slice")
  }
}
