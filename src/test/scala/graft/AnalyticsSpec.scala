package graft

import org.apache.spark.sql.functions._

import graft.operators.Analytics

class AnalyticsSpec extends GraftSuite {

  test("asof join: every matched click precedes its purchase; unmatched are null") {
    val out = Analytics.asofPurchaseClick(spark, sf)
    assert(out.where(col("gap_us") < 0).count() == 0)
    // null click ⇔ null gap
    assert(out.where(col("last_click_id").isNull =!= col("gap_us").isNull).count() == 0)
    assert(out.count() ==
      io.Tables.events(spark, sf).where(col("event_type") === "purchase").count())
  }

  test("range join keeps zero-click errors with count 0") {
    val out = Analytics.rangeJoinErrorClicks(spark, sf)
    assert(out.count() ==
      io.Tables.events(spark, sf).where(col("event_type") === "error").count())
    assert(out.agg(min("n_recent_clicks")).head.getLong(0) >= 0)
  }

  test("pivot row sums equal the user's event count") {
    val p = Analytics.pivotUserActivity(spark, sf)
      .withColumn("total",
        Analytics.EventTypes.map(col).reduce(_ + _))
    val direct = io.Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    val bad = p.join(direct, "user_id").where(col("total") =!= col("n")).count()
    assert(bad == 0)
  }
}
