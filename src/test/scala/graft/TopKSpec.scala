package graft

import org.apache.spark.sql.functions._

import graft.api.TupleJob
import graft.operators.TopK

class TopKSpec extends GraftSuite {

  test("map-side partial top-k equals the pure window form") {
    import spark.implicits._
    val windowForm = operators.Relational.topNPerGroup(spark, sf)
      .select("o_custkey", "rk", "o_orderkey")
      .as[(Long, Int, Long)].collect().toSet
    val partialForm = TopK.perGroup(io.Tables.orders(spark, sf),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select("o_custkey", "rk", "o_orderkey")
      .as[(Long, Int, Long)].collect().toSet
    assert(partialForm == windowForm)
  }

  test("partial reduction really bounds per-partition output") {
    val df = io.Tables.orders(spark, sf).repartition(4)
    val out = TopK.perGroup(df, Seq("o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
    // 5 priorities × k=2 final rows
    assert(out.count() == 10)
  }

  test("nullable sort keys follow Spark null ordering (asc nulls first, desc nulls last)") {
    import spark.implicits._
    // score null on some rows; Spark windows put nulls FIRST asc / LAST desc
    val df = Seq(
      ("g1", Some(5L), 1L), ("g1", None, 2L), ("g1", Some(1L), 3L), ("g1", Some(9L), 4L),
      ("g2", None, 5L), ("g2", None, 6L), ("g2", Some(2L), 7L)
    ).map { case (g, s, id) => (g, s.map(Long.box).orNull, id) }
      .toDF("g", "score", "id")
    def windowForm(asc: Boolean) = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
        .orderBy(if (asc) col("score").asc else col("score").desc, col("id").asc)
      df.withColumn("rk", row_number().over(w)).where(col("rk") <= 2)
        .select("g", "rk", "id").as[(String, Int, Long)].collect().toSet
    }
    def partialForm(asc: Boolean) =
      TopK.perGroup(df, Seq("g"), Seq(("score", asc), ("id", true)), 2)
        .select("g", "rk", "id").as[(String, Int, Long)].collect().toSet
    assert(partialForm(asc = true) == windowForm(asc = true))
    assert(partialForm(asc = false) == windowForm(asc = false))
  }

  test("TupleJob.partitionBy accepts subsets and rejects non-group fields") {
    val events = io.Tables.events(spark, sf)
    val job = TupleJob.groupBy(events, "user_id", "event_type").partitionBy("user_id")
    val out = job.orderBy(col("ts"), col("event_id"))
      .reduce(io.GSchema.parse("user_id:long, event_type:string, n:long")) { (key, rows) =>
        Iterator(org.apache.spark.sql.Row(key.get(0), key.get(1), rows.size.toLong))
      }
    val total = out.agg(sum("n")).head.getLong(0)
    assert(total == events.count())
    intercept[IllegalArgumentException] {
      TupleJob.groupBy(events, "user_id").partitionBy("event_type")
    }
  }
}
