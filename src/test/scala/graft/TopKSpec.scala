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
