package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends GraftSuite {

  test("salted join returns exactly the plain-join rows") {
    val orders = io.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val customers = io.Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customers, "o_custkey")
      .select("o_orderkey", "c_name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(orders, customers, "o_custkey", salts = 7)
      .select("o_orderkey", "c_name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("hotKeys surfaces the heaviest keys") {
    val hot = Skew.hotKeys(io.Tables.events(spark, sf), col("event_type"), topN = 2).collect()
    assert(hot.length == 2)
    assert(hot(0).getLong(1) >= hot(1).getLong(1))
  }
}
