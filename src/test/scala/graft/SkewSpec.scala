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

  test("salted join stays row-identical under a constructed 90%-hot key") {
    import spark.implicits._
    // one key holds 90% of the fact side — the regime salting exists for
    // (the SF tables are uniform, so this is the only real skew coverage)
    val fact = ((1 to 9000).map(i => (42L, i.toLong)) ++
      (1 to 1000).map(i => ((i % 50).toLong, -i.toLong))).toDF("k", "payload")
    val dim = (0L to 60L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    // the mechanism itself: the same seeded salt expression the join uses
    // must spread the hot key over (nearly) all 8 buckets, so no single
    // reducer owns it — the property that matters at 100 TB
    val buckets = fact.where($"k" === 42L)
      .withColumn("__salt", Skew.saltExpr(8))
      .groupBy("__salt").count().collect().map(r => r.getLong(1))
    assert(buckets.length >= 7, s"hot key concentrated in ${buckets.length} buckets")
    assert(buckets.max < 9000 / 4, s"one bucket still owns ${buckets.max} hot rows")
  }

  test("hotKeys surfaces the heaviest keys") {
    val hot = Skew.hotKeys(io.Tables.events(spark, sf), col("event_type"), topN = 2).collect()
    assert(hot.length == 2)
    assert(hot(0).getLong(1) >= hot(1).getLong(1))
  }
}
