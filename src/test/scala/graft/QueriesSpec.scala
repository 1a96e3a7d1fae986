package graft

import org.apache.spark.sql.functions._

/** Every SparkEntry query must run at sf0.001; the driver's DuckDB oracle
  * does value checks — here we pin schemas and basic invariants.
  */
class QueriesSpec extends GraftSuite {

  // pair queries may legitimately be empty at the tiny scale
  private val mayBeEmpty = Set("q_dedup_minhash", "q_ngram_jaccard", "q_dedup_embedding")

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_agg_groupby matches a hand-computed slice") {
    val df = SparkEntry.queries("q_agg_groupby")(spark, sf)
    val total = df.agg(sum("count_order")).head.getLong(0)
    val expected = io.Tables.lineitem(spark, sf)
      .where(col("l_shipdate") <= lit("1998-09-02")).count()
    assert(total == expected)
  }

  test("q_topn_per_group emits at most 3 per customer, ranked") {
    val df = SparkEntry.queries("q_topn_per_group")(spark, sf)
    val bad = df.groupBy("o_custkey").agg(count(lit(1)).as("n"), max("rk").as("m"))
      .where(col("n") > 3 || col("m") > 3).count()
    assert(bad == 0)
  }

  test("q_normalize shares sum to 1 per user") {
    val df = SparkEntry.queries("q_normalize")(spark, sf)
    val off = df.groupBy("user_id").agg(sum("share").as("s"))
      .where(abs(col("s") - 1.0) > 1e-4).count()
    assert(off == 0)
  }
}
