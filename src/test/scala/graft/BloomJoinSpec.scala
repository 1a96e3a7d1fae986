package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends GraftSuite {

  test("prunedJoin is row-identical to the plain join") {
    import spark.implicits._
    // dim = a selective subset of suppliers; fact = lineitem
    val dim = graft.io.Tables.supplier(spark, sf)
      .where(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val fact = graft.io.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
    val plain = fact.join(dim, "l_suppkey")
      .select("l_orderkey", "l_suppkey", "s_name").as[(Long, Long, String)]
      .collect().sorted
    val pruned = BloomJoin.prunedJoin(fact, dim, "l_suppkey")
      .select("l_orderkey", "l_suppkey", "s_name").as[(Long, Long, String)]
      .collect().sorted
    assert(pruned.sameElements(plain))
    assert(plain.nonEmpty, "non-vacuous: the join matches rows")
  }

  test("the bloom filter prunes most non-matching fact rows pre-shuffle") {
    val dim = graft.io.Tables.supplier(spark, sf)
      .where(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey").as("l_suppkey"))
    val bf = BloomJoin.keyFilter(dim, "l_suppkey")
    val fact = graft.io.Tables.lineitem(spark, sf).select("l_suppkey")
    val total = fact.count()
    val kept = fact.where(BloomJoin.mightContain(col("l_suppkey"), bf)).count()
    val trueMatches = fact.join(dim, "l_suppkey").count()
    // no false negatives; false-positive overhead bounded well under the
    // pruned mass (fpp=1% of the ~6/7 non-matching rows)
    assert(kept >= trueMatches)
    assert(kept - trueMatches <= math.max(5L, (total * 0.05).toLong),
      s"kept=$kept true=$trueMatches total=$total")
    assert(kept < total, "filter actually prunes")
  }

  test("string keys probe mightContainString; unsupported types fail at analysis") {
    import spark.implicits._
    val dim = Seq("a", "b", "c").toDF("k")
    val bf = BloomJoin.keyFilter(dim, "k")
    val kept = Seq("a", "b", "c", "x", "y", "z").toDF("k")
      .where(BloomJoin.mightContain(col("k"), bf)).as[String].collect().toSet
    assert(Set("a", "b", "c").subsetOf(kept))
    // int keys widen to long probes
    val idim = Seq(3, 6, 9).toDF("ik")
    val ibf = BloomJoin.keyFilter(idim, "ik")
    assert(Seq(3, 4).toDF("ik").where(BloomJoin.mightContain(col("ik"), ibf))
      .collect().map(_.getInt(0)).contains(3))
    // a double key must be rejected when the plan is analyzed, not per-row
    val bad = Seq(1.0, 2.0).toDF("dk")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.where(BloomJoin.mightContain(col("dk"), bf)).collect()
    }
  }

  test("filter has no false negatives even at high fpp") {
    import spark.implicits._
    val dim = (1L to 50L).map(_ * 3).toDF("k")
    val bf = BloomJoin.keyFilter(dim, "k", fpp = 0.2)
    val keys = (1L to 150L).toDF("k")
    val kept = keys.where(BloomJoin.mightContain(col("k"), bf))
      .as[Long].collect().toSet
    assert((1L to 50L).map(_ * 3).forall(kept.contains))
  }

  test("q_bloom_join (supplierLines) equals the plain join aggregate") {
    import spark.implicits._
    // sf0.001 has no supplier above 9000 — lower the bar so the spec is
    // non-vacuous across every supplier draw
    val bar = 0.0
    val got = BloomJoin.supplierLines(spark, sf, minAcctbal = bar)
      .as[(String, Double, Long)].collect().toSet
    val plain = graft.io.Tables.lineitem(spark, sf)
      .join(graft.io.Tables.supplier(spark, sf).where(col("s_acctbal") > bar),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_lines"))
      .as[(String, Double, Long)].collect().toSet
    assert(got == plain)
    assert(got.nonEmpty, "non-vacuous: some suppliers clear the acctbal bar")
  }

  test("an empty dim yields an empty (not crashing) bloom join") {
    // a 9000 bar selects zero suppliers at sf0.001 — the filter must
    // prune everything and the join must return the plain join's answer: ∅
    assert(BloomJoin.supplierLines(spark, sf, minAcctbal = 9000.0).isEmpty)
  }
}
