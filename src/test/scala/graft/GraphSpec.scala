package graft

import graft.operators.Graph

class GraphSpec extends GraftSuite {

  test("pageRank matches an exact integer recomputation on the real graph") {
    val got = Graph.pageRank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the graph locally and run the same integer recurrence
    val li = graft.io.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val ord = graft.io.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cs = li.flatMap { case (ok, sk) => ord.get(ok).map(ck => (ck * 2, sk * 2 + 1)) }.distinct
    val sym = cs ++ cs.map(_.swap)
    val deg = sym.groupBy(_._1).map { case (u, es) => u -> es.length.toLong }
    var score = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val recv = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      sym.foreach { case (u, v) => recv(v) += score(u) / deg(u) }
      score = recv.map { case (v, s) => v -> (150000L + 85L * s / 100L) }.toMap
    }
    assert(got == score)
    assert(got.nonEmpty && got.values.forall(_ >= 150000L))
    // mass roughly conserved (floor losses only shrink it)
    val total = got.values.sum
    assert(total <= 1000000L * got.size && total > 900000L * got.size)
  }
}
