package graft

import graft.operators.Graph

class GraphSpec extends GraftSuite {

  private def bruteTriangles(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      i <- nodes; j <- nodes if j > i && es((i, j))
      k <- nodes if k > j && es((j, k)) && es((i, k))
    } yield (i, j, k)).toSet
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Graph.trianglesOf(edges.toDF("u", "v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("trianglesOf equals brute force on seeded random graphs (10 trials)") {
    val rnd = new scala.util.Random(11)
    (1 to 10).foreach { _ =>
      val n = rnd.nextInt(14) + 4
      val edges = (for {
        i <- 0L until n; j <- (i + 1) until n if rnd.nextDouble() < 0.35
      } yield (i, j)).toSeq
      if (edges.nonEmpty) {
        val got = runTriangles(edges)
        assert(got.distinct.size == got.size, s"duplicate triangle rows, edges=$edges")
        assert(got.toSet == bruteTriangles(edges), s"diverges on edges=$edges")
      }
    }
  }

  test("trianglesOf on a star graph: zero triangles, bounded wedge fan-out") {
    // the adversarial case degree-ordering exists for: a hub of degree 40.
    // id-ordered orientation with hub id 0 would enumerate C(40,2) wedges;
    // (deg,id)-ordering points every spoke INTO the hub (spokes have deg 1
    // < 40), so the hub is never an apex and the wedge join emits nothing.
    val star = (1L to 40L).map(i => (0L, i))
    assert(runTriangles(star).isEmpty)
    // star + one chord: exactly one triangle, found despite the hub
    val chord = star :+ (1L, 2L)
    assert(runTriangles(chord).toSet == Set((0L, 1L, 2L)))
  }

  test("trianglesOf on a clique: C(n,3) triangles exactly") {
    val n = 8L
    val k = for { i <- 0L until n; j <- (i + 1) until n } yield (i, j)
    val got = runTriangles(k)
    assert(got.size == 56 && got.toSet == bruteTriangles(k)) // C(8,3)
  }

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

  test("bfs matches a plain-Scala BFS on the real graph, hop-capped") {
    val maxHops = 4
    val got = Graph.bfs(spark, sf, source = 2L, maxHops = maxHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the bipartite graph locally and run textbook BFS
    val li = graft.io.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val ord = graft.io.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cs = li.flatMap { case (ok, sk) => ord.get(ok).map(ck => (ck * 2, sk * 2 + 1)) }.distinct
    val adj = (cs ++ cs.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).toSeq }
    val dist = scala.collection.mutable.Map(2L -> 0L)
    var frontier = Seq(2L)
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(u => adj.getOrElse(u, Seq.empty[Long]))
        .distinct.filterNot(dist.contains(_))
      frontier.foreach(v => dist(v) = h.toLong)
    }
    assert(got == dist.toMap, s"sizes ${got.size} vs ${dist.size}")
    assert(got(2L) == 0L)
    // hop-1 set must be exactly the source customer's suppliers
    val hop1 = got.filter(_._2 == 1L).keySet
    assert(hop1 == adj(2L).toSet)
  }

  test("bfs early-exit (maxHops = -1) equals a generous fixed budget") {
    // unbounded mode stops on the first empty frontier; on the real graph
    // that must yield exactly the distances a more-than-deep-enough fixed
    // budget finds (and prove the graph exhausts before 10 hops)
    val unbounded = Graph.bfs(spark, sf, maxHops = -1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val budget = Graph.bfs(spark, sf, maxHops = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unbounded == budget, "early-exit must not change reachability or distances")
    assert(unbounded.map(_._2).max < 10L, "fixture graph must exhaust within the budget")
  }

  test("bfs result plan reads no parquet: every hop rides the checkpointed edges") {
    val plan = Graph.bfs(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), "BFS must not re-scan source tables per hop")
  }
}
