package graft

import org.apache.spark.sql.functions._

import graft.operators.Kmeans

class KmeansSpec extends GraftSuite {

  test("q_kmeans: one row per vector, dense cids, d2 is the true argmin distance") {
    val out = Kmeans.kmeans(spark, sf).collect()
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val k = Kmeans.deriveK(nVec)
    assert(out.length == nVec, "one assignment per corpus vector")
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < k))
    assert(out.forall(_.getLong(2) >= 0), "squared distances are non-negative")
    // brute-force re-check on the driver: recompute codes + the trained
    // centroids and verify every (cid, d2) is the exact integer argmin
    val q = Kmeans.codes(spark, sf)
    val cen = Kmeans.trainCentroids(q, k)
    val codeOf = q.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    out.foreach { r =>
      val v = codeOf(r.getLong(0))
      val d2s = cen.map { case (cid, c) =>
        (cid, v.zip(c).map { case (a, b) => val d = a - b; d * d }.sum.toLong)
      }
      val (bestCid, bestD2) = d2s.minBy { case (cid, d2) => d2 * k + cid }
      assert(r.getLong(1) == bestCid && r.getLong(2) == bestD2,
        s"vec ${r.getLong(0)}: got (${r.getLong(1)}, ${r.getLong(2)}), want ($bestCid, $bestD2)")
    }
  }

  test("deriveK tracks corpus size across the SF ladder and clamps at both ends") {
    assert(Kmeans.deriveK(500) == 8, "sf0.01: below the floor -> MinK")
    assert(Kmeans.deriveK(20000) == 80, "sf1")
    assert(Kmeans.deriveK(200000) == 800, "sf10")
    assert(Kmeans.deriveK(1) == Kmeans.MinK)
    assert(Kmeans.deriveK(Long.MaxValue) == Kmeans.MaxK)
  }

  test("empty cluster keeps its previous centroid (the oracle's COALESCE rule)") {
    import spark.implicits._
    // seeds 0 and 1 are IDENTICAL: every point ties to them and the
    // strict-< rule sends all of cluster 1's would-be members to cid 0,
    // so cluster 1 is empty after the first assignment
    val vecs = (0L until 8L).map { i =>
      val base = if (i == 1L) 0L else i
      (i, Seq.tabulate(Kmeans.Dim)(d => (base * 10 + d % 3).toDouble))
    } ++ Seq((8L, Seq.tabulate(Kmeans.Dim)(d => (d % 3).toDouble)))
    val q = vecs.toDF("vec_id", "q")
    val cen = Kmeans.trainCentroids(q)
    val seed1 = vecs(1)._2
    assert(cen(1)._2 == seed1,
      "an empty cluster must keep its seed centroid, not NaN/zero out")
  }

  test("training is deterministic across runs") {
    val a = Kmeans.trainCentroids(Kmeans.codes(spark, sf))
    val b = Kmeans.trainCentroids(Kmeans.codes(spark, sf))
    assert(a == b)
  }

  test("assignment plan is a narrow fused scan: no shuffle, no join, no explode") {
    val p = Kmeans.kmeans(spark, sf).queryExecution.executedPlan.toString
    // the only allowed Exchange is Tables.cpuFanOut's bounded RoundRobin
    // input fan-out (single-row-group artifact) — never a keyed shuffle
    assert(!p.replace("Exchange RoundRobinPartitioning", "").contains("Exchange"),
      s"assignment must not shuffle on a key:\n$p")
    assert(!p.contains("Generate"), s"assignment must not explode:\n$p")
  }
}
