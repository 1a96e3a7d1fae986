package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B harness for the r10 q_pagerank residual investigation
  * (VERDICT r9 item 6): per-pass lazy localCheckpoint vs sparser cadences,
  * best-of-N wall-clock per variant at a given SF.
  *
  * Run: sbt "Test/runMain graft.PageRankAB /root/testdata/sf0.1 5"
  * Results recorded in PLANS.md (round 10).
  */
object PageRankAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("pagerank-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(every: Int): (Double, Long) = {
      var best = Double.MaxValue
      var hash = 0L
      for (_ <- 1 to reps) {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val df = graft.operators.Graph.pageRank(spark, dir, iters = 5,
          checkpointEvery = every)
        hash = df.selectExpr("sum(id * score)").head().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) best = sec
      }
      (best, hash)
    }

    run(1) // JVM/JIT + parquet-footer warmup, discarded
    val variants = Seq(1, 2, 5) // 5 = only the final pass checkpoints
    val results = variants.map(e => (e, run(e)))
    val h0 = results.head._2._2
    results.foreach { case (e, (sec, h)) =>
      println(f"checkpointEvery=$e%d best-of-$reps%d ${sec}%.3f s " +
        s"hash=$h ${if (h == h0) "OK" else "MISMATCH"}")
    }
    spark.stop()
  }
}
