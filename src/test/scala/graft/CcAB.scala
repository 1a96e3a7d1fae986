package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for the r10 C13 fallback change: star contraction over the
  * full edge list + shortcut edges (the r9 shape) vs over the label-quotient
  * graph (shipped). The LSH pair list is materialized ONCE up front so the
  * timings isolate the CC loop itself, not the upstream pipeline.
  *
  * Run: sbt "Test/runMain graft.CcAB /root/repo/testdata/sf10 3"
  * Results recorded in PLANS.md (round 10).
  */
object CcAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata/sf10"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("cc-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Curation, Dedup}

    val edges = Dedup.minhashLsh(spark, dir, 0.5)
      .select(col("d1").as("u"), col("d2").as("v")).localCheckpoint()
    println(s"edges: ${edges.count()}")

    def time(label: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      var chk = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val r = body
        chk = r.agg(coalesce(sum(col("id") + col("label")), lit(0L)))
          .first().getLong(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-22s best-of-$reps $best%.2f s checksum=$chk")
    }

    // r9 shape: 4 propagate rounds, then star over full edges + shortcuts
    time("full+shortcut (r9)") {
      val labels = Curation.connectedComponentsPropagate(edges, "u", "v", maxIter = 4)
      val shortcut = labels.where(col("id") =!= col("label"))
        .select(col("id").as("u"), col("label").as("v"))
      Curation.connectedComponentsStar(edges.union(shortcut), "u", "v")
    }
    // shipped: hybrid with the quotient fallback
    time("quotient (r10)") {
      Curation.connectedComponents(edges, "u", "v")
    }
    // floor: star alone over the raw edges
    time("star only") {
      Curation.connectedComponentsStar(edges, "u", "v")
    }
    spark.stop()
  }
}
