package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for the r10d AnnIndex persistence: cold build+search vs
  * open-saved-index+search, per layout. Quantifies the cross-session
  * payoff of `AnnIndex.save/load` — the serving job should pay only the
  * model-table reads and the candidate join, never the corpus
  * normalization / codebook construction / bucket build.
  *
  * Run: sbt "Test/runMain graft.AnnPersistAB /root/repo/testdata/sf1 3"
  * Results recorded in PLANS.md (round 10d).
  */
object AnnPersistAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata/sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("ann-persist-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Ann, AnnIndex}

    val queries = Ann.normed(spark, dir).where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
      .localCheckpoint()

    for (method <- Seq("lsh", "ivf", "pq", "ivfpq")) {
      val iters = if (method == "ivf" || method == "pq") 0 else 2
      def bestOf(label: String)(body: => Long): Unit = {
        var best = Double.MaxValue
        var chk = 0L
        for (_ <- 1 to reps) {
          val t0 = System.nanoTime()
          chk = body
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"$method%-6s $label%-14s best-of-$reps $best%6.2f s checksum=$chk")
      }
      // A: cold build + first search (what every session pays without save)
      bestOf("build+search") {
        AnnIndex.build(spark, dir, method, iters = iters)
          .search(queries, 5).agg(sum(col("neighbor_id"))).first().getLong(0)
      }
      val saved = java.nio.file.Files.createTempDirectory(s"annab-$method").toString
      AnnIndex.save(AnnIndex.build(spark, dir, method, iters = iters), saved)
      // B: open the saved index + same search (the serving-session cost)
      bestOf("load+search") {
        AnnIndex.load(spark, saved)
          .search(queries, 5).agg(sum(col("neighbor_id"))).first().getLong(0)
      }
    }
    spark.stop()
  }
}
