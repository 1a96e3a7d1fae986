package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (Test scope, not shipped): decompose the C4-family cost —
  * does ngramTopK's mirror re-run candidate generation, and how much of
  * ngramJaccard is sub-threshold pair materialization? Run:
  * sbt "Test/runMain graft.NgramProbe"
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    // count on the OPTIMIZED LOGICAL plan: the executed plan is an
    // unexpanded AdaptiveSparkPlan wrapper before the first action, which
    // silently counted 0 here — and the node PRINTS as "MapGroups"
    // (Dataset.flatMapGroups lowers to logical MapGroups / MapGroupsExec)
    val topkPlan = Dedup.ngramTopK(spark, dir).queryExecution.optimizedPlan.toString
    println("[probe] topk MapGroups in plan: " +
      "MapGroups".r.findAllIn(topkPlan).size)

    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "5").toInt
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s best=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // SPARK_GRAFT_SALT=s overrides the adaptive band count (A/B the
    // payload-vs-parallelism trade after the int-gram halving)
    val salt = sys.env.get("SPARK_GRAFT_SALT").filter(_.nonEmpty).map(_.toInt)
    // SPARK_GRAFT_T: threshold override — t≈0.99 collapses the walk's
    // per-pair cost to ~one step (early exit at the first mismatch), so
    // (t=0.35) − (t=0.99) isolates the pair-verify phase from the
    // scan/shuffle/group infrastructure.
    val t = sys.env.getOrElse("SPARK_GRAFT_T", "0.35").toDouble
    time("ngram_jaccard")(Dedup.ngramJaccard(spark, dir, threshold = t,
      saltOverride = salt))
    time("ngram_jaccard_walk")(Dedup.ngramJaccard(spark, dir, threshold = t,
      saltOverride = salt, maxBitsetUniverse = 0))
    time("ngram_topk")(Dedup.ngramTopK(spark, dir))
    spark.stop()
  }
}
