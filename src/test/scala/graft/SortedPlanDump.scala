package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-dump helper for the PRE-checkpoint chain of composite queries whose
  * registered plan is a LogicalRDD behind a localCheckpoint boundary (the
  * declared q_training_batches plan is just the stamping pass — the
  * optimizable scan/join chain lives in [[graft.operators.Curation
  * .trainingBatchesSorted]]). Test scope, like the committed probe mains:
  * `sbt "Test/runMain graft.SortedPlanDump <sfDir> <outFile>"`.
  */
object SortedPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/sorted_plan.txt")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.writeString(Paths.get(out),
      graft.operators.Curation.trainingBatchesSorted(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
