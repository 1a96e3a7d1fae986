package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps formatted physical plans for the headline queries so
  * pushdown / broadcast / codegen properties can be reviewed and pinned.
  * `sbt "runMain graft.Plans [sfDir] [outFile]"`.
  */
object Plans {
  val Headline: Seq[String] = Seq(
    "q_agg_groupby", "q_join_broadcast", "q_join_reduce_side", "q_topn_per_group",
    "q_dedup_minhash", "q_ann_bruteforce", "q_grep",
    "q_cogroup_multi", "q_ann_ivfpq", "q_nb_classify", "q_topic_fp_bits",
    "q_dedup_containment", "q_triangles", "q_quality_filter",
    "q_bfs", "q_bloom_join")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    Headline.foreach { name =>
      sb.append(s"==== $name ====\n")
      sb.append(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
