package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only probe for the r15 q_bucketed_join sf10 investigation: times the
  * first (write-inclusive) and subsequent (read-path) calls separately and
  * prints the executed plan's exchange count.
  *
  * Run: sbt "Test/runMain graft.LayoutProbe testdata/sf10"
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "testdata/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("layout-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val df = graft.operators.Relational.bucketedJoin(spark, dir)
      val built = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val ran = (System.nanoTime() - t1) / 1e9
      val p = df.queryExecution.explainString(FormattedMode)
      val ex = p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))
      println(f"[probe] $label%-8s build=$built%7.2f s  run=$ran%7.2f s  exchanges=$ex")
      if (ex > 0) println(p.take(3000))
    }
    run("call-1")
    run("call-2")
    run("call-3")
    spark.stop()
  }
}
