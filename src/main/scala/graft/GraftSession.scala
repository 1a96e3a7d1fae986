package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for graft workloads.
  *
  * Cluster guidance (100 TB): set `spark.sql.shuffle.partitions` ≈ 2-3× the
  * total executor cores (AQE coalesces down); keep
  * `spark.sql.files.maxPartitionBytes` at 128-256 MB so scan tasks fit in
  * memory; leave AQE + skew-join on — every graft operator is declarative,
  * so runtime re-planning applies everywhere.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
}
