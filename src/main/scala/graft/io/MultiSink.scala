package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Named multiple outputs (reference:
  * tuplemr/PangoolMultipleOutputs.java, NamedOutputsInterface.java).
  *
  * Pangool's reducer could route each tuple to a named output file. The
  * Spark-native equivalent is a single-pass partitioned write — one job, one
  * shuffle-free write, files split by the label column (scales to any label
  * cardinality the file system tolerates).
  */
object MultiSink {

  /** Single-pass named outputs: rows land under `base/<labelCol>=<value>/`. */
  def partitionByLabel(df: DataFrame, labelCol: String, base: String,
      format: String = "parquet"): Unit =
    df.write.mode("overwrite").format(format).partitionBy(labelCol).save(base)

  /** Heterogeneous formats per label (Pangool allowed a different output
    * format per named output): one filtered write per (label → format).
    * N label-filtered scans — use only when formats genuinely differ.
    */
  def byLabel(df: DataFrame, labelCol: String, base: String,
      formats: Map[String, String]): Unit =
    formats.foreach { case (label, fmt) =>
      df.where(col(labelCol) === label).write.mode("overwrite")
        .format(fmt).save(s"$base/$label")
    }
}
