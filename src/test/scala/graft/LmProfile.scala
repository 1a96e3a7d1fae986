package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profile for q_lm_score at a given SF (r10). */
object LmProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata/sf10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("lm-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextHash.tokens

    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    val occ = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

    t("occurrences count")(occ.count())
    t("model agg (w1,w2)")(occ.groupBy("w1", "w2").count().count())
    t("tf agg (doc,w1,w2)")(occ.groupBy("doc_id", "w1", "w2").count().count())
    t("full lmScore")(graft.operators.TextAnalysis.lmScore(spark, dir).count())
    spark.stop()
  }
}
