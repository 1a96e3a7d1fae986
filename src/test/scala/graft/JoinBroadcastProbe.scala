package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (Test scope, not shipped): decompose q_join_broadcast's
  * 0.8 s at sf0.1 into scan / agg / join components. Run:
  * sbt "Test/runMain graft.JoinBroadcastProbe"
  */
object JoinBroadcastProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.Tables
    import graft.operators.ExactMoney

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s best=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("scan3cols")(Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount")))
    time("scan+revenueAgg")(Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(ExactMoney.sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue")))
    time("scan+plainSumAgg")(Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice")).as("s")))
    time("join+countOnly")(Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_items")))
    time("full q_join_broadcast")(SparkEntry.queries("q_join_broadcast")(spark, dir))
    spark.stop()
  }
}
