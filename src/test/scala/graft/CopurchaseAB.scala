package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B for the r15 E21 pair-generation choice: the in-row
  * higher-order-function comprehension (flatten∘transform — HOFs evaluate
  * interpreted per row) vs a two-step posexplode+slice (two Generate nodes,
  * codegen-friendly, but materializes the basket array once per element).
  * Also times the basket aggregation alone to locate the cost.
  *
  * Run: sbt "Test/runMain graft.CopurchaseAB /root/testdata/sf0.1 3"
  * Results recorded in PLANS.md (round 15).
  */
object CopurchaseAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("copurchase-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def baskets: DataFrame = graft.io.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .where(size(col("ps")).between(2, 1024))

    def finish(pairs: DataFrame): DataFrame = pairs
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(50)

    def time(label: String)(body: => Long): Unit = {
      var best = Double.MaxValue
      var chk = 0L
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        chk = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-28s best-of-$reps $best%6.2f s  (chk=$chk)")
    }

    time("baskets only") {
      baskets.agg(sum(size(col("ps")))).first().getLong(0)
    }
    time("A: HOF comprehension") {
      finish(baskets.select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"))
        .as("pr")).select(col("pr.p1").as("p1"), col("pr.p2").as("p2")))
        .agg(sum(col("p1") + col("p2") + col("n_orders"))).first().getLong(0)
    }
    time("B: posexplode twice") {
      finish(baskets
        .select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
        .select(col("p1"), explode(expr("slice(ps, i + 2, size(ps))")).as("p2")))
        .agg(sum(col("p1") + col("p2") + col("n_orders"))).first().getLong(0)
    }
    spark.stop()
  }
}
