package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Iterative graph analytics as checkpointed DataFrame passes — the
  * Spark-era successor of the reference's driver-looped MapReduce jobs
  * (examples/.../GameOfLife.java is the reference shape; see also
  * [[Curation.connectedComponents]]).
  */
object Graph {

  /** PageRank in EXACT integer arithmetic (scores scaled ×10⁶, floor
    * division everywhere): score' = 0.15·10⁶ + (85 · Σ score(u)/deg(u))/100
    * with `div`, so a fixed iteration count yields bit-identical scores on
    * any engine — no FP accumulation to diverge (same device as the
    * integer tf-idf).
    *
    * Graph: the customer↔supplier bipartite graph of the orders, made
    * symmetric so every node has out-degree ≥ 1 (no dangling-mass term).
    * Node ids: custkey·2 / suppkey·2+1.
    *
    * Scale shape: the edge list with its out-degree folded in,
    * `(u, v, deg)`, is built ONCE and localCheckpoint'd; each iteration is
    * exactly one join (scores on u — both sides hash-partitioned on u, and
    * AQE reuses the partitioning) + one aggregation by v, with per-pass
    * checkpoints so lineage stays O(1). That is the classic
    * pregel-as-dataflow layout: at 100 TB the edge table partitioning is
    * the stable asset every pass reuses.
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    val sym = cs.union(cs.select(col("v").as("u"), col("u").as("v")))
    // hash-partition AND sort by u BEFORE checkpointing: localCheckpoint
    // preserves outputPartitioning/outputOrdering, so every iteration's
    // join reuses the layout — only the (small) score side moves. Without
    // this the checkpointed edges have default (huge) stats and each pass
    // re-shuffles + re-sorts the full edge table (measured ~2× slower).
    // Out-degree folds in as a partition-only window riding that SAME
    // exchange — a separate groupBy+join costed an extra agg and broadcast
    // (measured 1.8→1.3 s at sf0.1 for the edge build).
    val edges = sym.repartition(col("u"))
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("u")))
      .sortWithinPartitions("u")
      .localCheckpoint()
    // init rides the checkpointed edges — re-deriving from deg would replay
    // the whole graph-construction join
    var scores = edges.select(col("u").as("id")).distinct()
      .withColumn("score", lit(1000000L))
    // Per-pass LAZY checkpoints: lineage is cut every pass (plans stay O(1)
    // for any iteration count) but nothing materializes until the single
    // final action — no per-iteration job barrier.
    for (i <- 1 to iters) {
      scores = edges.join(scores.withColumnRenamed("id", "u"), "u")
        .select(col("v"), expr("score div deg").as("c"))
        .groupBy(col("v").as("id"))
        .agg((lit(150000L) + expr("(85 * sum(c)) div 100")).as("score"))
        .select(col("id"), col("score"))
      if (i < iters) scores = scores.localCheckpoint(false)
    }
    scores
  }
}
