package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Conway's Game of Life as an iterative DataFrame job
  * (reference: examples/.../GameOfLife.java — Pangool ran it as chained
  * map-only jobs).
  *
  * One generation = one shuffle: explode each live cell to its 8 neighbor
  * contributions, groupBy cell, apply the B3/S23 rule against the live set
  * (left join). Iterating N generations chains N such plans; for long runs
  * checkpoint every few steps to cut lineage.
  */
object GameOfLife {

  private val offsets = for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 } yield (dx, dy)

  /** One generation over a DataFrame of live cells (x: long, y: long). */
  def step(live: DataFrame): DataFrame = {
    val contrib = live.select(
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("x") + dx).as("x"), (col("y") + dy).as("y"))
      }: _*)).as("c"))
      .select(col("c.x"), col("c.y"))
    val counts = contrib.groupBy("x", "y").agg(count(lit(1)).as("n"))
    counts.join(live.withColumn("alive", lit(true)), Seq("x", "y"), "left")
      .where(col("n") === 3 || (col("n") === 2 && col("alive")))
      .select("x", "y")
  }

  def run(spark: SparkSession, initial: Seq[(Long, Long)], generations: Int): DataFrame = {
    import spark.implicits._
    var live = initial.toDF("x", "y")
    for (i <- 1 to generations) {
      live = step(live)
      if (i % 8 == 0) live = live.localCheckpoint(eager = true) // cut lineage
    }
    live
  }
}
