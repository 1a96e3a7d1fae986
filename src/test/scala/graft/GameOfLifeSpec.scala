package graft

import graft.operators.GameOfLife

class GameOfLifeSpec extends GraftSuite {

  test("blinker oscillates with period 2") {
    import spark.implicits._
    val blinker = Seq((0L, -1L), (0L, 0L), (0L, 1L))
    val g1 = GameOfLife.run(spark, blinker, 1).as[(Long, Long)].collect().toSet
    assert(g1 == Set((-1L, 0L), (0L, 0L), (1L, 0L)))
    val g2 = GameOfLife.run(spark, blinker, 2).as[(Long, Long)].collect().toSet
    assert(g2 == blinker.toSet)
  }

  test("step: one generation applies B3/S23 directly") {
    import spark.implicits._
    // blinker: survivor (0,0) has 2 neighbors; births at (-1,0),(1,0) have 3
    val live = Seq((0L, -1L), (0L, 0L), (0L, 1L)).toDF("x", "y")
    val next = GameOfLife.step(live).as[(Long, Long)].collect().toSet
    assert(next == Set((-1L, 0L), (0L, 0L), (1L, 0L)))
  }

  test("block is a still life") {
    import spark.implicits._
    val block = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
    val g = GameOfLife.run(spark, block, 3).as[(Long, Long)].collect().toSet
    assert(g == block.toSet)
  }
}
