package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.BitFieldOps

class BitFieldSpec extends GraftSuite {

  private val rnd = new Random(7)

  test("fromPositions/test/cardinality/rank round-trip vs java.util.BitSet (20 trials)") {
    import spark.implicits._
    (1 to 20).foreach { _ =>
      val nbits = 128
      val pos = (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(nbits)).distinct.sorted
      val ref = new java.util.BitSet(nbits)
      pos.foreach(ref.set)
      val df = Seq(pos).toDF("pos")
        .select(BitFieldOps.fromPositions(col("pos"), nbits).as("bits"))
        .cache()
      // packed words match BitSet's long layout
      val words = df.select(col("bits")).head().getSeq[Long](0)
      val refWords = ref.toLongArray.padTo(nbits / 64, 0L)
      assert(words == refWords.toSeq, s"pos=$pos")
      // test() agrees bit-by-bit; rank(i) counts set bits ≤ i
      val probes = (0 until nbits by 7) ++ pos
      probes.foreach { i =>
        val r = df.select(
          BitFieldOps.test(col("bits"), lit(i)),
          BitFieldOps.rank(col("bits"), lit(i)),
          BitFieldOps.cardinality(col("bits"))).head()
        assert(r.getBoolean(0) == ref.get(i), s"test($i), pos=$pos")
        assert(r.getLong(1) == pos.count(_ <= i), s"rank($i), pos=$pos")
        assert(r.getLong(2) == pos.size.toLong, s"cardinality, pos=$pos")
      }
      df.unpersist()
    }
  }

  test("fromPositions rejects out-of-range bits like BitField.set") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Seq(128)).toDF("pos")
        .select(BitFieldOps.fromPositions(col("pos"), 128)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("topicFingerprintBits packs exactly the top-word vocabulary indexes") {
    import spark.implicits._
    val top = graft.operators.Relational.topicFingerprint(spark, sf)
    val vocab = top.select("word").distinct().as[String].collect().sorted
    val idx = vocab.zipWithIndex.toMap
    val want = top.select("source", "word").as[(String, String)].collect()
      .groupBy(_._1).map { case (s, ws) =>
        val bs = new java.util.BitSet(128)
        ws.foreach(w => bs.set(idx(w._2)))
        val arr = bs.toLongArray.padTo(2, 0L)
        s -> (arr(0), arr(1))
      }
    val got = graft.operators.Relational.topicFingerprintBits(spark, sf)
      .select("source", "bits_0", "bits_1").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want)
  }
}
