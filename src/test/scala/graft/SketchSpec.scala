package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{MGSketch, MisraGriesAgg}
import graft.operators.TopK

/** Misra–Gries guarantees, exercised on SKEWED synthetic streams (the
  * driver corpus is near-uniform, so the sketch's selectivity only shows
  * on Zipf data): every item with true frequency > n/(k+1) must survive
  * any partitioning, and estimates sit within [true − n/(k+1), true].
  */
class SketchSpec extends GraftSuite {

  private def zipfStream(n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    // ~Zipf over 100 items: item i drawn proportionally to 1/(i+1)
    val weights = (0 until 100).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cdf = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      s"w${cdf.indexWhere(u <= _)}"
    }
  }

  private def runSketch(items: Seq[String], k: Int, parts: Int): MGSketch = {
    import spark.implicits._
    items.toDS().repartition(parts)
      .select(new MisraGriesAgg(k).toColumn.name("s")).head()
  }

  test("MG keeps every true heavy hitter under any partitioning") {
    val items = zipfStream(20000, seed = 7)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(8, 16); parts <- Seq(1, 4, 13)) {
      val sk = runSketch(items, k, parts)
      assert(sk.n == items.size)
      assert(sk.counters.size <= k, s"k=$k parts=$parts: state must stay bounded")
      val thresh = sk.n / (k + 1)
      val mustKeep = exact.filter(_._2 > thresh).keySet
      assert(mustKeep.subsetOf(sk.counters.keySet),
        s"k=$k parts=$parts: lost ${mustKeep -- sk.counters.keySet}")
      // estimates never exceed truth and undercount by at most n/(k+1)
      sk.counters.foreach { case (w, est) =>
        val tru = exact.getOrElse(w, 0L)
        assert(est <= tru && est >= tru - thresh,
          s"k=$k parts=$parts: $w est=$est true=$tru")
      }
    }
  }

  test("sketch-then-verify equals the exact HAVING query on the corpus") {
    import spark.implicits._
    val k = 40
    val got = TopK.heavyHitters(spark, sf, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tok = graft.io.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
    val n = tok.count()
    val want = tok.groupBy("word").count()
      .where(col("count") > n / (k + 1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "composition must be exact: MG candidates ⊇ qualifiers, verify filters the rest")
  }
}
