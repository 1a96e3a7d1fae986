package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch state: `counters` holds at most k
  * tracked items with their (under-)estimates, `n` the total stream length
  * seen. Estimates are within [true − n/(k+1), true], and every item with
  * true frequency > n/(k+1) is guaranteed present — under arbitrary
  * partitioning and merge order (mergeable-summaries property, Agarwal et
  * al. PODS'12), which is exactly what a distributed partial aggregate
  * needs.
  */
case class MGSketch(counters: Map[String, Long], n: Long)

/** Misra–Gries as a typed [[Aggregator]] — the Dataset-native custom
  * aggregation path (TypedColumn over ObjectHashAggregate): per-partition
  * buffers update as plain JVM objects and serialize only at the partial/
  * final boundary, so a single pass over any token stream yields the
  * candidate set. The k-counter bound makes the shuffle payload O(k) per
  * partition regardless of vocabulary size — the property that lets a
  * heavy-hitters query run over a 100 TB corpus whose exact word histogram
  * would itself be huge.
  */
class MisraGriesAgg(k: Int) extends Aggregator[String, MGSketch, MGSketch] {

  override def zero: MGSketch = MGSketch(Map.empty, 0L)

  override def reduce(b: MGSketch, x: String): MGSketch = {
    val c = b.counters
    if (c.contains(x)) MGSketch(c.updated(x, c(x) + 1L), b.n + 1)
    else if (c.size < k) MGSketch(c.updated(x, 1L), b.n + 1)
    else {
      // classic MG step: no free counter -> decrement all, drop zeros
      val dec = c.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      MGSketch(dec, b.n + 1)
    }
  }

  override def merge(a: MGSketch, b: MGSketch): MGSketch = {
    val sum = (a.counters.keySet ++ b.counters.keySet).iterator
      .map(w => w -> (a.counters.getOrElse(w, 0L) + b.counters.getOrElse(w, 0L)))
      .toMap
    val trimmed =
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything (the merge
        // analogue of the decrement step); at most k survive
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    MGSketch(trimmed, a.n + b.n)
  }

  override def finish(r: MGSketch): MGSketch = r
  override def bufferEncoder: Encoder[MGSketch] = Encoders.product[MGSketch]
  override def outputEncoder: Encoder[MGSketch] = Encoders.product[MGSketch]
}
