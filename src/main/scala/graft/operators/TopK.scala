package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed top-k per group with map-side partial reduction.
  *
  * NOTE: for the exact `row_number() <= k` filter pattern, Spark ≥3.5 plans
  * a `WindowGroupLimit` that already prunes map-side (pinned in PlanSpec) —
  * use the plain window form there. This operator is for the shapes the
  * optimizer's pattern-match misses: custom comparator logic, top-k feeding
  * a non-window consumer, or rank-free "keep k per group" semantics.
  *
  * Without such pruning, a per-group ranking
  * shuffles EVERY row to its group's reducer. Here each input partition
  * first keeps at most k rows per group (bounded heaps, one narrow pass), so
  * the shuffle carries ≤ k × groups × partitions rows — at 100 TB with
  * thousands of rows per group this cuts shuffle volume by rows/k, the same
  * trick as Pangool's combiner-side PriorityQueue in TopNHashTags
  * (reference: examples/.../TopNHashTags.java), but expressed as a partial
  * physical reduction feeding a normal Catalyst window for the final rank.
  *
  * `orderCols` must be a TOTAL order (include a tiebreak column) — partial
  * pruning at the k-boundary is only correct under a total order.
  */
object TopK {

  /** @param orderCols (column name, ascending?) — evaluated in sequence. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val oIdx = orderCols.map { case (c, asc) => (schema.fieldIndex(c), asc) }

    // total order on the sort key tuple; heap keeps the WORST at the top.
    // Nulls sort like Spark's defaults (asc → nulls first, desc → nulls
    // last): treat null as the minimum before applying the direction, which
    // yields exactly those two placements — so the partial pruning agrees
    // with the final window's ordering on nullable sort keys.
    val rowOrd: Ordering[Row] = (x: Row, y: Row) => {
      var i = 0; var cmp = 0
      while (cmp == 0 && i < oIdx.length) {
        val (idx, asc) = oIdx(i)
        val a = x.getAs[Any](idx); val b = y.getAs[Any](idx)
        val c =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else a.asInstanceOf[Comparable[Any]].compareTo(b)
        cmp = if (asc) c else -c
        i += 1
      }
      cmp
    }

    val partial = df.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Seq[Any], mutable.PriorityQueue[Row]]
      it.foreach { row =>
        val key = gIdx.map(row.getAs[Any](_))
        val h = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty[Row](rowOrd))
        if (h.size < k) h.enqueue(row)
        else if (rowOrd.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))

    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)
    partial.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** E13 — guaranteed heavy hitters by sketch-then-verify: a single
    * [[graft.functions.MisraGriesAgg]] pass yields ≤ k candidates (O(k)
    * shuffle bytes per partition — the whole point: the exact word
    * histogram of a 100 TB corpus is itself huge, the sketch is not),
    * then ONE exact counting pass restricted to the broadcast candidate
    * set keeps words whose TRUE count exceeds n/(k+1). MG guarantees
    * every such word is a candidate under any partitioning/merge order,
    * so the composed output is EXACT and deterministic even though the
    * sketch's internal state is merge-order-dependent — which is what
    * makes it oracle-checkable (oracle: plain GROUP BY ... HAVING
    * count > n div (k+1)). The candidate collect is model-sized (≤ k
    * rows), same footing as the ANN codebooks.
    */
  def heavyHitters(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 40): DataFrame = {
    import spark.implicits._
    def tok = graft.io.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
    val sketch = tok.as[String]
      .select(new graft.functions.MisraGriesAgg(k).toColumn.name("s"))
      .head()
    val thresh = sketch.n / (k + 1)
    val cands = sketch.counters.keys.toSeq.sorted
    tok.where(col("word").isin(cands: _*))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > thresh)
  }
}
