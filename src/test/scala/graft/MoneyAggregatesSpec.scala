package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.SumCentsExact
import graft.operators.ExactMoney

/** The int128 money accumulator must be value-identical to sum(decimal)
  * in every regime: plain values, negatives, nulls, multi-long-carry
  * magnitudes, and any partitioning (merge order).
  */
class MoneyAggregatesSpec extends GraftSuite {

  private def sumCents(c: Column): Column =
    ColumnBridge.column(SumCentsExact(ColumnBridge.expression(c)).toAggregateExpression())

  private def viaDecimal(vs: Seq[java.lang.Long]): Option[BigDecimal] = {
    val nn = vs.filter(_ != null).map(v => BigDecimal(v.longValue))
    if (nn.isEmpty) None else Some(nn.sum)
  }

  private def check(vs: Seq[java.lang.Long], parts: Int): Unit = {
    import spark.implicits._
    val got = vs.toDF("v").repartition(parts)
      .agg(sumCents(col("v")).as("s")).head()
    val want = viaDecimal(vs)
    if (want.isEmpty) assert(got.isNullAt(0), s"expected null, got ${got.get(0)}")
    else assert(BigDecimal(got.getDecimal(0)) == want.get,
      s"parts=$parts: got ${got.get(0)}, want ${want.get}")
  }

  test("matches exact decimal sum for plain, negative, and null-mixed input") {
    for (parts <- Seq(1, 3, 7)) {
      check(Seq[java.lang.Long](1L, 2L, 3L), parts)
      check(Seq[java.lang.Long](10L, -3L, -20L, 13L), parts) // exactly zero
      check(Seq[java.lang.Long](null, 5L, null, -7L), parts)
      check(Seq[java.lang.Long](null, null), parts) // all-null → NULL
      check(Seq.fill(1000)(java.lang.Long.valueOf(999999999L)), parts)
    }
  }

  test("carries across the 2^64 digit boundary in update and merge") {
    val big = Long.MaxValue / 2 + 17 // two of these overflow a single long
    for (parts <- Seq(1, 2, 5)) {
      check(Seq[java.lang.Long](big, big, big, big, -3L), parts)
      check(Seq[java.lang.Long](-big, -big, -big, 11L), parts)
      // alternating signs walking lo across zero repeatedly
      check((1 to 50).map(i => java.lang.Long.valueOf(
        if (i % 2 == 0) big else -big + i)), parts)
    }
  }

  test("group null semantics: groups with only-null input sum to NULL") {
    import spark.implicits._
    val df = Seq(("a", java.lang.Long.valueOf(5L)), ("a", null),
      ("b", null), ("b", null)).toDF("k", "v")
    val m = df.groupBy("k").agg(sumCents(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
    assert(m("a").map(BigDecimal(_)) == Some(BigDecimal(5)))
    assert(m("b").isEmpty)
  }

  test("sum2/sumRevenue reproduce the pre-r12 decimal formulations bit-for-bit") {
    import spark.implicits._
    // 2dp business doubles incl. negatives and cent-boundary sums
    val money = Seq(0.01, 123.40, -999.99, 5017.28, 0.70, -0.01, 88888.88)
    val m = money.toDF("c").repartition(3)
      .agg(ExactMoney.sum2(col("c")).as("s")).head().getDouble(0)
    val mOld = money.toDF("c")
      .agg(sum(col("c").cast("decimal(12,2)")).cast("decimal(18,2)")
        .cast("double").as("s")).head().getDouble(0)
    assert(m == mOld)
    val pd = Seq((901.00, 0.04), (123.45, 0.07), (55555.55, 0.00), (0.03, 0.10))
    val r = pd.toDF("p", "d").repartition(2)
      .agg(ExactMoney.sumRevenue(col("p"), col("d")).as("s")).head().getDouble(0)
    val rOld = pd.toDF("p", "d")
      .agg(sum(col("p").cast("decimal(12,2)") *
          (lit(1).cast("decimal(4,2)") - col("d").cast("decimal(4,2)")))
        .cast("decimal(18,2)").cast("double").as("s")).head().getDouble(0)
    assert(r == rOld)
  }

  test("the agg buffer is all-primitive (fast hash map eligible) and codegen survives") {
    assert(SumCentsExact(ColumnBridge.expression(lit(1L)))
      .aggBufferAttributes.forall(_.dataType.isInstanceOf[org.apache.spark.sql.types.LongType.type]))
    // smoke: a grouped plan with the aggregate stays in WholeStageCodegen
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, i.toLong)).toDF("k", "v")
      .groupBy("k").agg(sumCents(col("v")).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // AQE prints codegen'd nodes as "*(n) HashAggregate" in the final plan
    assert(raw"\*\(\d+\) HashAggregate".r.findFirstIn(plan).isDefined, plan)
  }
}
