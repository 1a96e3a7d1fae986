package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the 100 TB middle ground between broadcast
  * joins (dim must fit in executor memory as a hash TABLE) and plain
  * shuffled joins (every fact row pays the shuffle): the dim KEY SET is
  * folded into a ~bits-per-key Bloom filter (distributed treeAggregate
  * build, bounded driver artifact like the ANN codebooks), shipped in the
  * fact-side filter, and non-matching fact rows drop BEFORE the exchange.
  * False positives only cost wasted shuffle bytes — the exact join after
  * the filter keeps the result row-identical.
  *
  * Spark's AQE can inject the same shape automatically
  * (`runtime.bloomFilter`) when stats prove it beneficial; this operator is
  * the explicit form for pipelines that know their selectivity up front.
  */
object BloomJoin {

  /** Membership test on the serialized filter: CodegenFallback one-call
    * expression (the md5-style justification: the bloom probe dominates).
    */
  case class BloomMightContain(child: Expression, bf: BloomFilter)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = BooleanType
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    // Mirror BloomFilter.putLong/putString's supported key types so misuse
    // fails at analysis, not per-row at runtime.
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires an integral or string key, got ${other.catalogString}")
    }
    override protected def nullSafeEval(v: Any): Any = v match {
      case b: Byte   => bf.mightContainLong(b.toLong)
      case s: Short  => bf.mightContainLong(s.toLong)
      case i: Int    => bf.mightContainLong(i.toLong)
      case l: Long   => bf.mightContainLong(l)
      case s: UTF8String => bf.mightContainString(s.toString)
    }
  }

  def mightContain(c: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bf))

  /** Build a Bloom filter of the dim side's (long) join keys. An EMPTY dim
    * yields an empty filter (everything prunes — the join result is empty,
    * which is exactly the plain join's answer); `stat.bloomFilter` itself
    * NPEs on zero rows.
    */
  def keyFilter(dim: DataFrame, key: String, fpp: Double = 0.01): BloomFilter = {
    val n = dim.select(key).distinct().count()
    if (n == 0L) BloomFilter.create(1, fpp)
    else dim.stat.bloomFilter(key, n, fpp)
  }

  /** Inner equi-join with the fact side bloom-pruned pre-shuffle.
    * Row-identical to `fact.join(dim, key)` (false positives are removed
    * by the exact join); the fact shuffle carries only rows whose key
    * might be in the dim.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    val bf = keyFilter(dim, key, fpp)
    fact.where(mightContain(col(key), bf)).join(dim, key)
  }

  /** E11 as a driver query — lineitem revenue lines for the supplier
    * slice with s_acctbal > 6000 (the highest bar that stays non-empty at
    * the sf0.001 spec rung; ~30% selective at driver SFs — the pruning
    * REGIME the operator targets is much lower selectivity, proven by the
    * dedicated pruning-rate spec): matching fact rows drop BEFORE the join
    * exchange for a filter that costs bits-per-key, not a hash table. The oracle is the
    * plain join (the prune is lossless by construction), so this also
    * oracle-proves the row-identity contract. Quantity sum is exact (small
    * integral doubles), rounded 2dp like the TPC-H money outputs.
    */
  def supplierLines(spark: org.apache.spark.sql.SparkSession, dir: String,
      minAcctbal: Double = 6000.0): DataFrame = {
    val dim = graft.io.Tables.supplier(spark, dir)
      .where(col("s_acctbal") > minAcctbal)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    prunedJoin(
      graft.io.Tables.lineitem(spark, dir).select(col("l_suppkey"), col("l_quantity")),
      dim, "l_suppkey")
      .groupBy(col("s_name"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_lines"))
  }
}
