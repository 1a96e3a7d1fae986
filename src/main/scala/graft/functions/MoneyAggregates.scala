package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact integer money sum on the codegen'd long fast path — an int128
  * accumulator expressed as declarative long arithmetic.
  *
  * `sum(decimal)` is exact and order-independent but pays twice at scale:
  * the per-row update leaves the vectorized path, and a decimal agg-buffer
  * field disqualifies HashAggregate's first-level fast hash map entirely
  * (it requires all-primitive buffers) — measured 3× the plain-long-sum
  * cost at sf0.1 (0.56 vs 0.19 s for the supplier-keyed revenue
  * aggregate; r12 q_join_broadcast adjudication). The naive fix — sum
  * cents as one BIGINT — wraps silently at ~9.2e18 units per group,
  * real at 100 TB fact-table group sizes.
  *
  * This aggregate is the 128-bit middle: the group sum lives in two longs
  * (`hi`·2⁶⁴ + unsigned `lo`) plus a non-null count, so every buffer
  * field is primitive (fast hash map stays on) and every update/merge is
  * a handful of long ops in whole-stage codegen:
  *
  *  - update: `lo += v` (wrapping), `hi += (v >> 63) + carry` — the
  *    sign-extended 128-bit add; carry via the unsigned compare
  *    `(lo' ^ MIN) < (lo ^ MIN)`.
  *  - merge: the same 128-bit add of two accumulators.
  *  - evaluate: `hi`·2⁶⁴ + unsigned(`lo`) reassembled exactly into
  *    decimal(38,0), null iff no non-null input (SQL sum semantics).
  *
  * Exactness: integer two's-complement arithmetic — associative,
  * commutative, order-independent; int128 range (±1.7e38 units) exceeds
  * the decimal(38,0) output domain, so the accumulator itself can never
  * wrap first; a sum past 1e38 units nulls in the final decimal
  * reassembly exactly like `sum(decimal(38,0))` would.
  */
case class SumCentsExact(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private val dec = DecimalType(38, 0)

  override def dataType: DataType = dec
  override def nullable: Boolean = true
  override def prettyName: String = "sum_cents_exact"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG (integer money units) child, got ${child.dataType}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  private val minL = Literal(Long.MinValue)

  /** unsigned(a) < unsigned(b) via the sign-flip trick. */
  private def unsignedLess(a: Expression, b: Expression): Expression =
    LessThan(BitwiseXor(a, minL), BitwiseXor(b, minL))

  /** Wrapping long add: the 2^64-digit arithmetic is intentional, so the
    * mode is pinned LEGACY — a 2-arg Add would capture the SESSION mode,
    * and Spark 4's ANSI default turns the wrap into a throw.
    */
  private def addW(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** 128-bit add of (hi1, lo1) + (hi2, lo2): new lo wraps, carry feeds hi. */
  private def add128(hi1: Expression, lo1: Expression,
      hi2: Expression, lo2: Expression): Seq[Expression] = {
    val newLo = addW(lo1, lo2)
    val carry = If(unsignedLess(newLo, lo1), Literal(1L), Literal(0L))
    Seq(addW(addW(hi1, hi2), carry), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val v = Coalesce(Seq(child, Literal(0L)))
    // sign-extend v to 128 bits: its hi digit is v >> 63 (0 or -1)
    add128(hi, lo, ShiftRight(v, Literal(63)), v) :+
      addW(cnt, If(IsNull(child), Literal(0L), Literal(1L)))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    add128(hi.left, lo.left, hi.right, lo.right) :+ addW(cnt.left, cnt.right)

  override lazy val evaluateExpression: Expression = {
    val two64 = Literal(Decimal(BigDecimal("18446744073709551616")), dec)
    val unsignedLo = If(LessThan(lo, Literal(0L)),
      Add(Cast(lo, dec), two64, EvalMode.LEGACY), Cast(lo, dec))
    If(EqualTo(cnt, Literal(0L)),
      Literal.create(null, dec),
      Add(Multiply(Cast(hi, dec), two64, EvalMode.LEGACY), unsignedLo, EvalMode.LEGACY))
  }

  override protected def withNewChildInternal(newChild: Expression): SumCentsExact =
    copy(child = newChild)
}
