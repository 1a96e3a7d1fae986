package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Packed-bitset column ops — the Spark-column equivalent of the
  * reference's compact BitField (reference: io/BitField.java:46
  * set/isSet/cardinality over a byte-packed bitset; used there as the
  * tuple null-mask and as a compact set-of-small-ints field type).
  *
  * Layout: array<long> of ⌈nbits/64⌉ words, bit i at word i/64, position
  * i%64 — 64× denser than an array<int> of positions once sets are dense,
  * and comparable/joinable as a value. test/rank/cardinality compose from
  * codegen builtins (bit_count, dynamic shifts); only the packer needs a
  * custom expression.
  */
object BitFieldOps {

  /** Build a bitset from an array of bit positions; positions outside
    * [0, nbits) throw (same contract as BitField.set on a negative bit).
    */
  def fromPositions(positions: Column, nbits: Int): Column =
    ColumnBridge.column(BitFieldFromPositions(ColumnBridge.expression(positions), nbits))

  /** Is bit i set? ((bits[i/64] >> (i%64)) & 1) == 1, dynamic-shift form. */
  def test(bits: Column, i: Column): Column =
    (call_function("shiftright",
      element_at(bits, (i / 64).cast("int") + 1), (i % 64).cast("int"))
      .bitwiseAND(lit(1L))) === 1L

  /** Number of set bits. */
  def cardinality(bits: Column): Column =
    aggregate(bits, lit(0L), (acc, w) => acc + bit_count(w).cast("long"))

  /** Set bits at positions ≤ i: full words below i/64 plus the masked
    * partial word. Mask of the low (i%64)+1 bits is −1 >>> (63 − i%64) —
    * branch-free and ANSI-safe (a (1<<(b+1))−1 form overflows at b=62 and
    * wraps at b=63).
    */
  def rank(bits: Column, i: Column): Column = {
    val word = (i / 64).cast("int")
    val bit = (i % 64).cast("int")
    val fullWords = aggregate(slice(bits, lit(1), word), lit(0L),
      (acc, w) => acc + bit_count(w).cast("long"))
    val partial = element_at(bits, word + 1)
    val mask = call_function("shiftrightunsigned", lit(-1L), lit(63) - bit)
    fullWords + bit_count(partial.bitwiseAND(mask)).cast("long")
  }
}

/** array<positions> → packed array<long> bitset of fixed width `nbits`.
  * CodegenFallback: a short per-row loop over set positions; boxing noise.
  */
case class BitFieldFromPositions(child: org.apache.spark.sql.catalyst.expressions.Expression,
    nbits: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(nbits > 0, "nbits must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)

  override protected def nullSafeEval(v: Any): Any = {
    val pos = v.asInstanceOf[ArrayData]
    val words = new Array[Long]((nbits + 63) / 64)
    var i = 0
    while (i < pos.numElements()) {
      val p = child.dataType.asInstanceOf[ArrayType].elementType match {
        case LongType => pos.getLong(i)
        case IntegerType => pos.getInt(i).toLong
        case other => throw new IllegalArgumentException(s"positions of $other")
      }
      if (p < 0 || p >= nbits)
        throw new IndexOutOfBoundsException(s"bit $p outside [0, $nbits)")
      words((p / 64).toInt) |= (1L << (p % 64).toInt)
      i += 1
    }
    new GenericArrayData(words)
  }
}
