package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ShiftLeft, ShiftRight}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom bitset: `m` bits packed into m/64 longs. Merge is the
  * elementwise OR — associative, commutative, idempotent — so the
  * filter is a proper partial aggregate: map-side combine absorbs the
  * dim keys locally and the shuffle carries one m/8-byte bitset per
  * group (16 KB at the default m = 2^17).
  */
final class BloomBits(val m: Int) extends Serializable {
  val words = new Array[Long](m / 64)
  def set(pos: Long): Unit =
    words((pos >> 6).toInt) |= 1L << (pos & 63)
}

/** Bloom filter as a native `TypedImperativeAggregate`.
  *
  * The child expression is the PRE-HASHED position array — probe j of
  * a value is the first 8 hex nibbles of md5(j ":" value) mod m,
  * computed by codegen'd built-ins ([[BloomSketch.bloomPositions]])
  * before the aggregate sees the row, like [[HllSketch]]/[[CmsSketch]].
  * Membership tests ([[BloomSketch.mightContain]]) are also pure
  * built-ins over the materialized long array: broadcast the one-row
  * sketch and probe scan-locally — no custom scalar expression, no
  * UDF, fully codegen'd.
  *
  * False-positive rate ≈ (1 − e^{−kn/m})^k; never a false negative,
  * which is what makes the bloom a sound PRE-filter: an exact join
  * behind it removes the false positives and the result is identical
  * to the plain join.
  */
case class BloomSketch(
    child: Expression,
    k: Int = 5,
    m: Int = 1 << 17,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBits] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): BloomBits = new BloomBits(m)

  override def update(buffer: BloomBits, input: InternalRow): BloomBits = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var j = 0
      while (j < k) { buffer.set(arr.getLong(j)); j += 1 }
    }
    buffer
  }

  override def merge(buffer: BloomBits, input: BloomBits): BloomBits = {
    var i = 0
    while (i < buffer.words.length) {
      buffer.words(i) |= input.words(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: BloomBits): Any = new GenericArrayData(buffer.words)

  override def serialize(buffer: BloomBits): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.words.length)
    bb.putInt(buffer.m)
    buffer.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBits = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BloomBits(bb.getInt())
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
}

object BloomSketch {

  private def shiftLeftC(a: Column, b: Column): Column =
    columnOf(ShiftLeft(expressionOf(a), expressionOf(b)))
  private def shiftRightC(a: Column, b: Column): Column =
    columnOf(ShiftRight(expressionOf(a), expressionOf(b)))

  /** Probe positions of `value`: Kirsch–Mitzenmacher double hashing,
    * position j = (h1 + j·h2) mod m with h1/h2 two seeded xxhash64
    * draws — 2 integer hashes per value instead of k md5-over-string
    * digests (the r16 hot-path fix: the probe runs per FACT row, and
    * md5 paid string-render + digest + hex-parse k times per row).
    * Pure codegen'd built-ins. The hash family is NOT part of any
    * oracle contract: the bloom is a pre-filter with no false
    * negatives for ANY hash choice, and the exact semi-join behind it
    * makes the result hash-independent (q92's oracle is the plain
    * semi-join). The SQL-surface bloom (`bloom_sketch` /
    * `bloom_might_contain`, engine-portable md5 buckets via
    * SketchExprs) is a separate, unchanged path.
    */
  def bloomPositions(value: Column, k: Int, m: Int): Column = {
    val h1 = pmod(xxhash64(lit(41), value), lit(m.toLong))
    // force h2 odd so the k probe positions never collapse onto one
    // position (m is a power of two: even h2 would halve the stride
    // space; odd h2 is coprime with m)
    val h2 = pmod(xxhash64(lit(97), value), lit(m.toLong)).bitwiseOR(lit(1L))
    transform(sequence(lit(0), lit(k - 1)), j =>
      pmod(h1 + j.cast("long") * h2, lit(m.toLong)))
  }

  /** The bloom bitset of `value` as an m/64-entry long array. */
  def bloomAgg(value: Column, k: Int = 5, m: Int = 1 << 17): Column =
    columnOf(BloomSketch(expressionOf(bloomPositions(value, k, m)), k, m)
      .toAggregateExpression())

  /** Membership probe against a materialized bitset: every one of the
    * k probe bits must be set. Pure built-ins (forall + element_at +
    * shift/mask) — scan-local against a broadcast one-row sketch.
    */
  def mightContain(bloomWords: Column, value: Column,
      k: Int = 5, m: Int = 1 << 17): Column =
    forall(bloomPositions(value, k, m), pos =>
      element_at(bloomWords, shiftRightC(pos, lit(6)).cast("int") + 1)
        .bitwiseAND(shiftLeftC(lit(1L), (pos % 64).cast("int"))) =!= lit(0L))
}
