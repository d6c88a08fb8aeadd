package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min counter matrix: `d` rows × `w` counters (Cormode &
  * Muthukrishnan 2005). Merge is elementwise sum — associative and
  * commutative — so the sketch is a proper partial aggregate:
  * map-side combine collapses values locally and the shuffle carries
  * one d·w counter file per group, never the values.
  */
final class CmsCounters(val d: Int, val w: Int) extends Serializable {
  val counts = new Array[Long](d * w)
}

/** Count-min sketch as a native `TypedImperativeAggregate`.
  *
  * The child expression is the PRE-HASHED bucket array — row i's
  * bucket is the first 6 hex nibbles of md5(i ":" value) mod `w`,
  * computed by codegen'd built-ins (see [[CmsSketch.cmsBuckets]])
  * before the aggregate sees the row, exactly like [[HllSketch]]
  * receives its md5 hex. The same bucket arithmetic is replayable in
  * plain SQL, so an external oracle can rebuild the counter matrix
  * bit-for-bit and land on identical estimates.
  *
  * Scale: constant 8·d·w bytes of state per group (32 KB at the
  * defaults) regardless of input size; estimates for any key are then
  * a pure projection over the materialized sketch
  * ([[CmsSketch.cmsEstimate]] — built-ins only, broadcast the one-row
  * sketch). Point-estimate error is the classic ε = e/w over-count
  * bound with probability 1 − e^−d; estimates never under-count.
  */
case class CmsSketch(
    child: Expression,
    d: Int = 4,
    w: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsCounters] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): CmsCounters = new CmsCounters(d, w)

  override def update(buffer: CmsCounters, input: InternalRow): CmsCounters = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < d) {
        buffer.counts(i * w + arr.getLong(i).toInt) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: CmsCounters, input: CmsCounters): CmsCounters = {
    var i = 0
    while (i < buffer.counts.length) {
      buffer.counts(i) += input.counts(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: CmsCounters): Any = new GenericArrayData(buffer.counts)

  override def serialize(buffer: CmsCounters): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buffer.counts.length)
    bb.putInt(buffer.d).putInt(buffer.w)
    buffer.counts.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsCounters = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CmsCounters(bb.getInt(), bb.getInt())
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

object CmsSketch {

  /** Row-i bucket of `value`: first 6 hex nibbles of
    * md5(i ":" value) mod `w` — codegen'd built-ins, engine-portable.
    */
  def cmsBucket(i: Column, value: Column, w: Int): Column =
    conv(substring(md5(concat(i.cast("string"), lit(":"), value.cast("string"))), 1, 6), 16, 10)
      .cast("long") % w

  private def cmsBuckets(value: Column, d: Int, w: Int): Column =
    transform(sequence(lit(0), lit(d - 1)), i => cmsBucket(i, value, w))

  /** The count-min sketch of `value` as a d·w long array. */
  def cmsSketch(value: Column, d: Int = 4, w: Int = 1024): Column =
    columnOf(CmsSketch(expressionOf(cmsBuckets(value, d, w)), d, w)
      .toAggregateExpression())

  /** Point frequency estimate of `key` from a materialized sketch:
    * min over the d rows of the counter at the key's bucket. Pure
    * built-in projection — broadcast the one-row sketch and estimate
    * any number of keys scan-locally.
    */
  def cmsEstimate(sketch: Column, key: Column, d: Int = 4, w: Int = 1024): Column =
    array_min(transform(sequence(lit(0), lit(d - 1)), i =>
      element_at(sketch, (i * w + cmsBucket(i, key, w) + 1).cast("int"))))
}
