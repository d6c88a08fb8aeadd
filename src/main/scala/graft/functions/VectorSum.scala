package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise sum of long-array rows — the generic mergeable-vector
  * aggregate. One primitive serves every "store a counter vector at
  * fine grain, roll it up later" shape: count-min counter matrices
  * ([[CmsSketch]] emits `array<long>` state whose merge IS elementwise
  * sum), fixed-bin histograms (a histogram is the vector sum of one-hot
  * bin vectors), and integer centroid accumulators. Sum is associative
  * and commutative, so any rollup path lands on the same vector as a
  * direct build — the algebraic property the q137/q143 oracles pin.
  *
  * Scale: constant 8·len state per group with full map-side combine;
  * the shuffle carries one vector per group, never the rows. Length is
  * taken from the first non-null input and enforced on every
  * subsequent row — silently zip-truncating mismatched sketches would
  * corrupt the rollup.
  */
case class VectorSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def add(buffer: Array[Long], len: Int, at: Int => Long): Array[Long] =
    if (buffer.isEmpty) Array.tabulate(len)(at)
    else {
      require(buffer.length == len,
        s"vector_sum length mismatch: ${buffer.length} vs $len")
      var i = 0
      while (i < len) { buffer(i) += at(i); i += 1 }
      buffer
    }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      add(buffer, arr.numElements(), arr.getLong)
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buffer else add(buffer, other.length, other)

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorSum =
    copy(child = c)
}

object VectorSum {
  /** Elementwise sum of an `array<long>` column (null rows skipped,
    * all-null group → null).
    */
  def vectorSum(vec: Column): Column =
    columnOf(VectorSum(expressionOf(vec)).toAggregateExpression())
}
