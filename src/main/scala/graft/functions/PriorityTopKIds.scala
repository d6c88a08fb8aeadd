package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded (priority, id) survivor set: keeps the k SMALLEST
  * (priority, id) pairs seen, lexicographically — a max-heap over the
  * survivors so the current worst is evicted in O(log k). With
  * hash-derived uniform priorities, the k smallest uniforms of a
  * stratum are an exact-k uniform sample of it — and "k smallest of a
  * union = k smallest of the union of per-partition k-smallest" makes
  * the merge exact, so partial (map-side) aggregation carries O(k)
  * state per stratum per task instead of the stratum's rows.
  */
final class PrioIdBuffer(val k: Int) extends Serializable {
  val prio = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // lexicographic (priority, id): heap property orders the WORST
  // survivor at the root
  private def gt(pa: Double, ia: Long, pb: Double, ib: Long): Boolean =
    pa > pb || (pa == pb && ia > ib)

  private def swap(i: Int, j: Int): Unit = {
    val tp = prio(i); prio(i) = prio(j); prio(j) = tp
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  def add(p: Double, id: Long): Unit = {
    if (java.lang.Double.isNaN(p)) return
    if (size < k) {
      prio(size) = p; ids(size) = id; size += 1
      var i = size - 1
      while (i > 0 && gt(prio(i), ids(i), prio((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && gt(prio(0), ids(0), p, id)) {
      prio(0) = p; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var s = i
        if (l < size && gt(prio(l), ids(l), prio(s), ids(s))) s = l
        if (r < size && gt(prio(r), ids(r), prio(s), ids(s))) s = r
        if (s == i) done = true else { swap(i, s); i = s }
      }
    }
  }
}

/** Exact-k-per-group uniform sampling as a bounded-state aggregate —
  * the "domain cap" primitive of web-corpus curation (cap every
  * source/domain at k documents so no stratum dominates the mix).
  *
  * `groupBy(stratum).agg(sampleIds(u, id, k))` replaces the
  * `row_number() OVER (PARTITION BY stratum ORDER BY u) <= k` window
  * formulation: the window ships every row of a Zipf-hot stratum into
  * ONE task and sorts it; this aggregate is map-side combined (O(k)
  * partial state) and shuffles one k-row buffer per task per stratum.
  * Output: the sampled ids sorted by (priority, id) ascending —
  * deterministic across runs, partitionings, and engines when the
  * priority is hash-derived.
  */
case class PriorityTopKIds(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PrioIdBuffer] with BinaryLike[Expression] {

  private def priority: Expression = left
  private def id: Expression = right

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "priority_topk_ids"

  override def createAggregationBuffer(): PrioIdBuffer = new PrioIdBuffer(k)

  override def update(buffer: PrioIdBuffer, input: InternalRow): PrioIdBuffer = {
    val p = priority.eval(input)
    val i = id.eval(input)
    if (p != null && i != null)
      buffer.add(p.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: PrioIdBuffer, input: PrioIdBuffer): PrioIdBuffer = {
    var i = 0
    while (i < input.size) { buffer.add(input.prio(i), input.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: PrioIdBuffer): Any = {
    val order = Array.tabulate(buffer.size)(identity).sortWith { (a, b) =>
      buffer.prio(a) < buffer.prio(b) ||
        (buffer.prio(a) == buffer.prio(b) && buffer.ids(a) < buffer.ids(b))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      order.map(i => buffer.ids(i)))
  }

  override def serialize(buffer: PrioIdBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.size * 16)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.prio(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PrioIdBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new PrioIdBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.prio(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PriorityTopKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PriorityTopKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PriorityTopKIds =
    copy(left = newLeft, right = newRight)
}

object PriorityTopKIds {
  /** Column form: the ids of the k smallest (priority, id) pairs per
    * group, ascending.
    */
  def sampleIds(priority: Column, id: Column, k: Int): Column =
    columnOf(PriorityTopKIds(
      expressionOf(priority.cast("double")),
      expressionOf(id.cast("long")), k).toAggregateExpression())
}
