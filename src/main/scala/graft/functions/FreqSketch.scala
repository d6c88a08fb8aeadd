package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al. 2012, "Mergeable Summaries"): at most `k`
  * (item, count) counters. A weighted insert adds to the item's
  * counter (creating it if room); when a (k+1)-th counter appears,
  * the (k+1)-th LARGEST count is subtracted from every counter and
  * non-positive ones drop — which is also exactly the merge step, so
  * update and merge are one operation and the summary is a proper
  * partial aggregate (O(k) state, map-side combined).
  *
  * The guarantees hold under ANY merge tree (total decrement over any
  * item's history is ≤ n/(k+1)):
  *
  *   - one-sided error: true − n/(k+1) ≤ est ≤ true;
  *   - completeness: every item with true count > n/(k+1) is present.
  *
  * Both are integer-exact checks an oracle can gate end-to-end with
  * one exact counting pass (q336) — the candidate-LISTING member of
  * the sketch family, complementing CMS (I7: point estimates for any
  * key, but no candidate enumeration without a driver-known dim).
  *
  * Input is (item: string, weight: long): weight 1 for raw rows; a
  * stored summary rolls up by exploding its (item, est) pairs into
  * this same aggregate — the I6/I16 store-fine/roll-up contract.
  * Output: array<struct<w,c>> sorted by item — deterministic given
  * the merge tree (the CONTRACT, not the bytes, is what any tree
  * preserves; same gating stance as the KLL q334).
  */
final class MgBuffer(val k: Int) extends Serializable {
  val counts = new java.util.HashMap[String, Long](k * 2)

  def insert(item: String, weight: Long): Unit = {
    if (weight <= 0) return
    counts.put(item, counts.getOrDefault(item, 0L) + weight)
    if (counts.size > k) compress()
  }

  private def compress(): Unit = {
    // subtract the (k+1)-th largest count from all, drop <= 0
    val vals = new Array[Long](counts.size)
    var i = 0
    val it0 = counts.values().iterator()
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - cut
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  def mergeIn(o: MgBuffer): Unit = {
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(e.getKey, e.getValue)
    }
  }
}

case class FreqSketch(
    left: Expression,
    right: Expression,
    k: Int = FreqSketch.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] with BinaryLike[Expression] {

  private def item: Expression = left
  private def weight: Expression = right

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(b: MgBuffer, in: InternalRow): MgBuffer = {
    val w = item.eval(in)
    val c = weight.eval(in)
    if (w != null && c != null)
      b.insert(w.asInstanceOf[UTF8String].toString, c.asInstanceOf[Long])
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = { b.mergeIn(o); b }

  override def eval(b: MgBuffer): Any = {
    val keys = new Array[String](b.counts.size)
    var i = 0
    val it = b.counts.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(w => new GenericInternalRow(
      Array[Any](UTF8String.fromString(w), b.counts.get(w)))))
  }

  override def serialize(b: MgBuffer): Array[Byte] = {
    val entries = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries += ((e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        e.getValue))
    }
    val sz = 8 + entries.map(_._1.length + 12).sum
    val bb = java.nio.ByteBuffer.allocate(sz)
    bb.putInt(b.k).putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length).put(bytes).putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new MgBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      b.counts.put(new String(arr, java.nio.charset.StandardCharsets.UTF_8),
        bb.getLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqSketch =
    copy(left = newLeft, right = newRight)
}

object FreqSketch {
  val DefaultK = 128

  /** Misra–Gries summary of `item` with `weight` (lit(1L) for raw
    * rows; a stored summary's `c` when rolling up exploded states).
    */
  def freqSketch(item: Column, weight: Column, k: Int = DefaultK): Column =
    columnOf(FreqSketch(expressionOf(item),
      expressionOf(weight.cast("long")), k).toAggregateExpression())
}
