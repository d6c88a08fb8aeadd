package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** KLL quantile compactor state (Karnin, Lang & Liberty 2016): a
  * ladder of levels where level `i` holds items of weight 2^i; level
  * capacities shrink geometrically (ratio 2/3) below the top, so
  * total state is O(k) items regardless of input size. Compacting a
  * level sorts it and promotes every other item (double weight) to
  * the level above — the kept parity alternates per level via a flip
  * counter instead of a random coin, so a fixed merge tree is fully
  * deterministic and a spec can replay it. An odd leftover item stays
  * at its level, which keeps the invariant Σ items·2^level == n
  * exactly — the sketch's `n` is always the true count.
  *
  * Unlike the register sketches (HLL/CMS/bitmap: I6/I16/I18/I19) the
  * compactor is NOT merge-order invariant — different merge trees give
  * (boundedly) different summaries. The rank-error CONTRACT is what
  * holds under any tree: |est_rank − φ·n| ≤ ε·n (KllSketchSpec pins it
  * across distributions, orders, and split shapes; q334 gates it
  * end-to-end against exact ranks). For the merge-order-INVARIANT
  * member of the quantile family see [[BottomKSample]] (q333).
  */
final class KllBuffer(val k: Int) extends Serializable {
  var n: Long = 0L
  // levels(i): item storage for weight-2^i items; sizes(i) items used
  var levels: Array[Array[Double]] = Array(new Array[Double](8))
  var sizes: Array[Int] = Array(0)
  var flips: Array[Long] = Array(0L)

  private def cap(i: Int): Int = {
    val depth = levels.length - 1 - i
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
  }

  private def capTotal: Int = {
    var s = 0; var i = 0
    while (i < levels.length) { s += cap(i); i += 1 }
    s
  }

  private def totalItems: Int = {
    var s = 0; var i = 0
    while (i < sizes.length) { s += sizes(i); i += 1 }
    s
  }

  private def push(level: Int, v: Double): Unit = {
    if (level >= levels.length) {
      val old = levels.length
      levels = java.util.Arrays.copyOf(levels, level + 1)
      sizes = java.util.Arrays.copyOf(sizes, level + 1)
      flips = java.util.Arrays.copyOf(flips, level + 1)
      var i = old
      while (i <= level) { levels(i) = new Array[Double](8); i += 1 }
    }
    if (sizes(level) == levels(level).length)
      levels(level) = java.util.Arrays.copyOf(levels(level),
        levels(level).length * 2)
    levels(level)(sizes(level)) = v
    sizes(level) += 1
  }

  def add(v: Double): Unit = {
    if (java.lang.Double.isNaN(v)) return
    push(0, v)
    n += 1
    compactIfNeeded()
  }

  def mergeIn(o: KllBuffer): Unit = {
    var l = 0
    while (l < o.levels.length) {
      var j = 0
      while (j < o.sizes(l)) { push(l, o.levels(l)(j)); j += 1 }
      if (l < flips.length) flips(l) += o.flips(l)
      l += 1
    }
    n += o.n
    compactIfNeeded()
  }

  private def compactIfNeeded(): Unit = {
    // total > Σ(cap) implies some level is at/over its cap (each level
    // at cap−1 sums below Σ(cap)); compact the lowest such level
    while (totalItems > capTotal) {
      var l = 0
      while (sizes(l) < cap(l)) l += 1
      compact(l)
    }
  }

  private def compact(l: Int): Unit = {
    val size = sizes(l)
    val buf = levels(l)
    java.util.Arrays.sort(buf, 0, size)
    val m = size - (size & 1)
    val offset = (flips(l) & 1L).toInt
    flips(l) += 1
    // promote every other item of the sorted even prefix (weight 2^l →
    // 2^(l+1)); the odd leftover (the max) stays at this level
    val leftover = if ((size & 1) == 1) buf(size - 1) else 0.0
    var j = offset
    sizes(l) = 0
    while (j < m) { push(l + 1, buf(j)); j += 2 }
    if ((size & 1) == 1) { levels(l)(0) = leftover; sizes(l) = 1 }
  }

  /** Quantile estimates: smallest item whose cumulative weight reaches
    * max(1, ceil(φ·n)) over the value-sorted weighted items. Exact
    * integer rank arithmetic — deterministic given the summary.
    */
  def quantiles(phis: Array[Double]): Array[Double] = {
    val total = totalItems
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    // gather, then sort by value (indirect via index sort on a copy)
    val idx = new Array[Integer](total)
    var p = 0
    var l = 0
    while (l < levels.length) {
      var j = 0
      while (j < sizes(l)) {
        vs(p) = levels(l)(j); ws(p) = 1L << l; idx(p) = p; p += 1; j += 1
      }
      l += 1
    }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Double.compare(vs(a), vs(b)))
    val out = new Array[Double](phis.length)
    var q = 0
    while (q < phis.length) {
      val target = math.max(1L, math.ceil(phis(q) * n).toLong)
      var cum = 0L
      var i = 0
      var ans = if (total > 0) vs(idx(total - 1)) else Double.NaN
      var found = false
      while (i < total && !found) {
        cum += ws(idx(i))
        if (cum >= target) { ans = vs(idx(i)); found = true }
        i += 1
      }
      out(q) = ans
      q += 1
    }
    out
  }

  def serializeBytes(): Array[Byte] = {
    val items = totalItems
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 4 +
      levels.length * (4 + 8) + items * 8)
    bb.putInt(k).putLong(n).putInt(levels.length)
    var l = 0
    while (l < levels.length) {
      bb.putInt(sizes(l)).putLong(flips(l))
      var j = 0
      while (j < sizes(l)) { bb.putDouble(levels(l)(j)); j += 1 }
      l += 1
    }
    bb.array()
  }
}

object KllBuffer {
  def deserializeBytes(bytes: Array[Byte]): KllBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(bb.getInt())
    buf.n = bb.getLong()
    val nl = bb.getInt()
    buf.levels = new Array[Array[Double]](nl)
    buf.sizes = new Array[Int](nl)
    buf.flips = new Array[Long](nl)
    var l = 0
    while (l < nl) {
      buf.sizes(l) = bb.getInt()
      buf.flips(l) = bb.getLong()
      buf.levels(l) = new Array[Double](math.max(8, buf.sizes(l)))
      var j = 0
      while (j < buf.sizes(l)) { buf.levels(l)(j) = bb.getDouble(); j += 1 }
      l += 1
    }
    buf
  }
}

/** `kll_state`: the KLL summary of a double column, as bytes — store
  * at fine grain, roll up with [[KllMergeState]] (`kll_merge`), read
  * quantiles with [[KllQuantiles]]. O(k) state per group, map-side
  * combined; the shuffle carries one summary per group per task.
  */
case class KllSketch(
    child: Expression,
    k: Int = KllSketch.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_state"
  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)
  override def update(b: KllBuffer, in: InternalRow): KllBuffer = {
    val v = child.eval(in)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }
  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = { b.mergeIn(o); b }
  override def eval(b: KllBuffer): Any = b.serializeBytes()
  override def serialize(b: KllBuffer): Array[Byte] = b.serializeBytes()
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.deserializeBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketch =
    copy(child = c)
}

/** `kll_merge`: fold STORED KLL summaries (from [[KllSketch]]) into
  * the merged summary bytes — the state-preserving rollup half, so a
  * summary table can keep rolling to coarser grains.
  */
case class KllMergeState(
    child: Expression,
    k: Int = KllSketch.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge"
  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)
  override def update(b: KllBuffer, in: InternalRow): KllBuffer = {
    val v = child.eval(in)
    if (v != null) b.mergeIn(KllBuffer.deserializeBytes(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = { b.mergeIn(o); b }
  override def eval(b: KllBuffer): Any = b.serializeBytes()
  override def serialize(b: KllBuffer): Array[Byte] = b.serializeBytes()
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.deserializeBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllMergeState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeState =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeState =
    copy(child = c)
}

/** `kll_quantiles`: fold stored summaries and eval the φ-quantile
  * estimates (array<double>, one per φ) plus nothing else — pair with
  * an exact `sum`/`count` in the same agg for the invariant fields.
  */
case class KllQuantiles(
    child: Expression,
    phis: Seq[Double],
    k: Int = KllSketch.DefaultK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles"
  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)
  override def update(b: KllBuffer, in: InternalRow): KllBuffer = {
    val v = child.eval(in)
    if (v != null) b.mergeIn(KllBuffer.deserializeBytes(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = { b.mergeIn(o); b }
  override def eval(b: KllBuffer): Any =
    new GenericArrayData(b.quantiles(phis.toArray))
  override def serialize(b: KllBuffer): Array[Byte] = b.serializeBytes()
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.deserializeBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
}

object KllSketch {
  val DefaultK = 256

  /** The KLL summary of `value` as bytes (store fine, roll up later). */
  def kllState(value: Column, k: Int = DefaultK): Column =
    columnOf(KllSketch(expressionOf(value.cast("double")), k)
      .toAggregateExpression())

  /** Fold stored summaries to the merged summary bytes. */
  def kllMerge(states: Column, k: Int = DefaultK): Column =
    columnOf(KllMergeState(expressionOf(states), k).toAggregateExpression())

  /** Fold stored summaries and eval φ-quantile estimates. */
  def kllQuantiles(states: Column, phis: Seq[Double], k: Int = DefaultK): Column =
    columnOf(KllQuantiles(expressionOf(states), phis, k).toAggregateExpression())

  /** Exact total count carried by a summary (bytes 4–11). */
  def kllN(state: Column): Column = {
    import org.apache.spark.sql.functions._
    // big-endian long at offset 4 of the serialized summary
    aggregate(sequence(lit(5), lit(12)),
      lit(0L),
      (acc, i) => acc * 256 +
        (conv(hex(substring(state, i.cast("int"), lit(1))), 16, 10)).cast("long"))
  }
}
