package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Fixed-domain bitset: one bit per possible id. */
final class BitmapBits(val nBits: Int) extends Serializable {
  val words = new Array[Long]((nBits + 63) >>> 6)
  def set(v: Long): Unit = {
    require(v >= 0 && v < nBits,
      s"bitmap_distinct: value $v outside domain [0, $nBits)")
    words((v >>> 6).toInt) |= 1L << (v & 63)
  }
  def or(o: BitmapBits): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
  }
  def popCount: Long = {
    var n = 0L; var i = 0
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }
}

/** EXACT distinct count over a bounded integer domain, as a mergeable
  * bitmap aggregate (the ClickHouse `groupBitmap` / roaring-bitmap
  * shape, dense because the driver ids here are dense). Distinct
  * counts don't add across groups — but bitmaps OR: store the bitset
  * at fine grain once and roll it up to ANY coarser grain with
  * [[BitmapMerge]], getting exact (not HLL-approximate) distincts at
  * every grain. OR is associative/commutative/idempotent, so any
  * rollup path equals the direct bitmap — the q138 oracle pins rolled
  * = `count(DISTINCT ...)`.
  *
  * Scale: constant nBits/8 bytes of state per group (128 KB at the
  * 2^20 default) with full map-side combine; the shuffle carries one
  * bitset per group, never the rows. The domain bound is enforced
  * per row — ids past the capacity fail loudly rather than aliasing;
  * for unbounded domains use [[HllSketch]] instead.
  */
case class BitmapAgg(
    child: Expression,
    nBits: Int = 1 << 20,
    evalState: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitmapBits] with UnaryLike[Expression] {

  override def dataType: DataType = if (evalState) BinaryType else LongType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (evalState) "bitmap_state" else "bitmap_distinct"

  override def createAggregationBuffer(): BitmapBits = new BitmapBits(nBits)

  override def update(buffer: BitmapBits, input: InternalRow): BitmapBits = {
    val v = child.eval(input)
    if (v != null) buffer.set(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BitmapBits, other: BitmapBits): BitmapBits = {
    buffer.or(other); buffer
  }

  override def eval(buffer: BitmapBits): Any =
    if (evalState) serialize(buffer) else buffer.popCount

  override def serialize(buffer: BitmapBits): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.words.length)
    bb.putInt(buffer.nBits)
    buffer.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BitmapBits = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BitmapBits(bb.getInt())
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapAgg =
    copy(child = c)
}

/** ORs STORED bitset files (from `bitmapState`) and evals the exact
  * distinct count — the rollup half of exact-distinct re-aggregation.
  */
case class BitmapMerge(
    child: Expression,
    nBits: Int = 1 << 20,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitmapBits] with UnaryLike[Expression] {

  private val inner = BitmapAgg(child, nBits)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_merge"
  override def createAggregationBuffer(): BitmapBits = new BitmapBits(nBits)
  override def update(b: BitmapBits, in: InternalRow): BitmapBits = {
    val v = child.eval(in)
    if (v != null) {
      val o = inner.deserialize(v.asInstanceOf[Array[Byte]])
      require(o.nBits == b.nBits,
        s"bitmap_merge capacity mismatch: ${o.nBits} vs ${b.nBits}")
      b.or(o)
    }
    b
  }
  override def merge(b: BitmapBits, o: BitmapBits): BitmapBits = { b.or(o); b }
  override def eval(b: BitmapBits): Any = b.popCount
  override def serialize(b: BitmapBits): Array[Byte] = inner.serialize(b)
  override def deserialize(bytes: Array[Byte]): BitmapBits = inner.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): BitmapMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapMerge =
    copy(child = c)
}

object BitmapSketch {
  /** Exact distinct count of a bounded-domain long column. */
  def bitmapDistinct(value: Column, nBits: Int = 1 << 20): Column =
    columnOf(BitmapAgg(expressionOf(value.cast("long")), nBits)
      .toAggregateExpression())

  /** The bitset file, as bytes — store at fine grain, roll up later
    * with [[bitmapMergeCount]] for exact distincts at any grain.
    */
  def bitmapState(value: Column, nBits: Int = 1 << 20): Column =
    columnOf(BitmapAgg(expressionOf(value.cast("long")), nBits, evalState = true)
      .toAggregateExpression())

  /** OR stored bitset files to the exact merged distinct count. */
  def bitmapMergeCount(states: Column, nBits: Int = 1 << 20): Column =
    columnOf(BitmapMerge(expressionOf(states), nBits).toAggregateExpression())
}
