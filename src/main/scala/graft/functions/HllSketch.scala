package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog register file: 2^p max-rank registers (Flajolet et al.
  * 2007). The merge of two register files is the elementwise max —
  * associative, commutative, idempotent — which is what makes the
  * sketch a proper partial aggregate: map-side combine, shuffle 4 KB
  * per group, never the values.
  */
final class HllRegisters(val p: Int) extends Serializable {
  val regs = new Array[Byte](1 << p)

  def add(idx: Int, rho: Int): Unit =
    if (rho > regs(idx)) regs(idx) = rho.toByte

  /** The standard estimator with the small-range (linear-counting)
    * correction. The harmonic denominator is accumulated as the exact
    * integer Σ 2^(53−M[j]) (a BigInt; register values are ≤ 53), so
    * the estimate is a correctly-rounded function of integers —
    * bit-identical in any engine that replays the same registers,
    * independent of summation order.
    */
  def estimate(): Double = {
    val m = 1 << p
    var zeros = 0
    var x = BigInt(0)
    var i = 0
    while (i < m) {
      x += BigInt(1) << (53 - regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val s = x.toDouble / HllSketch.Pow53
    val md = m.toDouble
    val alpha = 0.7213 / (1 + 1.079 / md)
    val raw = alpha * md * md / s
    if (raw <= 2.5 * md && zeros > 0) md * math.log(md / zeros.toDouble)
    else raw
  }
}

/** Approximate distinct count as a native `TypedImperativeAggregate` —
  * the sketch aggregate the brief's custom-operator ladder asks for
  * when built-ins can't express the semantics (Spark's own
  * `approx_count_distinct` is not reproducible in an external oracle).
  *
  * The 64-bit hash is the first 16 hex nibbles of md5(value): nibbles
  * 1–3 are the register index (p=12 → 4096 registers), nibbles 4–16
  * the 52-bit rank payload — both exactly replicable in plain SQL, so
  * the DuckDB oracle rebuilds the registers and lands on the identical
  * double. The child expression is the md5 hex string (computed by the
  * codegen'd builtin before the aggregate sees it).
  *
  * Scale: constant 4 KB state per group regardless of input size;
  * partial aggregation collapses values map-side, the shuffle carries
  * register files, and merge is elementwise max.
  */
case class HllSketch(
    child: Expression,
    p: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllRegisters] with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): HllRegisters = new HllRegisters(p)

  // lazy: the analyzer copies this node while the child is still
  // unresolved, and dataType on an unresolved child throws
  private lazy val binaryInput: Boolean =
    child.dataType == org.apache.spark.sql.types.BinaryType

  override def update(buffer: HllRegisters, input: InternalRow): HllRegisters = {
    val v = child.eval(input)
    if (v != null) {
      // Register coordinates = the md5's first 64 bits: top 12 bits the
      // index, next 52 the rank payload. Two equivalent encodings of
      // the child: raw 16-byte md5 (BinaryType — the ngram_md5s path,
      // zero decode work) or lowercase md5 hex (StringType — nibbles
      // parsed straight off the UTF8String bytes, no substring/String
      // allocation per row). Identical registers either way, so the
      // oracle replay is shared.
      var hi = 0L
      if (binaryInput) {
        val b = v.asInstanceOf[Array[Byte]]
        var i = 0
        while (i < 8) { hi = (hi << 8) | (b(i) & 0xffL); i += 1 }
      } else {
        val hex = v.asInstanceOf[UTF8String]
        var i = 0
        while (i < 16) { hi = (hi << 4) | HllSketch.nibble(hex.getByte(i)); i += 1 }
      }
      val idx = (hi >>> 52).toInt
      val w = hi & ((1L << 52) - 1)
      // rank = leading zeros of the 52-bit payload + 1 = 53 − bitlen(w)
      val rho = if (w == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      buffer.add(idx, rho)
    }
    buffer
  }

  override def merge(buffer: HllRegisters, input: HllRegisters): HllRegisters = {
    var i = 0
    while (i < buffer.regs.length) {
      if (input.regs(i) > buffer.regs(i)) buffer.regs(i) = input.regs(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: HllRegisters): Any = buffer.estimate()

  override def serialize(buffer: HllRegisters): Array[Byte] = {
    val out = new Array[Byte](4 + buffer.regs.length)
    java.nio.ByteBuffer.wrap(out).putInt(buffer.p)
    System.arraycopy(buffer.regs, 0, out, 4, buffer.regs.length)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllRegisters = {
    val pp = java.nio.ByteBuffer.wrap(bytes).getInt()
    val buf = new HllRegisters(pp)
    System.arraycopy(bytes, 4, buf.regs, 0, buf.regs.length)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

/** [[HllSketch]] that evals to the REGISTER FILE (length-prefixed
  * bytes) instead of the estimate — the persistable half of sketch
  * re-aggregation: store per-fine-grain sketches once, roll them up
  * to any coarser grain later with [[HllMerge]], never re-touching
  * the raw values (register max is associative/commutative/
  * idempotent, so any rollup path lands on the same registers).
  */
case class HllState(
    child: Expression,
    p: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllRegisters] with UnaryLike[Expression] {

  private val inner = HllSketch(child, p)
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_state"
  override def createAggregationBuffer(): HllRegisters = new HllRegisters(p)
  override def update(b: HllRegisters, in: InternalRow): HllRegisters = inner.update(b, in)
  override def merge(b: HllRegisters, o: HllRegisters): HllRegisters = inner.merge(b, o)
  override def eval(b: HllRegisters): Any = serialize(b)
  override def serialize(b: HllRegisters): Array[Byte] = inner.serialize(b)
  override def deserialize(bytes: Array[Byte]): HllRegisters = inner.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): HllState = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllState = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllState = copy(child = c)
}

/** Folds STORED register files (from [[HllState]]) and evals the
  * estimate — the rollup half of sketch re-aggregation.
  */
case class HllMerge(
    child: Expression,
    p: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllRegisters] with UnaryLike[Expression] {

  private val inner = HllSketch(child, p)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_merge"
  override def createAggregationBuffer(): HllRegisters = new HllRegisters(p)
  override def update(b: HllRegisters, in: InternalRow): HllRegisters = {
    val v = child.eval(in)
    if (v != null) inner.merge(b, inner.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: HllRegisters, o: HllRegisters): HllRegisters = inner.merge(b, o)
  override def eval(b: HllRegisters): Any = b.estimate()
  override def serialize(b: HllRegisters): Array[Byte] = inner.serialize(b)
  override def deserialize(bytes: Array[Byte]): HllRegisters = inner.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): HllMerge = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMerge = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllMerge = copy(child = c)
}

object HllSketch {
  /** 2^53 as an exact double. */
  val Pow53: Double = 9007199254740992.0

  /** Hex nibble value of a lowercase-hex ASCII byte. */
  @inline private[functions] def nibble(b: Byte): Int =
    if (b >= 'a') b - 'a' + 10 else b - '0'

  /** Approximate distinct count of `value` (any type; hashed through
    * md5 of its string form so external oracles can replay it).
    */
  def hllDistinct(value: Column, p: Int = 12): Column = {
    import org.apache.spark.sql.functions.md5
    columnOf(HllSketch(expressionOf(md5(value.cast("string"))), p).toAggregateExpression())
  }

  /** Approximate distinct count of ALREADY-md5'd values (16-byte
    * binary, e.g. [[NgramMd5Structs]] output) — same registers and
    * estimate as [[hllDistinct]] of the pre-image, zero decode work
    * per row.
    */
  def hllDistinctHashed(md5bin: Column, p: Int = 12): Column =
    columnOf(HllSketch(expressionOf(md5bin), p).toAggregateExpression())

  /** The register file of `value`'s sketch, as bytes (store at fine
    * grain, roll up later with [[hllMergeEstimate]]).
    */
  def hllState(value: Column, p: Int = 12): Column = {
    import org.apache.spark.sql.functions.md5
    columnOf(HllState(expressionOf(md5(value.cast("string"))), p).toAggregateExpression())
  }

  /** Fold stored register files to the merged estimate. */
  def hllMergeEstimate(states: Column, p: Int = 12): Column =
    columnOf(HllMerge(expressionOf(states), p).toAggregateExpression())
}
