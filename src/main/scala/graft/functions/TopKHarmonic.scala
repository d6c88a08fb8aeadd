package graft.functions

import graft.GraftConf

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Bounded top-K score buffer: a size-capped min-heap over doubles.
  * Adding a score is O(log K); the harmonic evaluation sorts the ≤K
  * survivors descending and folds Σ sᵢ/i² in that order — bit-identical
  * to [[HarmonicScore]] over the full multiset, since only the K
  * largest values (by value, ties interchangeable) contribute.
  */
final class TopKBuffer(val k: Int) extends Serializable {
  val heap = new Array[Double](k)
  var size = 0

  def add(v: Double): Unit = {
    if (java.lang.Double.isNaN(v)) return
    if (size < k) {
      heap(size) = v
      size += 1
      var i = size - 1
      while (i > 0 && heap((i - 1) / 2) > heap(i)) {
        val t = heap(i); heap(i) = heap((i - 1) / 2); heap((i - 1) / 2) = t
        i = (i - 1) / 2
      }
    } else if (v > heap(0)) {
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var s = i
        if (l < size && heap(l) < heap(s)) s = l
        if (r < size && heap(r) < heap(s)) s = r
        if (s == i) done = true
        else { val t = heap(i); heap(i) = heap(s); heap(s) = t; i = s }
      }
    }
  }

  def harmonic(maxScore: Double): Any = {
    if (size == 0) return null
    val sorted = java.util.Arrays.copyOf(heap, size)
    java.util.Arrays.sort(sorted)
    var sum = 0.0
    var i = 0
    while (i < size) {
      val rank = i + 1
      sum += sorted(size - 1 - i) / (rank.toDouble * rank)
      i += 1
    }
    sum / maxScore
  }
}

/** Windowed cumulative harmonic score with O(K) state.
  *
  * Scoring semantics follow the reference's harmonic association sum
  * (/root/reference/timeseries.py:480–510): top-K=50 scores, Σ sᵢ/i²,
  * normalized by max_score.
  *
  * Used over a growing frame (`rowsBetween(unboundedPreceding,
  * currentRow)` ordered by year): Spark's unbounded-preceding frame
  * feeds each row into the buffer exactly once, so the cumulative
  * top-K is maintained incrementally — no per-year materialization of
  * the full cumulative score multiset (which is O(evidence-per-pair)
  * per row and quadratic across a pair's years; at 100 TB a prolific
  * pair would OOM that formulation, while this one carries 50 doubles).
  *
  * Input is the per-year score array from the map-side-combined
  * `collect_list` aggregate; nulls/NaNs are skipped like
  * [[HarmonicScore]].
  */
case class TopKHarmonic(
    child: Expression,
    k: Int = GraftConf.TopK,
    maxScore: Double = GraftConf.MaxScore,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "topk_harmonic"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) buffer.add(arr.getDouble(i))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < input.size) { buffer.add(input.heap(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = buffer.harmonic(maxScore)

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.size * 8)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.heap(i) = bb.getDouble(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKHarmonic =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKHarmonic =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKHarmonic =
    copy(child = newChild)
}

object TopKHarmonic {
  /** Column form: cumulative harmonic score of the top-K values seen in
    * the window frame. Pair with
    * `Window.partitionBy(keys).orderBy(year).rowsBetween(unboundedPreceding, currentRow)`.
    */
  def topKHarmonic(
      scoresArray: Column,
      k: Int = GraftConf.TopK,
      maxScore: Double = GraftConf.MaxScore): Column =
    columnOf(TopKHarmonic(expressionOf(scoresArray), k, maxScore).toAggregateExpression())
}

/** Bounded top-K score collection: the partial-aggregating (map-side
  * combining) replacement for `collect_list` when only the K largest
  * values can matter downstream ([[TopKHarmonic]] consumes the
  * result, and top-K of a union equals top-K of the union of per-group
  * top-Ks — exact, not approximate). Aggregation state is the same
  * O(K) [[TopKBuffer]]; `collect_list` state is O(rows-per-group),
  * unbounded in evidence-per-year at 100 TB. Output is sorted
  * descending (deterministic). Nulls and NaNs are skipped, like
  * [[HarmonicScore]].
  */
case class TopKCollect(
    child: Expression,
    k: Int = GraftConf.TopK,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_collect"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < input.size) { buffer.add(input.heap(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = java.util.Arrays.copyOf(buffer.heap, buffer.size)
    java.util.Arrays.sort(sorted)
    val out = new Array[Double](buffer.size)
    var i = 0
    while (i < buffer.size) { out(i) = sorted(buffer.size - 1 - i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.size * 8)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putDouble(buffer.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.heap(i) = bb.getDouble(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKCollect =
    copy(child = newChild)
}

object TopKCollect {
  /** Column form: `groupBy(...).agg(topKCollect(col("score")))` — the
    * bounded-state stand-in for `collect_list(score)` feeding a top-K
    * consumer.
    */
  def topKCollect(score: Column, k: Int = GraftConf.TopK): Column =
    columnOf(TopKCollect(expressionOf(score.cast("double")), k).toAggregateExpression())
}
