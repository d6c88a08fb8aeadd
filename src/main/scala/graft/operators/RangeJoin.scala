package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match left rows whose timestamp falls inside
  * right-side `[start, end]` intervals, sharing equi-keys.
  *
  * Naive range predicates plan as broadcast-nested-loop joins —
  * quadratic and un-broadcastable once both sides are large. This is
  * the standard scalable reformulation: quantize time into fixed-width
  * bins, replicate each interval to every bin it overlaps, equi-join on
  * (keys, bin), and apply the exact range predicate after. Each left
  * row lives in exactly one bin, so a qualifying (row, interval) pair
  * meets exactly once — no post-join dedup. Work scales with
  * rows × intervals-per-bin; pick `binWidth` near the typical interval
  * length so replication stays O(1) per interval.
  */
object RangeJoin {

  def binned(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      startCol: String,
      endCol: String,
      binWidth: String = "1 hour"): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(binWidth))
    require(iv.months == 0, s"binWidth must be a fixed duration, got $binWidth")
    val binMicros = iv.days * 86400000000L + iv.microseconds
    require(binMicros > 0, s"binWidth must be positive, got $binWidth")
    val lb = left.withColumn("__bin", floor(unix_micros(col(leftTs)) / binMicros))
    val rb = right.withColumn("__bin", explode(sequence(
      floor(unix_micros(col(startCol)) / binMicros),
      floor(unix_micros(col(endCol)) / binMicros))))
    lb.join(rb, (keys :+ "__bin").toSeq)
      .filter(col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol))
      .drop("__bin")
  }
}
