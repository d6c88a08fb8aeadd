package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Distributed as-of join: for each left row, the nearest right row on
  * the same key — latest with rightTime ≤ leftTime (`backward`, the
  * default) or earliest with rightTime ≥ leftTime (`forward`) —
  * optionally within a time tolerance.
  *
  * Spark-first design: instead of a point-in-interval range join (which
  * explodes into a cartesian per key) this tags and unions both sides,
  * sorts once per key by (time, side) and carries the nearest right
  * payload across with a window — one shuffle, O(n log n) per key,
  * no fan-out. This is the scalable pattern for 100 TB event streams.
  */
object AsOfJoin {

  /** @param left        probe side; all its columns survive
    * @param right       build side; its payload appears as `payloadCols`
    * @param keys        equi-join keys
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param payloadCols columns of `right` to carry (must not clash)
    * @param direction   "backward" (latest right ≤ left) or "forward"
    *                    (earliest right ≥ left)
    * @param toleranceUs optional max |leftTime − rightTime|, in
    *                    microseconds for timestamp columns and in the
    *                    column's own units for numeric time columns;
    *                    matches farther away become NULL
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTime).toSeq
    val payloadType = org.apache.spark.sql.types.StructType.fromDDL(
      right.select(payloadCols.map(col): _*).schema.toDDL)

    // Sides sort so the right row lands before (backward) / after
    // (forward) the left rows it may serve at equal timestamps.
    def epoch(c: Column, dt: DataType): Column = dt match {
      case TimestampType | TimestampNTZType => unix_micros(c)
      case _ => c.cast("long")
    }
    val (rightTag, leftTag) = if (direction == "backward") (1, 2) else (2, 1)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_ts"), lit(leftTag).as("_side"),
          lit(null).cast(payloadType).as("_payload"),
          lit(null).cast("long").as("_rts")) ++
        leftCols.map(col): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("_ts"), lit(rightTag).as("_side"),
          struct(payloadCols.map(col): _*).as("_payload"),
          epoch(col(rightTime), right.schema(rightTime).dataType).as("_rts")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val ordered =
      if (direction == "backward")
        Window.partitionBy(keys.map(col): _*).orderBy(col("_ts").asc, col("_side").asc)
      else
        Window.partitionBy(keys.map(col): _*).orderBy(col("_ts").desc, col("_side").desc)
    val w = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("_matched", last("_payload", ignoreNulls = true).over(w))
      .withColumn("_matched_rts", last("_rts", ignoreNulls = true).over(w))
      .filter(col("_side") === leftTag)
    val withinTolerance = toleranceUs match {
      case Some(tol) =>
        abs(epoch(col("_ts"), left.schema(leftTime).dataType) - col("_matched_rts")) <= tol
      case None => lit(true)
    }
    matched
      .withColumn("_keep", col("_matched_rts").isNotNull && withinTolerance)
      .select(
        keys.map(col) ++ Seq(col("_ts").as(leftTime)) ++ leftCols.map(col) ++
          payloadCols.map(p =>
            when(col("_keep"), col("_matched").getField(p)).as(p)): _*)
  }
}
