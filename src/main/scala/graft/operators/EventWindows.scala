package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal windowing over an event stream (batch side; the streaming
  * variants live in graft.streaming.EventStream and share these
  * aggregation shapes).
  */
object EventWindows {

  /** Tumbling-window aggregation via Spark's `window()` generator. */
  def tumbling(
      events: DataFrame,
      duration: String,
      groupCols: Seq[String],
      aggs: Seq[Column]): DataFrame =
    events
      .groupBy(window(col("ts"), duration) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")

  /** Sliding-window aggregation (`slide` < `duration` ⇒ overlapping
    * windows; each event lands in duration/slide windows).
    */
  def sliding(
      events: DataFrame,
      duration: String,
      slide: String,
      groupCols: Seq[String],
      aggs: Seq[Column]): DataFrame =
    events
      .groupBy(window(col("ts"), duration, slide) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")
}

/** Gap-based sessionization: a new session starts when a user is idle
  * longer than `gap`. Batch formulation: window cumulative-sum of
  * session-start flags per user — one shuffle on the (high-cardinality)
  * user key; the streaming twin is `session_window` (EventStream).
  */
object Sessionize {

  def sessions(
      events: DataFrame,
      gapMinutes: Int,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val cum = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_gap_us",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_gap_us").isNull || col("_gap_us") > gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("_new_session").over(cum))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsCol).as("start_ts"),
        max(tsCol).as("end_ts"),
        (unix_micros(max(tsCol)) - unix_micros(min(tsCol))).as("duration_us"))
  }
}
