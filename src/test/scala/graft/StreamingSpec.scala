package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(min * 60000L)

  test("streaming tumbling window aggregates with watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.tumblingCounts(input.toDF(), duration = "1 hour")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        EventStream.Event(1, ts(5), 1, "click", 1.0),
        EventStream.Event(2, ts(10), 1, "click", 2.0),
        EventStream.Event(3, ts(70), 2, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming session_window sessionizes by gap") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionCounts(input.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        EventStream.Event(1, ts(0), 1, "click", 1.0),
        EventStream.Event(2, ts(10), 1, "click", 1.0),
        EventStream.Event(3, ts(120), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .select("user_id", "n_events").as[(Long, Long)].collect().toList
      assert(rows.map(_._2).sorted == List(1L, 2L), s"got $rows")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(EventStream.Event(1, ts(0), 1, "click", 1.5))
      q.processAllAvailable()
      input.addData(EventStream.Event(2, ts(1), 1, "click", 2.5))
      q.processAllAvailable()
      val last = spark.table("running_out")
        .select("user_id", "n_events", "total_value").as[(Long, Long, Double)]
        .collect().maxBy(_._2)
      assert(last == ((1L, 2L, 4.0)))
    } finally q.stop()
  }
}
