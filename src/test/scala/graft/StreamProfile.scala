package graft

import graft.streaming.{DedupStream, StreamQueries}
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One-off adjudication of q318_stream_neardup's BENCH_STREAM floor
  * (VERDICT r14 item 3): splits the replay wall into (a) the
  * streaming-machinery floor — an otherwise-identical
  * transformWithState replay of the SAME 5k-doc source with a
  * trivial passthrough state, (b) the banding chain cost in pure
  * batch (shingle → minhash → band md5), and (c) the full q318
  * replay. If (a) ≈ (c), the 3.1k rows/sec figure is
  * startup-dominated, not a per-row defect.
  */
object StreamProfile {

  final case class IdRow(bkey: String, doc_id: Long)

  class PassthroughProcessor extends StatefulProcessor[String, IdRow, IdRow] {
    @transient private var seen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        key: String, rows: Iterator[IdRow], timerValues: TimerValues): Iterator[IdRow] = {
      val arr = rows.toArray
      seen.update(if (seen.exists()) seen.get() + arr.length else arr.length)
      arr.iterator
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(16, "graft-stream-profile")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PROF $label%-28s $s%8.3f s")
      s
    }

    val docsBatch = spark.read.parquet(s"$sfDir/documents.parquet")
    docsBatch.count() // warm FS cache

    // (b) banding chain in pure batch, twice (second = warm)
    time("batch_band_rows_cold")(DedupStream.bandRows(docsBatch).count())
    time("batch_band_rows_warm")(DedupStream.bandRows(docsBatch).count())

    def passthrough() =
      StreamQueries.materialize(
        StreamQueries.streamTable(spark, sfDir, "documents")
          .select((col("doc_id") % 1024).cast("string").as("bkey"),
            col("doc_id").cast("long").as("doc_id"))
          .as[IdRow]
          .groupByKey(_.bkey)
          .transformWithState(new PassthroughProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF(),
        mode = "update").count()

    // (a0) stateless replay: pure streaming startup, no state store
    for (i <- 1 to 3)
      time(s"stream_stateless_$i") {
        StreamQueries.materialize(
          StreamQueries.streamTable(spark, sfDir, "documents")
            .select(col("doc_id"))).count()
      }

    // (a) streaming floor: same source, trivial keyed state on
    // q318's RocksDB store (transformWithState requires RocksDB)
    for (i <- 1 to 3)
      time(s"stream_passthrough_rocks_$i") {
        graft.streaming.EventStream.withRocksDbStateStore(spark)(passthrough())
      }

    // (c) the full q318 replay, three reps
    for (i <- 1 to 3)
      time(s"q318_full_$i") {
        SparkEntry.queries("q318_stream_neardup")(spark, sfDir).count()
      }

    spark.stop()
  }
}
