package graft

import graft.streaming.StreamQueries

/** Streaming throughput record (VERDICT r13 item 5): every streaming
  * query is CORRECTNESS-gated via its split-invariant oracle, but a
  * 100 TB ingest decision also needs rows/sec and state size. This
  * main re-runs each registered streaming replay, drains the
  * per-stream `StreamingQueryProgress` metrics that
  * [[StreamQueries.materialize]] records (input rows, micro-batches,
  * wall, max state rows/bytes across batches), and publishes ONE JSON
  * line (schema graft-stream-bench-1) plus BENCH_STREAM.json.
  *
  * Figures are replay-shaped, not steady-state: AvailableNow over a
  * single parquet file pays state-store startup per batch, so treat
  * rows/sec as a floor and state rows/bytes as the real signal (they
  * are split-invariant).
  */
object StreamBench {
  final case class QueryStreamStats(
      wallSec: Double,
      inputRows: Long,
      batches: Int,
      rowsPerSec: Double,
      stateRowsMax: Long,
      stateBytesMax: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-stream-bench")
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.filter(_.contains("stream")).toSeq
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Either[String, QueryStreamStats]]
    names.foreach { name =>
      StreamQueries.metrics.clear()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        val runs = StreamQueries.metrics.values.toSeq
        val streamWallMs = runs.map(_.wallMs).sum
        val rows = runs.map(_.inputRows).sum
        out(name) = Right(QueryStreamStats(
          wallSec = (System.nanoTime() - t0) / 1e9,
          inputRows = rows,
          batches = runs.map(_.batches).sum,
          rowsPerSec =
            if (streamWallMs > 0) rows * 1000.0 / streamWallMs else 0.0,
          stateRowsMax = runs.map(_.stateRowsMax).maxOption.getOrElse(0L),
          stateBytesMax = runs.map(_.stateBytesMax).maxOption.getOrElse(0L)))
      } catch {
        case e: Throwable =>
          out(name) = Left(Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120))
      }
    }
    def fmt(v: Double): String = BenchRender.fmt(v, 1)
    val qs = out.map {
      case (k, Right(s)) =>
        s""""$k":{"wall_sec":${BenchRender.fmt(s.wallSec, 3)},"input_rows":${s.inputRows},""" +
          s""""batches":${s.batches},"rows_per_sec":${fmt(s.rowsPerSec)},""" +
          s""""state_rows_max":${s.stateRowsMax},"state_bytes_max":${s.stateBytesMax}}"""
      case (k, Left(m)) => s""""$k":{"err":"$m"}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"schema":"graft-stream-bench-1","metric":"stream","unit":"mixed","n_queries":${out.size},"queries":$qs,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_STREAM.json"), line + "\n")
    spark.stop()
    println(line)
  }
}
