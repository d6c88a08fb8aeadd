package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runs the streaming operators as REGISTERED queries: a driver parquet
  * table is replayed through the file source with Trigger.AvailableNow
  * into a memory sink, and the materialized result is returned as a
  * batch DataFrame — so the streaming runtime (watermarks, state
  * stores, append/update semantics) is exercised end-to-end by the same
  * DuckDB oracle gate as every batch query.
  *
  * Determinism: the file source may split the input into any number of
  * micro-batches, so only batch-split-invariant results are registered —
  * append-mode aggregations are compared on their FINALIZED windows
  * (window end ≤ final watermark = max event time − delay, which no
  * batch split can change), and update-mode state is reduced to its
  * final value per key (`latestByKey`).
  */
object StreamQueries {

  private val ctr = new java.util.concurrent.atomic.AtomicLong()

  /** Per-run throughput/state record captured from
    * `StreamingQueryProgress` when a replay terminates — the figures a
    * 100 TB ingest decision needs next to the correctness gate
    * (VERDICT r13 item 5). `graft.StreamBench` drains this between
    * queries and publishes BENCH_STREAM.json.
    */
  final case class StreamRunMetrics(
      batches: Int,
      inputRows: Long,
      wallMs: Long,
      stateRowsMax: Long,
      stateBytesMax: Long)

  val metrics = scala.collection.concurrent.TrieMap.empty[String, StreamRunMetrics]

  private def record(
      name: String,
      q: org.apache.spark.sql.streaming.StreamingQuery,
      wallMs: Long): Unit = {
    val progs = q.recentProgress
    metrics.put(name, StreamRunMetrics(
      batches = progs.length,
      inputRows = progs.map(_.numInputRows).sum,
      wallMs = wallMs,
      stateRowsMax = progs.map(p =>
        p.stateOperators.map(_.numRowsTotal).sum).maxOption.getOrElse(0L),
      stateBytesMax = progs.map(p =>
        p.stateOperators.map(_.memoryUsedBytes).sum).maxOption.getOrElse(0L)))
  }

  /** A driver parquet table as a file-source stream (schema probed from
    * the parquet footer).
    */
  def streamTable(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // The driver tables are single FILES. FileStreamSource force-sets
    // basePath to the source path whenever it is NOT a glob, and a
    // file-valued basePath is rejected at partition inference — so feed
    // it a single-alternative {name} glob (matches only this file) and
    // pin basePath to the parent directory ourselves.
    spark.readStream.schema(spark.read.parquet(path).schema)
      .option("basePath", dir).parquet(s"$dir/{$name}.parquet")
  }

  /** events.parquet as a stream, with the same ts-encoding normalization
    * as [[graft.sources.Tables.events]] (nanos-as-long vs TIMESTAMP_NTZ).
    */
  def streamEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.sources.Tables.normalizeEventTs(streamTable(spark, dir, "events"))
  }

  /** The evidence view (SURVEY.md §3) as a stream of
    * [[AssociationStream.EvidenceEvent]]-shaped rows.
    */
  def streamEvidence(spark: SparkSession, dir: String): DataFrame =
    streamTable(spark, dir, "lineitem").select(
      col("l_suppkey").cast("long").as("diseaseId"),
      col("l_partkey").cast("long").as("targetId"),
      col("l_returnflag").as("datasourceId"),
      (col("l_discount") * 10).cast("double").as("score"))

  /** Run `stream` to completion (AvailableNow) into a uniquely-named
    * memory sink and return the materialized table.
    *
    * Checkpoints live under the per-JVM [[graft.Scratch]] root
    * (removed at exit — repeated bench/verify runs must not
    * accumulate state dirs). The replay runs with
    * [[graft.GraftConf.StreamStatePartitions]] shuffle partitions:
    * every stateful operator instantiates one state store PER
    * partition PER micro-batch, so a bounded replay at the session's
    * batch width (32) pays 4× the store startup/commit overhead for
    * zero parallelism gain at this state size. The session conf is
    * restored after planning — an unbounded production stream with a
    * hot keyspace sizes its own width at start().
    */
  def materialize(stream: DataFrame, mode: String = "append"): DataFrame = {
    val name = s"graft_stream_${ctr.incrementAndGet()}"
    val ckpt = graft.Scratch.dir(s"ckpt-$name")
    val spark = stream.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.GraftConf.StreamStatePartitions.toString)
    val t0 = System.nanoTime()
    val q = try {
      stream.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    record(name, q, (System.nanoTime() - t0) / 1000000L)
    spark.table(name)
  }

  /** What [[crashRecoveryReplay]] returns: the recovered sink as a
    * batch frame plus the evidence the crash actually happened
    * mid-replay (phase-1 committed batches, phase-2 input rows — a
    * recovery gate where phase 2 read nothing tested nothing).
    */
  final case class CrashReplay(
      result: DataFrame,
      phase1Batches: Int,
      phase2InputRows: Long)

  /** Crash-recovery replay gate: run `build()` PACED into a
    * fault-tolerant sink, KILL the query after `stopAtBatchId`
    * commits (any in-flight batch is abandoned uncommitted — the
    * crash), then resume with a NEW query object from the SAME
    * checkpoint directory and run AvailableNow to completion. The
    * caller compares the final sink against a single-run sink and the
    * batch oracle — state-store restore, watermark re-read,
    * source-offset replay, and sink idempotence in one gate.
    *
    * Append-mode streams use the parquet FileStreamSink: the manifest
    * commits atomically per batch, so the crashed batch's orphan data
    * files stay invisible to the final metadata-log read and the
    * replayed batch lands exactly once. Update-mode streams
    * (transformWithState) use the documented idempotent-foreachBatch
    * pattern instead (streaming file sinks are append-only): each
    * micro-batch OVERWRITES its batchId-keyed directory, so a batch
    * replayed after the crash overwrites itself.
    */
  def crashRecoveryReplay(
      spark: SparkSession,
      build: () => DataFrame,
      outputMode: String = "append",
      stopAtBatchId: Long = 1L): CrashReplay = {
    val name = s"graft_crash_${ctr.incrementAndGet()}"
    val ckpt = graft.Scratch.dir(s"ckpt-$name")
    val out = graft.Scratch.dir(s"sink-$name")
    val useForeachBatch = outputMode != "append"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.GraftConf.StreamStatePartitions.toString)
    def start(available: Boolean) = try {
      val w0 = build().writeStream
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt)
      val w1 = if (available) w0.trigger(Trigger.AvailableNow()) else w0
      if (useForeachBatch) {
        val fold: (DataFrame, Long) => Unit = (df, id) =>
          df.write.mode("overwrite").parquet(s"$out/batch=$id")
        w1.foreachBatch(fold).start()
      } else w1.format("parquet").option("path", out.toString).start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    // phase 1: free-running, killed once `stopAtBatchId` has committed
    val q1 = start(available = false)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q1.isActive &&
        (q1.lastProgress == null || q1.lastProgress.batchId < stopAtBatchId) &&
        System.nanoTime() < deadline)
      Thread.sleep(10)
    q1.stop()
    q1.awaitTermination()
    val p1 = q1.recentProgress.map(_.batchId).distinct.length

    // phase 2: a NEW query object resumes from the same checkpoint
    val q2 = start(available = true)
    q2.awaitTermination()
    val p2rows = q2.recentProgress.map(_.numInputRows).sum

    val result =
      if (useForeachBatch) spark.read.parquet(out.toString).drop("batch")
      else spark.read.parquet(out.toString)
    CrashReplay(result, p1, p2rows)
  }

  /** Streaming INCREMENTAL-VIEW-MAINTENANCE sink: each micro-batch
    * collapses to its per-key mergeable state
    * ([[graft.operators.Incremental.aggState]]) and is FOLDED into a
    * persisted parquet state table via foreachBatch — the recurring-
    * refresh pattern where a stream maintains a warehouse rollup
    * without ever re-aggregating history. State dirs alternate by
    * batch parity (parquet can't overwrite a table it is reading), and
    * the fold algebra is exact integer arithmetic, so the final state
    * is identical under ANY micro-batch split — which is how the
    * DuckDB oracle (a plain batch aggregate of all the data) gates
    * the whole streaming path.
    *
    * Returns the final state table as a batch DataFrame.
    */
  def incrementalStateReplay(
      events: DataFrame,
      keys: Seq[String],
      valueCol: String): DataFrame = {
    val name = s"graft_ivm_${ctr.incrementAndGet()}"
    val ckpt = graft.Scratch.dir(s"ckpt-$name")
    val dirs = Array(graft.Scratch.dir(s"$name-a"), graft.Scratch.dir(s"$name-b"))
    val spark = events.sparkSession
    @volatile var last = -1L
    val t0 = System.nanoTime()
    val q = events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = graft.operators.Incremental.aggState(batch, keys, valueCol)
        val prev = if (last >= 0) {
          spark.read.parquet(dirs((last % 2).toInt))
        } else delta.limit(0)
        graft.operators.Incremental.merge(keys, prev, delta)
          .write.mode("overwrite").parquet(dirs((batchId % 2).toInt))
        last = batchId
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    record(name, q, (System.nanoTime() - t0) / 1000000L)
    require(last >= 0, "stream produced no batches")
    spark.read.parquet(dirs((last % 2).toInt))
  }

  /** Reduce an update-mode output history to the final state per key:
    * the row with the highest `seqCol` (strictly increasing per key,
    * e.g. a cumulative evidence count) wins.
    */
  def latestByKey(updates: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val others = updates.columns.filterNot(c => keyCols.contains(c) || c == seqCol)
    updates
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(col(seqCol)).as(seqCol),
        others.map(c => max_by(col(c), col(seqCol)).as(c)): _*)
  }
}
