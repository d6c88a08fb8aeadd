package graft.streaming

import graft.GraftConf
import graft.functions.TopKBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.operators.AssociationScore.byDatasource]]:
  * maintain, per (disease, target, datasource), the cumulative top-K
  * harmonic association score as evidence arrives.
  *
  * State per key is the same bounded [[TopKBuffer]] the batch window
  * aggregate uses — 50 doubles regardless of how much evidence a pair
  * has seen, so state size is O(keys), never O(evidence). Each
  * micro-batch emits the key's refreshed score (Update-mode semantics);
  * the batch engine's calendar densification has no streaming analogue
  * (there is no "year scaffold" in an unbounded stream — downstream
  * consumers snapshot scores at whatever cadence they need).
  */
object AssociationStream {

  final case class EvidenceEvent(
      diseaseId: Long, targetId: Long, datasourceId: String, score: Double)

  /** Carried state: the heap's backing values (≤ K doubles) plus the
    * total evidence count seen for the key.
    */
  final case class ScoreState(scores: Array[Double], n: Long)

  final case class ScoreUpdate(
      diseaseId: Long, targetId: Long, datasourceId: String,
      n_evidence: Long, score: Double)

  final case class PeakState(scores: Array[Double], n: Long, lastScore: Double)

  final case class PeakEvent(
      diseaseId: Long, targetId: Long, datasourceId: String,
      score: Double, peak: Double)

  def cumulativeScores(
      evidence: Dataset[EvidenceEvent],
      k: Int = GraftConf.TopK,
      maxScore: Double = GraftConf.MaxScore): DataFrame = {
    val spark = evidence.sparkSession
    import spark.implicits._
    evidence
      .groupByKey(e => (e.diseaseId, e.targetId, e.datasourceId))
      .mapGroupsWithState[ScoreState, ScoreUpdate](GroupStateTimeout.NoTimeout) {
        case ((d, t, src), batch, state: GroupState[ScoreState]) =>
          val buf = new TopKBuffer(k)
          val prevN = state.getOption.map(_.n).getOrElse(0L)
          state.getOption.foreach(_.scores.foreach(buf.add))
          var seen = 0L
          batch.foreach { e => buf.add(e.score); seen += 1 }
          state.update(
            ScoreState(java.util.Arrays.copyOf(buf.heap, buf.size), prevN + seen))
          val score = buf.harmonic(maxScore) match {
            case null => 0.0
            case v => v.asInstanceOf[Double]
          }
          ScoreUpdate(d, t, src, prevN + seen, score)
      }
      .toDF()
  }

  /** Evidence event carrying event time, for the state-evicting
    * variants.
    */
  final case class TimedEvidenceEvent(
      diseaseId: Long, targetId: Long, datasourceId: String, score: Double,
      ts: java.sql.Timestamp)

  /** [[cumulativeScores]] with bounded state lifetime: the (pair,
    * source) keyspace is unbounded in production, so NoTimeout state
    * grows forever. A key quiet for `evictAfterMs` of EVENT time (the
    * watermark clock — deterministic, replay-safe; a processing-time
    * clock would evict different keys on every backfill) is dropped;
    * evidence arriving later rebuilds the key from scratch, exactly
    * like a first-seen key. Eviction loses the key's cumulative top-K
    * history by design — the tradeoff every watermark makes; size
    * `evictAfterMs` to the staleness the downstream consumer
    * tolerates.
    */
  def cumulativeScoresEvicting(
      evidence: Dataset[TimedEvidenceEvent],
      watermark: String = "2 hours",
      evictAfterMs: Long = 24L * 3600 * 1000,
      k: Int = GraftConf.TopK,
      maxScore: Double = GraftConf.MaxScore): DataFrame = {
    val spark = evidence.sparkSession
    import spark.implicits._
    evidence
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.diseaseId, e.targetId, e.datasourceId))
      .flatMapGroupsWithState[ScoreState, ScoreUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout) {
        case ((d, t, src), batch, state: GroupState[ScoreState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buf = new TopKBuffer(k)
            val prevN = state.getOption.map(_.n).getOrElse(0L)
            state.getOption.foreach(_.scores.foreach(buf.add))
            var seen = 0L
            var maxTs = 0L
            batch.foreach { e =>
              buf.add(e.score); seen += 1
              maxTs = math.max(maxTs, e.ts.getTime)
            }
            state.update(
              ScoreState(java.util.Arrays.copyOf(buf.heap, buf.size), prevN + seen))
            // quiet-for-evictAfter measured from the key's own last
            // event time (watermark-lag-proof); the timeout must sit
            // strictly above the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            val score = buf.harmonic(maxScore) match {
              case null => 0.0
              case v => v.asInstanceOf[Double]
            }
            Iterator(ScoreUpdate(d, t, src, prevN + seen, score))
          }
      }
      .toDF()
  }

  /** Streaming novelty-peak detector — the stream twin of
    * [[graft.operators.Novelty.peaks]]: emit an event whenever a key's
    * cumulative score rises above its previous value (the batch
    * engine's year-over-year `lag` becomes batch-over-batch state).
    * Emits nothing for batches that leave the score flat.
    */
  def noveltyPeaks(
      evidence: Dataset[EvidenceEvent],
      k: Int = GraftConf.TopK,
      maxScore: Double = GraftConf.MaxScore): Dataset[PeakEvent] = {
    val spark = evidence.sparkSession
    import spark.implicits._
    evidence
      .groupByKey(e => (e.diseaseId, e.targetId, e.datasourceId))
      .flatMapGroupsWithState[PeakState, PeakEvent](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case ((d, t, src), batch, state: GroupState[PeakState]) =>
          val buf = new TopKBuffer(k)
          val prev = state.getOption
          prev.foreach(_.scores.foreach(buf.add))
          val last = prev.map(_.lastScore).getOrElse(0.0)
          var seen = 0L
          batch.foreach { e => buf.add(e.score); seen += 1 }
          val score = buf.harmonic(maxScore) match {
            case null => 0.0
            case v => v.asInstanceOf[Double]
          }
          state.update(PeakState(
            java.util.Arrays.copyOf(buf.heap, buf.size),
            prev.map(_.n).getOrElse(0L) + seen, score))
          if (score > last) Iterator(PeakEvent(d, t, src, score, score - last))
          else Iterator.empty
      }
  }

  /** [[noveltyPeaks]] with the same event-time state eviction as
    * [[cumulativeScoresEvicting]]: a key quiet past the horizon is
    * dropped; its next evidence starts a fresh peak history (the first
    * new score fires a peak from 0, like a first-seen key).
    */
  def noveltyPeaksEvicting(
      evidence: Dataset[TimedEvidenceEvent],
      watermark: String = "2 hours",
      evictAfterMs: Long = 24L * 3600 * 1000,
      k: Int = GraftConf.TopK,
      maxScore: Double = GraftConf.MaxScore): Dataset[PeakEvent] = {
    val spark = evidence.sparkSession
    import spark.implicits._
    evidence
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.diseaseId, e.targetId, e.datasourceId))
      .flatMapGroupsWithState[PeakState, PeakEvent](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case ((d, t, src), batch, state: GroupState[PeakState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buf = new TopKBuffer(k)
            val prev = state.getOption
            prev.foreach(_.scores.foreach(buf.add))
            val last = prev.map(_.lastScore).getOrElse(0.0)
            var seen = 0L
            var maxTs = 0L
            batch.foreach { e =>
              buf.add(e.score); seen += 1
              maxTs = math.max(maxTs, e.ts.getTime)
            }
            val score = buf.harmonic(maxScore) match {
              case null => 0.0
              case v => v.asInstanceOf[Double]
            }
            state.update(PeakState(
              java.util.Arrays.copyOf(buf.heap, buf.size),
              prev.map(_.n).getOrElse(0L) + seen, score))
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            if (score > last) Iterator(PeakEvent(d, t, src, score, score - last))
            else Iterator.empty
          }
      }
  }
}
