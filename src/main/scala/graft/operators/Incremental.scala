package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable aggregation state for recurring pipelines: algebraic
  * aggregates (count / sum / min / max — and anything derivable from
  * them, like avg) collapse to a per-key partial-state table that can
  * be persisted and FOLDED with later deltas, so history is aggregated
  * exactly once and each refresh touches only the new slice.
  *
  * This is the same partial/merge algebra Spark runs inside one job
  * (map-side combine → final merge), lifted across job boundaries:
  * `state(delta) ⊕ savedState` ≡ `state(full)` — pinned by the q101
  * oracle, which aggregates the full input directly.
  *
  * Scale shape: every step is a map-side-combined groupBy on the key;
  * the merge unions key-grained STATE tables (each ≪ the data that
  * produced it), never raw history.
  */
object Incremental {

  /** Collapse `df` to per-key mergeable state over `valueCol`. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("st_n"),
        sum(col(valueCol)).as("st_sum"),
        min(col(valueCol)).as("st_min"),
        max(col(valueCol)).as("st_max"))

  /** Fold state tables (any number, any order) into one. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum("st_n").cast("long").as("st_n"),
        sum("st_sum").as("st_sum"),
        min("st_min").as("st_min"),
        max("st_max").as("st_max"))

  /** Delta of an equi-join under snapshot growth: with A' = A ∪ dA
    * and B' = B ∪ dB, the NEW join rows are exactly
    * `dA ⋈ B'  ∪  A ⋈ dB` — every new pair has its A-side in dA
    * (first term) or its A-side old and B-side new (second term), and
    * the two terms are disjoint, so the union is exact (the classic
    * incremental-view-maintenance delta rule).
    *
    * Scale shape: both joins carry a BROADCAST delta against a
    * history that is scanned once and never shuffled — a recurring
    * refresh touches delta × history map-side instead of re-joining
    * two 100-TB snapshots. Feed the result through [[aggState]] /
    * [[merge]] and the refreshed rollup is `state(history join) ⊕
    * state(joinDelta)`, pinned ≡ the full recompute by the q114
    * oracle.
    */
  def joinDelta(
      oldA: DataFrame, deltaA: DataFrame,
      oldB: DataFrame, deltaB: DataFrame,
      joinKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    broadcast(deltaA).join(oldB.unionByName(deltaB), joinKeys)
      .unionByName(oldA.join(broadcast(deltaB), joinKeys))
  }

  /** Resolve state to final aggregates (n, sum, min, max, avg). */
  /** Incremental SCD-2 maintenance — apply a batch of NEW events (all
    * strictly later than the stored history's horizon) to an existing
    * [[EventWindows.scd2]] table without recomputing history. Only
    * TOUCHED keys' OPEN versions reopen: each is replayed as one
    * synthetic event (its value at its valid_from, id = MIN_LONG so no
    * real event can tie ahead of it) together with the key's delta
    * events through the same run-length encoding, then renumbered
    * from the old open version's number. Closed versions and
    * untouched keys pass through byte-identical.
    *
    * Contract (the oracle): `scd2Apply(scd2(base), delta)` ≡
    * `scd2(base ∪ delta)` whenever, PER KEY, every delta timestamp is
    * strictly later than every base timestamp (a key absent from base
    * may arrive at any time). The warehouse MERGE pattern: work ∝
    * |delta| + touched open versions, never |history|.
    */
  def scd2Apply(
      dim: DataFrame,
      delta: DataFrame,
      keyCol: String,
      valueCol: String,
      tsUsCol: String,
      idCol: String): DataFrame = {
    val touched = delta.select(col(keyCol)).distinct()
    val open = dim.filter(col("is_current"))
    val seed = open.join(touched, Seq(keyCol))
      .select(col(keyCol), col("value").as(valueCol),
        col("valid_from_us").as(tsUsCol),
        lit(Long.MinValue).as(idCol))
    val rebuilt = EventWindows.scd2(
      seed.unionByName(delta.select(col(keyCol), col(valueCol),
        col(tsUsCol), col(idCol))),
      keyCol, valueCol, tsUsCol, idCol)
    val off = open.select(col(keyCol), col("version").as("__off"))
    val renumbered = rebuilt.join(off, Seq(keyCol), "left")
      .withColumn("version", col("version") + coalesce(col("__off"), lit(1L)) - 1L)
      .drop("__off")
    dim.filter(!col("is_current"))
      .unionByName(open.join(touched, Seq(keyCol), "left_anti"))
      .unionByName(renumbered.select(dim.columns.map(col): _*))
  }

  def finish(state: DataFrame): DataFrame =
    state
      .withColumn("n", col("st_n"))
      .withColumn("sum_v", round(col("st_sum"), 4))
      .withColumn("min_v", round(col("st_min"), 4))
      .withColumn("max_v", round(col("st_max"), 4))
      .withColumn("avg_v", round(col("st_sum") / col("st_n"), 4))
      .drop("st_n", "st_sum", "st_min", "st_max")
}
