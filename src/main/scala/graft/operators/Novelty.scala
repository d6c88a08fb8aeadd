package graft.operators

import graft.GraftConf
import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Novelty of association scores over time: detect score "peaks"
  * (year-over-year increases) and decay them with a logistic curve.
  *
  * Capability parity with the reference's
  * `get_association_novelty_by_overall_dated` /
  * `get_association_novelty_by_datasource_dated`
  * (/root/reference/timeseries.py:530–634, 733–837). The windows are
  * partitioned by the (high-cardinality) association keys, so the
  * shuffle is balanced at scale; peak rows (sparse) are the only rows
  * exploded by the decay window.
  *
  * Matching the reference: the first scaffold year has lag=NULL, so an
  * association's initial score at the very first calendar year is not
  * a peak; novelty defaults to 0.0 where no peak's decay window covers
  * the year; undated rows travel through the surrogate year.
  */
object Novelty {

  /** Year-over-year score increases. Input must be dense per key
    * (output of [[AssociationScore]]). Output: keys, peakYear, peak.
    */
  def peaks(dense: DataFrame, keys: Seq[String], lastYear: Int = GraftConf.LastYear): DataFrame = {
    val surrogate = lastYear + 1
    val w = Window.partitionBy(keys.map(col): _*).orderBy("year")
    dense
      .withColumn("year", coalesce(col("year"), lit(surrogate)))
      .withColumn("score0", coalesce(col("score"), lit(0.0)))
      .select(
        keys.map(col) :+
          col("year").as("peakYear") :+
          (col("score0") - lag("score0", 1).over(w)).as("peak"): _*)
      .filter(col("peak") > 0)
  }

  /** Attach novelty to a dense score frame. Output: keys, year, score
    * (rounded 4dp), novelty (rounded 3dp, 0.0 where none).
    *
    * Plan shape: [[AssociationScore]]'s segment fill emits CONSECUTIVE
    * years per key (first active segment through the surrogate), so
    * the peak `δ` years back is exactly `lag(peak, δ)` on the same
    * (keys, year) window — novelty is `greatest` over the `window+1`
    * lagged decays, riding the scoring chain's existing exchange. The
    * reference instead posexplodes every peak into its decay range and
    * RIGHT-joins back onto the dense table
    * (/root/reference/timeseries.py:586–630), which recomputes the
    * whole dense lineage a second time as the join's right side;
    * this formulation has no join and no second dense compute
    * (result-identity with the reference shape is pinned by
    * AssociationScoreSpec).
    */
  def attach(
      dense: DataFrame,
      keys: Seq[String],
      lastYear: Int = GraftConf.LastYear,
      scale: Double = GraftConf.NoveltyScale,
      shift: Double = GraftConf.NoveltyShift,
      window: Int = GraftConf.NoveltyWindow): DataFrame = {
    val surrogate = lastYear + 1
    val w = Window.partitionBy(keys.map(col): _*).orderBy("__y")
    // The densified years are CONSECUTIVE per key, so the peak d years
    // back is lag(__s0, d) − lag(__s0, d+1) directly on the base score
    // — the same doubles the lag-of-lag(__peak) formulation subtracts
    // (identical fp arithmetic), but every candidate now reads only
    // pre-window columns, so all window+2 lags collapse into ONE
    // Window node (r17: the two-pass lag(peak-of-lag) shape cost a
    // second WindowExec sweep over the dense frame; guide §4 —
    // fewer passes over the same sorted partition).
    // greatest() skips nulls (missing/out-of-range peaks) and is null
    // only when every candidate is — the 0.0 default of the reference
    val candidates = (0 to window).map { d =>
      val p = lag(col("__s0"), d).over(w) - lag(col("__s0"), d + 1).over(w)
      logisticNovelty(when(p > 0, p), lit(d), scale, shift)
    }
    dense
      .withColumn("__y", coalesce(col("year"), lit(surrogate)))
      .withColumn("__s0", coalesce(col("score"), lit(0.0)))
      .withColumn("novelty", coalesce(round(greatest(candidates: _*), 3), lit(0.0)))
      .select(keys.map(col) :+ col("year") :+
        round(col("score"), 4).as("score") :+ col("novelty"): _*)
  }

  /** Plot-ready timeline extraction — the data-prep step of the
    * reference's `plotTargetDisease`
    * (/root/reference/plot_timeseries.py:667–805): the dense
    * score+novelty series pivoted to one row per association pair
    * with ordered, index-aligned year/score/novelty arrays (what the
    * year-ordered pandas frames feed to the line/scatter plots).
    * Undated rows keep the surrogate year label
    * (`includeNonDated=True` ⇒ `year.fillna(lastYear + 1)`,
    * plot_timeseries.py:800–804); missing scores become 0 like the
    * lineplot's `fillna(0)`.
    *
    * Scale shape: one collect_list over the ≤ `nYears` dense rows per
    * pair riding the scoring chain's (keys) exchange, sorted and
    * field-extracted in-row — the series length is calendar-bounded
    * by construction, so per-group state is O(nYears) regardless of
    * corpus size and the result is one bounded row per pair.
    *
    * Output: keys..., years (int asc), scores (4dp, aligned),
    * novelty (3dp, aligned).
    */
  def timeline(
      attached: DataFrame,
      keys: Seq[String],
      lastYear: Int = GraftConf.LastYear): DataFrame = {
    val pt = struct(
      coalesce(col("year"), lit(lastYear + 1)).as("year"),
      coalesce(col("score"), lit(0.0)).as("score"),
      col("novelty").as("novelty"))
    attached
      .groupBy(keys.map(col): _*)
      // array_sort orders by the struct's leading field — the year,
      // unique per pair in the dense scaffold, so the order is total
      .agg(array_sort(collect_list(pt)).as("__ser"))
      .select(keys.map(col) ++ Seq(
        transform(col("__ser"), p => p.getField("year")).as("years"),
        transform(col("__ser"), p => p.getField("score")).as("scores"),
        transform(col("__ser"), p => p.getField("novelty")).as("novelty")): _*)
  }

  /** Trailing z-score anomaly years: a year is anomalous when its
    * score sits ≥ `threshold` sample standard deviations above the
    * mean of the `k` preceding years (needing ≥ `minPrior` priors) —
    * the classic rolling-baseline outlier detector over the dense
    * association series, complementing [[peaks]]' simple
    * year-over-year delta.
    *
    * The variance comes from explicit sum/sum-of-squares over a
    * trailing ROWS frame — written the same way on the oracle side so
    * both engines evaluate the identical formula, with a 1e-12
    * variance floor so a constant baseline (fp-zero variance either
    * side of 0) can never fabricate an infinite z. The window rides
    * the scoring chain's (keys) exchange like [[attach]] — no extra
    * shuffle, high-cardinality partitions.
    *
    * Output: keys, year, score (4dp), z (4dp), rows filtered to
    * anomalies.
    */
  def rollingAnomaly(
      dense: DataFrame,
      keys: Seq[String],
      k: Int = 5,
      minPrior: Int = 3,
      threshold: Double = 2.0,
      lastYear: Int = GraftConf.LastYear): DataFrame = {
    val surrogate = lastYear + 1
    val w = Window.partitionBy(keys.map(col): _*).orderBy("__y")
      .rowsBetween(-k, -1)
    val n = col("__n").cast("double")
    val mu = col("__sum") / n
    val variance = (col("__sumsq") - col("__sum") * col("__sum") / n) / (n - 1)
    val z = (col("__s0") - mu) / sqrt(variance)
    dense
      .withColumn("__y", coalesce(col("year"), lit(surrogate)))
      .withColumn("__s0", coalesce(col("score"), lit(0.0)))
      // precompute the square so all three trailing aggregates read
      // only pre-window columns and CollapseWindow fuses them into a
      // single WindowExec pass (r17: sum(__s0*__s0) written inline
      // forced a projection between two Window nodes — two sweeps
      // over the dense frame)
      .withColumn("__s0sq", col("__s0") * col("__s0"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sum", sum("__s0").over(w))
      .withColumn("__sumsq", sum("__s0sq").over(w))
      .filter(col("__n") >= minPrior && variance > 1e-12 &&
        round(z, 4) >= threshold)
      .select(keys.map(col) :+ col("__y").as("year") :+
        round(col("__s0"), 4).as("score") :+ round(z, 4).as("z"): _*)
  }
}
